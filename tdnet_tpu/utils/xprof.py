"""Offline per-op TPU profile reports from ``jax.profiler`` traces.

The reference ships no profiler beyond wall-clock prints
(Testing/test.py:50-56); this tool exceeds it: it aggregates the XLA op
events a ``jax.profiler.trace`` capture records into per-op and
per-(op, dtype/shape) device-time tables, the workflow used for every
perf pass in this repo (see docs/PARITY.md §5.1).

Why not TensorBoard: the standard xplane->tools conversion plugin is
broken on this machine, so we parse the ``*.xplane.pb`` protobuf
directly via the ``tensorflow.tsl`` protos (tensorflow is only imported
lazily; everything else in the package stays TF-free).

Usage::

    with jax.profiler.trace("/tmp/trace"):   # or cli/test.py --profile
        for _ in range(STEPS): step()
    python -m tdnet_tpu.utils.xprof /tmp/trace --steps STEPS

Event durations are picoseconds of *device* time; dividing by the
number of traced steps yields ms/step directly comparable to
``bench_train.py``.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
from dataclasses import dataclass, field


def _xplane_pb2():
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:  # pragma: no cover - env without tensorflow
        raise ImportError(
            "parsing .xplane.pb requires the tensorflow.tsl protos "
            "(pip package 'tensorflow' or 'tf-nightly-cpu'); "
            "install one or read the trace with another xplane parser"
        ) from e
    return xplane_pb2


def latest_xplane(trace_dir: str) -> str:
    """Newest ``*.xplane.pb`` under ``trace_dir`` (recursive)."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir!r}")
    return paths[-1]


def load_xspace(path: str):
    """Parse one ``.xplane.pb`` (or the newest one under a directory)."""
    if os.path.isdir(path):
        path = latest_xplane(path)
    xs = _xplane_pb2().XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


_HLO_RE = re.compile(r"%?(\S+?)\s*=\s*\(?(\w+)\[([0-9,]*)\]")


def categorize(hlo_name: str) -> tuple[str, str]:
    """(op base, dtype[shape]) for an XLA op event name.

    Event names look like ``%fusion.423 = bf16[1,97,193,512]{3,2,1,0}
    fusion(...)``; the trailing ``.423`` instance counter is stripped so
    all instances of e.g. ``fusion`` aggregate together.
    """
    m = _HLO_RE.match(hlo_name)
    if not m:
        return ("other", hlo_name[:60])
    op, dtype, shape = m.groups()
    return (re.sub(r"[.\d]+$", "", op), f"{dtype}[{shape}]")


@dataclass
class PlaneReport:
    plane: str
    total_s: float = 0.0
    op_s: collections.Counter = field(default_factory=collections.Counter)
    op_shape_s: collections.Counter = field(
        default_factory=collections.Counter)
    op_shape_n: collections.Counter = field(
        default_factory=collections.Counter)
    module_s: collections.Counter = field(default_factory=collections.Counter)


def op_report(xspace, plane_pattern: str = "TPU") -> list[PlaneReport]:
    """Aggregate device time per op over every matching device plane."""
    reports = []
    for plane in xspace.planes:
        if not re.search(plane_pattern, plane.name):
            continue
        names = {i: m.name for i, m in plane.event_metadata.items()}
        rep = PlaneReport(plane=plane.name)
        for line in plane.lines:
            if line.name == "XLA Ops":
                for ev in line.events:
                    key = categorize(names.get(ev.metadata_id, "?"))
                    dur = ev.duration_ps / 1e12
                    rep.total_s += dur
                    rep.op_s[key[0]] += dur
                    rep.op_shape_s[key] += dur
                    rep.op_shape_n[key] += 1
            elif line.name == "XLA Modules":
                for ev in line.events:
                    rep.module_s[names.get(ev.metadata_id, "?")] += (
                        ev.duration_ps / 1e12)
        if rep.total_s or rep.module_s:
            reports.append(rep)
    return reports


def format_report(rep: PlaneReport, steps: float = 1.0, top: int = 30) -> str:
    out = [f"== {rep.plane}: {rep.total_s / steps * 1e3:.2f} ms/step "
           f"device time (over {steps:g} steps) =="]
    if rep.module_s:
        out.append("-- XLA modules --")
        for name, s in rep.module_s.most_common(8):
            out.append(f"  {s / steps * 1e3:9.2f} ms/step  {name[:70]}")
    out.append("-- by op --")
    for op, s in rep.op_s.most_common(top):
        out.append(f"  {s / steps * 1e3:9.2f} ms/step  {op}")
    out.append("-- top (op, dtype[shape]) groups --")
    for key, s in rep.op_shape_s.most_common(top):
        op, shape = key
        out.append(f"  {s / steps * 1e3:9.2f} ms/step x{rep.op_shape_n[key]:<5d}"
                   f" {op:32s} {shape}")
    return "\n".join(out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="per-op device-time report from a jax.profiler trace")
    ap.add_argument("trace", help=".xplane.pb file or trace directory")
    ap.add_argument("--steps", type=float, default=1.0,
                    help="traced step count; durations print as ms/step")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default="TPU",
                    help="regex over device plane names (default: TPU)")
    args = ap.parse_args(argv)
    reports = op_report(load_xspace(args.trace), args.plane)
    if not reports:
        print(f"no device plane matching {args.plane!r} with XLA op events")
        return 1
    for rep in reports:
        print(format_report(rep, steps=args.steps, top=args.top))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
