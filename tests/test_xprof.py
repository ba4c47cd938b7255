"""utils/xprof: xplane parsing + per-op aggregation on a synthetic trace.

Real TPU captures can't be produced in the CPU suite, so the tests
build a minimal XSpace proto shaped like a v5e capture (plane
``/device:TPU:0`` with ``XLA Ops`` / ``XLA Modules`` lines, HLO-style
event names) and drive the whole pipeline: file discovery, parsing,
categorization, aggregation, formatting, CLI.
"""

import os

import pytest

tf_protos = pytest.importorskip(
    "tensorflow.tsl.profiler.protobuf.xplane_pb2",
    reason="xprof needs the tensorflow.tsl protos")

from tdnet_tpu.utils import xprof


def _synthetic_xspace():
    xs = tf_protos.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    names = {
        1: "%fusion.423 = bf16[1,97,193,512]{3,2,1,0} fusion(...)",
        2: "%fusion.7 = bf16[1,97,193,512]{3,2,1,0} fusion(...)",
        3: "%convolution.9 = f32[1,49,97,256]{3,2,1,0} convolution(...)",
        4: "%custom-call.2 = bf16[18721,512]{1,0} custom-call(...)",
        5: "trailing-non-hlo-event",
        6: "jit_train_step",
    }
    for mid, name in names.items():
        plane.event_metadata[mid].id = mid
        plane.event_metadata[mid].name = name
    ops = plane.lines.add()
    ops.name = "XLA Ops"
    for mid, dur_ps in [(1, 2e9), (2, 1e9), (3, 5e9), (4, 4e9), (5, 1e9)]:
        ev = ops.events.add()
        ev.metadata_id = mid
        ev.duration_ps = int(dur_ps)
    mods = plane.lines.add()
    mods.name = "XLA Modules"
    ev = mods.events.add()
    ev.metadata_id = 6
    ev.duration_ps = int(13e9)
    # a host plane that must be ignored by the default plane filter
    host = xs.planes.add()
    host.name = "/host:CPU"
    return xs


def test_categorize_hlo_names():
    assert xprof.categorize(
        "%fusion.423 = bf16[1,97,193,512]{3,2,1,0} fusion(...)"
    ) == ("fusion", "bf16[1,97,193,512]")
    assert xprof.categorize("weird event")[0] == "other"


def test_op_report_aggregates_and_formats():
    reports = xprof.op_report(_synthetic_xspace())
    assert len(reports) == 1
    rep = reports[0]
    assert rep.plane == "/device:TPU:0"
    # 2+1+5+4+1 ns of events = 13 ns total
    assert rep.total_s == pytest.approx(13e-3)
    # both fusion instances aggregate under one op base
    assert rep.op_s["fusion"] == pytest.approx(3e-3)
    assert rep.op_shape_n[("fusion", "bf16[1,97,193,512]")] == 2
    assert rep.op_s["convolution"] == pytest.approx(5e-3)
    assert rep.module_s["jit_train_step"] == pytest.approx(13e-3)

    text = xprof.format_report(rep, steps=2.0)
    assert "/device:TPU:0" in text and "fusion" in text
    assert "6.50 ms/step" in text  # 13 ms over 2 steps


def test_latest_xplane_and_cli(tmp_path, capsys):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    (d / "vm.xplane.pb").write_bytes(
        _synthetic_xspace().SerializeToString())
    assert xprof.latest_xplane(str(tmp_path)).endswith("vm.xplane.pb")

    assert xprof.main([str(tmp_path), "--steps", "5"]) == 0
    out = capsys.readouterr().out
    assert "2.60 ms/step device time" in out  # 13 ms / 5 steps

    # no matching plane -> informative nonzero exit
    assert xprof.main([str(tmp_path), "--plane", "GPU"]) == 1


def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        xprof.latest_xplane(str(tmp_path / "nope"))
    assert not os.path.exists(str(tmp_path / "nope"))
