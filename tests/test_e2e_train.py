"""End-to-end training pipeline smoke test.

Builds a synthetic Cityscapes-layout dataset on disk, writes a tiny
reference-schema YAML config, and runs the real training CLI entry for a
few steps on the virtual 8-device CPU mesh — YAML -> augmentations ->
clip sampler -> jitted sharded train step (incl. teacher KD) ->
validation -> best-checkpoint save.
"""

import os

import numpy as np
import pytest
import yaml

import imageio.v2 as imageio


def _make_synth_cityscapes(root, n_train=4, n_val=2, hw=(96, 192)):
    h, w = hw
    rng = np.random.RandomState(0)
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, "leftImg8bit", split, "synthcity")
        seq_dir = os.path.join(root, "leftImg8bit_sequence", split, "synthcity")
        lbl_dir = os.path.join(root, "gtFine", split, "synthcity")
        for d in (img_dir, seq_dir, lbl_dir):
            os.makedirs(d, exist_ok=True)
        for i in range(n):
            fid = 100 + 10 * i
            name = f"synthcity_{i:06d}_{fid:06d}"
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            imageio.imwrite(os.path.join(img_dir, name + "_leftImg8bit.png"), img)
            # predecessors (up to 6 back) + the frame itself in the sequence dir
            for back in range(0, 7):
                pname = f"synthcity_{i:06d}_{fid - back:06d}_leftImg8bit.png"
                imageio.imwrite(os.path.join(seq_dir, pname),
                                rng.randint(0, 255, (h, w, 3), np.uint8))
            lbl = rng.choice([7, 8, 11, 26, 0], size=(h, w)).astype(np.uint8)
            imageio.imwrite(os.path.join(lbl_dir, name + "_gtFine_labelIds.png"),
                            lbl)
    return root


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    return _make_synth_cityscapes(str(tmp_path_factory.mktemp("cs")))


def _tiny_config(root, tmpdir, path_num=4):
    cfg = {
        "model": {"arch": "td4_psp" if path_num == 4 else "td2_psp",
                  "backbone": "resnet10", "syncBN": True,
                  "path_num": path_num},
        "teacher": {"path_num": path_num, "backbone": "resnet10",
                    "teacher_model": None},  # random frozen teacher: KD path runs
        "data": {"dataset": "cityscapes", "train_split": "train",
                 "val_split": "val", "path": root},
        "training": {
            "n_workers": 2, "train_iters": 4, "batch_size": 2,
            "val_interval": 4, "print_interval": 2,
            "loss": {"name": "OhemCELoss2D", "thresh": 0.7,
                     "ignore_index": 250},
            "optimizer": {"name": "adaoptimizer", "momentum": 0.9,
                          "wd": 1.0e-4, "lr0": 1.0e-2, "max_iter": 4,
                          "power": 0.9, "warmup_steps": 2,
                          "warmup_start_lr": 1.0e-5},
            "train_augmentations": {
                "rotate": 5, "colorjtr": [0.5, 0.5, 0.5],
                "scale": [65, 129], "hflip": 0.5,
                "rscale": [0.75, 1.0, 1.25], "rcrop": [65, 129],
                "colornorm": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]},
            "resume": None,
        },
        "validating": {
            "resume": None, "n_workers": 2, "batch_size": 2,
            "val_augmentations": {
                "scale": [65, 129],
                "colornorm": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]}},
    }
    path = os.path.join(tmpdir, "tiny.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return path


@pytest.mark.slow
def test_train_cli_end_to_end(synth_root, tmp_path, monkeypatch):
    from tdnet_tpu.cli.train import train
    from tdnet_tpu.utils.checkpoint import get_logger, make_run_dir
    from tdnet_tpu.utils.config import load_config

    cfg_path = _tiny_config(synth_root, str(tmp_path))
    monkeypatch.chdir(tmp_path)
    cfg = load_config(cfg_path)
    logdir = make_run_dir(cfg_path, base=str(tmp_path / "runs"))
    logger = get_logger(logdir)
    state, best_iou = train(cfg, logger, logdir, max_steps=4,
                            path_parallel=4)
    assert int(state["it"]) >= 4
    ckpts = [f for f in os.listdir(logdir) if f.endswith("best_model.pkl")]
    assert ckpts, "best checkpoint not written"
    # loss was finite
    import jax
    leaves = jax.tree.leaves(state["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_train_cli_nan_guard(synth_root, tmp_path, monkeypatch):
    """A non-finite loss halts the run with a FloatingPointError and a
    state dump (failure detection, SURVEY.md 5.3) instead of silently
    training on NaNs."""
    import jax.numpy as jnp
    import tdnet_tpu.train.trainer as trainer_mod
    from tdnet_tpu.cli.train import train
    from tdnet_tpu.utils.checkpoint import get_logger, make_run_dir
    from tdnet_tpu.utils.config import load_config

    real = trainer_mod.make_train_step

    def poisoned(*a, **k):
        step = real(*a, **k)

        def bad_step(state, frames, labels, pos_id, teacher_params=None):
            new_state, metrics = step(state, frames, labels, pos_id,
                                      teacher_params)
            metrics = {**metrics, "loss": jnp.float32(float("nan"))}
            return new_state, metrics
        return bad_step

    monkeypatch.setattr(trainer_mod, "make_train_step", poisoned)
    cfg_path = _tiny_config(synth_root, str(tmp_path))
    monkeypatch.chdir(tmp_path)
    cfg = load_config(cfg_path)
    cfg["training"]["print_interval"] = 1
    logdir = make_run_dir(cfg_path, base=str(tmp_path / "runs"))
    logger = get_logger(logdir)
    with pytest.raises(FloatingPointError):
        train(cfg, logger, logdir, max_steps=2, path_parallel=4)
    assert os.path.isfile(os.path.join(logdir, "state_nan_abort.pkl"))


@pytest.mark.slow
def test_train_cli_orbax_checkpoint_and_resume(synth_root, tmp_path,
                                               monkeypatch):
    """ckpt_backend: orbax writes per-shard directory checkpoints on the
    mesh; resume from the directory re-places every leaf on its mesh
    sharding (a bare jnp.asarray resume clashes committed devices with
    the sharded opt_state inside the jitted step)."""
    pytest.importorskip("orbax.checkpoint")
    from tdnet_tpu.cli.train import train
    from tdnet_tpu.utils.checkpoint import get_logger, make_run_dir
    from tdnet_tpu.utils.config import load_config

    cfg_path = _tiny_config(synth_root, str(tmp_path))
    monkeypatch.chdir(tmp_path)
    cfg = load_config(cfg_path)
    cfg["training"]["ckpt_backend"] = "orbax"
    cfg["training"]["ckpt_interval"] = 2
    cfg["training"]["train_iters"] = 6
    cfg["training"]["optimizer"]["max_iter"] = 6
    cfg["training"]["val_interval"] = 6
    logdir = make_run_dir(cfg_path, base=str(tmp_path / "runs"))
    logger = get_logger(logdir)
    state, _ = train(cfg, logger, logdir, max_steps=4, path_parallel=4)
    ck = os.path.join(logdir, "state_latest.orbax")
    assert os.path.isdir(ck), "orbax directory checkpoint not written"
    state2, _ = train(cfg, logger, logdir, max_steps=2, path_parallel=4,
                      resume_state=ck)
    assert int(state2["it"]) == int(state["it"]) + 2
