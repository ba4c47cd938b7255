"""Mechanism-proof wiring: the ablation switch and the labeled task.

scripts/mechanism_proof.py measures warm-cache streaming against a
propagation-ablated baseline (VERDICT r3, missing #1). These tests pin
the two pieces it depends on:

- ``Ctx.ablate_prop`` streaming output == the cold-cache output path
  (a fresh cache's first frame) for every frame / every path, so the
  "ablated" arm of the proof is exactly the head(LN(v_cur)) dataflow
  the reference produces before its buffer warms
  (td4_psp18.py:142 analog, models/tdnet.py stream_step).
- the labeled synthetic renderer: labels match the painted scene, the
  occluders perturb images but never labels, and the scene genuinely
  moves (so propagation has something to align).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tdnet_tpu.data.synthetic import (N_CLASSES, labeled_clip,
                                      render_labeled)
from tdnet_tpu.models.tdnet import (TDNetConfig, init_cache, init_tdnet,
                                    select_path, stream_step)
from tdnet_tpu.nn.module import Ctx


def test_ablate_prop_equals_cold_cache():
    cfg = TDNetConfig(nclass=7, backbone="resnet10", path_num=4,
                      in_size=(65, 129), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    frames = jax.random.normal(jax.random.PRNGKey(1),
                               (6, 1, *cfg.in_size, 3), jnp.float32)

    cache = init_cache(cfg)
    for t in range(frames.shape[0]):
        p = t % cfg.path_num
        pp = select_path(params["paths"], p)
        ap = select_path(params["atn"], p)
        abl, cache = stream_step(pp, ap, cache, frames[t], cfg,
                                 cfg.psp_pid(p), Ctx(ablate_prop=True))
        cold, _ = stream_step(pp, ap, init_cache(cfg), frames[t], cfg,
                              cfg.psp_pid(p), Ctx())
        np.testing.assert_allclose(np.asarray(abl), np.asarray(cold),
                                   atol=1e-5)
    # the ablated stream still maintains its cache (count advanced)
    assert int(cache["count"]) == frames.shape[0]


def test_ablate_prop_diverges_when_warm():
    cfg = TDNetConfig(nclass=7, backbone="resnet10", path_num=2,
                      in_size=(49, 97), kv_stride=3, aux=False)
    params = init_tdnet(jax.random.PRNGKey(0), cfg)
    frames = jax.random.normal(jax.random.PRNGKey(2),
                               (3, 1, *cfg.in_size, 3), jnp.float32)
    c_w, c_a = init_cache(cfg), init_cache(cfg)
    for t in range(frames.shape[0]):
        p = t % cfg.path_num
        pp = select_path(params["paths"], p)
        ap = select_path(params["atn"], p)
        warm, c_w = stream_step(pp, ap, c_w, frames[t], cfg,
                                cfg.psp_pid(p), Ctx())
        abl, c_a = stream_step(pp, ap, c_a, frames[t], cfg,
                               cfg.psp_pid(p), Ctx(ablate_prop=True))
    # last frame is past the window: propagation must actually contribute
    assert float(jnp.abs(warm - abl).max()) > 1e-4


def test_labeled_renderer():
    img, lbl = render_labeled(5, (128, 256), seed=3)
    assert img.shape == (128, 256, 3) and img.dtype == np.uint8
    assert lbl.shape == (128, 256) and lbl.min() >= 0
    assert lbl.max() < N_CLASSES
    # the core scene classes all present (sky/building/road/sidewalk)
    assert {0, 1, 2, 3} <= set(np.unique(lbl).tolist())
    # deterministic
    img2, lbl2 = render_labeled(5, (128, 256), seed=3)
    assert np.array_equal(img, img2) and np.array_equal(lbl, lbl2)


def test_occluders_hide_pixels_not_labels():
    base_i, base_l = render_labeled(4, (128, 256), seed=2)
    occ_i, occ_l = render_labeled(4, (128, 256), seed=2, occluders=3)
    assert np.array_equal(base_l, occ_l)          # labels keep the scene
    changed = (base_i != occ_i).any(axis=-1)
    assert changed.mean() > 0.02                  # a real occluded area
    # occluders MOVE frame to frame (that's what makes the task temporal)
    occ_i2, _ = render_labeled(5, (128, 256), seed=2, occluders=3)
    base_i2, _ = render_labeled(5, (128, 256), seed=2)
    changed2 = (base_i2 != occ_i2).any(axis=-1)
    assert (changed != changed2).mean() > 0.01


def test_sensor_noise_is_temporal_information():
    # same (seed, t, noise_seed) -> deterministic; new noise_seed -> new
    # noise instance over the SAME clean scene (labels unchanged)
    i1, l1 = render_labeled(2, (96, 192), seed=4, noise_sigma=45.0,
                            noise_seed=9)
    i2, l2 = render_labeled(2, (96, 192), seed=4, noise_sigma=45.0,
                            noise_seed=9)
    i3, l3 = render_labeled(2, (96, 192), seed=4, noise_sigma=45.0,
                            noise_seed=10)
    assert np.array_equal(i1, i2) and not np.array_equal(i1, i3)
    assert np.array_equal(l1, l2) and np.array_equal(l1, l3)
    # heavy noise: per-pixel class evidence is genuinely degraded
    clean, _ = render_labeled(2, (96, 192), seed=4)
    d = np.abs(i1.astype(int) - clean.astype(int)).mean()
    assert d > 20.0
    # per-frame independence: consecutive frames draw fresh noise
    j1, _ = render_labeled(3, (96, 192), seed=4, noise_sigma=45.0,
                           noise_seed=9)
    assert not np.array_equal(i1, j1)
    # default (noise_sigma=None) keeps the legacy mild jitter: close to
    # the clean render everywhere
    mild, _ = render_labeled(2, (96, 192), seed=4)
    assert np.array_equal(mild, clean)


def test_flashing_billboards_are_temporal_only_information():
    from tdnet_tpu.data.synthetic import labeled_flash_clip
    imgs, lbls, dark = labeled_flash_clip(0, 8, (96, 192), seed=4,
                                          billboards=8, flash_period=4)
    bb = lbls >= N_CLASSES
    # labels never change with the flash phase; dark only marks billboards
    assert (dark & ~bb).sum() == 0
    # some billboard pixels are dark and some lit over the clip
    assert dark.any() and (bb & ~dark).any()
    # a dark billboard interior is a flat achromatic gray (150 +- the
    # legacy +-6 luminance jitter) — zero class evidence. Border pixels
    # (the yellow frame) are chromatic, hence the 0.5 fraction bound.
    t = next(t for t in range(8) if dark[t].any())
    px = imgs[t][dark[t]].astype(int)
    achrom = (px.max(axis=1) - px.min(axis=1)) == 0
    assert achrom.mean() > 0.5
    assert np.abs(px[achrom, 0] - 150).max() <= 6
    # with flash_period == 4 every dark pixel's class was visible within
    # the previous 3 frames SOMEWHERE (the billboard pans, so check the
    # class is present in the frame, not the same pixel)
    for t in range(3, 8):
        for c in np.unique(lbls[t][dark[t]]):
            seen = any(((lbls[s] == c) & ~dark[s]).any()
                       for s in range(t - 3, t + 1))
            assert seen, f"class {c} dark at t={t} never lit in window"
    # deterministic
    imgs2, lbls2, dark2 = labeled_flash_clip(0, 8, (96, 192), seed=4,
                                             billboards=8, flash_period=4)
    assert np.array_equal(imgs, imgs2) and np.array_equal(dark, dark2)
    # flash_period=None keeps the legacy always-lit renderer byte-identical
    li, ll = render_labeled(3, (96, 192), seed=4, billboards=8)
    fi, fl, fd = render_labeled(3, (96, 192), seed=4, billboards=8,
                                flash_period=None, return_occ=True)
    assert np.array_equal(li, fi) and np.array_equal(ll, fl)
    assert not fd.any()


def test_scene_moves_and_seeds_differ():
    imgs, lbls = labeled_clip(0, 4, (96, 192), seed=1)
    assert imgs.shape == (4, 96, 192, 3) and lbls.shape == (4, 96, 192)
    assert not np.array_equal(lbls[0], lbls[3])   # labels move too
    other_i, _ = render_labeled(0, (96, 192), seed=9)
    assert not np.array_equal(imgs[0], other_i)   # seed varies the world


def test_billboards_are_temporal_information():
    from tdnet_tpu.data.synthetic import N_BILLBOARD_TEXTURES
    # billboard texture classes appear above the scene classes
    img, lbl = render_labeled(3, (128, 256), seed=7, billboards=6)
    texs = {int(c) for c in np.unique(lbl) if c >= N_CLASSES}
    assert texs and all(N_CLASSES <= c < N_CLASSES + N_BILLBOARD_TEXTURES
                        for c in texs)
    # world-anchored: the same billboard pixel content pans with the
    # camera rather than being regenerated per frame (labels move)
    _, lbl2 = render_labeled(9, (128, 256), seed=7, billboards=6)
    assert not np.array_equal(lbl, lbl2)
    # opt-out: default renders have no billboard classes (back-compat)
    _, lbl0 = render_labeled(3, (128, 256), seed=7)
    assert lbl0.max() < N_CLASSES
    # occlusion mask returned on request covers exactly the stamped area
    bi, bl, occ = render_labeled(3, (128, 256), seed=7, billboards=6,
                                 occluders=3, return_occ=True)
    assert occ.dtype == bool and occ.mean() > 0.02
    assert np.array_equal(bl, lbl)             # occluders never touch labels
    ci, _ = render_labeled(3, (128, 256), seed=7, billboards=6)
    assert not (bi[occ] == ci[occ]).all()      # image hidden where occ
    assert (bi[~occ] == ci[~occ]).all()        # untouched elsewhere
