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


def test_color_billboards_solvable_when_visible():
    """Mechanism-proof v5 task: solid-color billboards are classifiable
    from a single LIT frame (the v4 gratings were not — VERDICT r4), and
    dark interiors stay achromatic gray with zero class evidence."""
    from tdnet_tpu.data.synthetic import BILLBOARD_COLORS, labeled_clip
    imgs, lbls, dark = labeled_clip(0, 8, (192, 384), seed=4, billboards=5,
                                    flash_period=4, return_occ=True,
                                    billboard_style="color",
                                    billboard_scale=1.8)
    bb = lbls >= N_CLASSES
    assert dark.any() and (bb & ~dark).any()
    # scaled billboards: a much larger pixel footprint than the default
    _, lbls1, _ = labeled_clip(0, 1, (192, 384), seed=4, billboards=5,
                               flash_period=4, return_occ=True,
                               billboard_style="color")
    assert bb[0].mean() > 2.0 * (lbls1[0] >= N_CLASSES).mean()
    # lit interiors are EXACTLY the class color (mod the ±6 one-channel
    # jitter): color -> class is learnable from one frame
    for t in range(4):
        lit = bb[t] & ~dark[t]
        for c in np.unique(lbls[t][lit]):
            px = imgs[t][lit & (lbls[t] == c)].astype(int)
            col = BILLBOARD_COLORS[c - N_CLASSES].astype(int)
            close = (np.abs(px - col).max(axis=1) <= 6).mean()
            assert close > 0.6, (t, c, close)   # rest is border frame
    # dark interiors: achromatic, identical across classes (no evidence)
    t = next(t for t in range(8) if dark[t].any())
    px = imgs[t][dark[t]].astype(int)
    achrom = (px.max(axis=1) - px.min(axis=1)) == 0
    assert achrom.mean() > 0.5
    assert np.abs(px[achrom, 0] - 150).max() <= 6
    # grating style (default) is byte-stable: scale=1.0 keeps the rng
    # stream of earlier rounds
    a = render_labeled(3, (96, 192), seed=4, billboards=8)
    b = render_labeled(3, (96, 192), seed=4, billboards=8,
                       billboard_style="grating", billboard_scale=1.0)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_color_variants_break_memorization():
    """Mechanism-proof v6: color_seed re-draws ONLY the per-instance
    billboard colors. Dark frames must be pixel-identical across
    variants (so scene identity cannot reveal the class) while labels
    and lit pixels differ (so retrieval is the only way to the label)."""
    from tdnet_tpu.data.synthetic import labeled_clip
    kw = dict(billboards=5, flash_period=4, return_occ=True,
              billboard_style="color", billboard_scale=1.8)
    a = labeled_clip(0, 6, (96, 192), seed=4, **kw)
    b = labeled_clip(0, 6, (96, 192), seed=4, color_seed=0, **kw)
    c = labeled_clip(0, 6, (96, 192), seed=4, color_seed=1, **kw)
    d = labeled_clip(0, 6, (96, 192), seed=4, color_seed=2, **kw)
    # color_seed=0 keeps the legacy assignment byte-for-byte
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # geometry (footprint + dark mask) is shared across variants
    assert np.array_equal(a[1] >= N_CLASSES, c[1] >= N_CLASSES)
    assert np.array_equal(a[2], c[2])
    # colors (hence labels) are re-drawn per variant
    assert not np.array_equal(a[1], c[1])
    assert not np.array_equal(c[1], d[1])
    # THE invariant: a dark frame is identical across variants — the
    # class is unobservable AND unmemorizable from the current frame
    t = next(t for t in range(6) if a[2][t].any())
    m = a[2][t]
    assert np.array_equal(a[0][t][m], c[0][t][m])
    lit = (a[1][t] >= N_CLASSES) & ~m
    assert not np.array_equal(a[0][t][lit], c[0][t][lit])


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
