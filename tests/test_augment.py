"""Clip-consistent augmentation behavior (the reference's core property:
random params drawn once per clip, applied identically to all frames)."""

import numpy as np

from tdnet_tpu.data.augment import get_composed_augmentations


def _clip(n=4, h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    imgs = [rng.randint(0, 255, (h, w, 3), np.uint8) for _ in range(n)]
    mask = rng.randint(0, 19, (h, w)).astype(np.uint8)
    return imgs, mask


def test_identical_frames_stay_identical():
    """If all frames are the same image, every aug must keep them equal
    (i.e. the random draw happens once per clip, not per frame)."""
    rng = np.random.RandomState(1)
    base = rng.randint(0, 255, (48, 64, 3), np.uint8)
    aug = get_composed_augmentations({
        "rotate": 15, "colorjtr": [0.5, 0.5, 0.5], "hflip": 0.5,
        "rscale": [0.5, 0.75, 1.25], "rcrop": [32, 40],
        "translate": [8, 8],
        "colornorm": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]],
    }, seed=3)
    for trial in range(5):
        imgs, mask = aug([base.copy() for _ in range(4)],
                         rng.randint(0, 19, (48, 64)).astype(np.uint8))
        for k in range(1, 4):
            np.testing.assert_array_equal(imgs[0], imgs[k])
        assert imgs[0].shape == (32, 40, 3)
        assert mask.shape == (32, 40)
        assert mask.dtype == np.int64


def test_mask_follows_geometry():
    """Geometric ops transform the mask with the image (nearest) while
    photometric ops leave it untouched."""
    imgs, mask = _clip()
    aug = get_composed_augmentations({"hflip": 1.01}, seed=0)  # always flip
    out, m = aug([i.copy() for i in imgs], mask.copy())
    np.testing.assert_array_equal(np.asarray(out[0]), imgs[0][:, ::-1])
    np.testing.assert_array_equal(np.asarray(m), mask[:, ::-1])

    aug = get_composed_augmentations({"colorjtr": [0.5, 0.5, 0.5]}, seed=0)
    _, m2 = aug([i.copy() for i in imgs], mask.copy())
    np.testing.assert_array_equal(np.asarray(m2), mask)


def test_scale_and_colornorm_shapes():
    imgs, mask = _clip()
    aug = get_composed_augmentations({
        "scale": [24, 32],
        "colornorm": [[0.485, 0.456, 0.406], [0.229, 0.224, 0.225]]}, seed=0)
    out, m = aug(imgs, mask)
    assert out[0].shape == (24, 32, 3) and out[0].dtype == np.float32
    assert m.shape == (24, 32) and m.dtype == np.int64
    # normalization: value range plausible for uint8 inputs
    assert -3.0 < out[0].min() and out[0].max() < 3.1


def test_rcrop_upscales_small_inputs():
    """Reference RandomCrop resizes up when the image is smaller than
    the crop (augmentations.py:56-58)."""
    imgs, mask = _clip(h=20, w=24)
    aug = get_composed_augmentations({"rcrop": [32, 40]}, seed=0)
    out, m = aug(imgs, mask)
    assert np.asarray(out[0]).shape == (32, 40, 3)
    assert np.asarray(m).shape == (32, 40)
