"""Augmentation VALUE parity vs the reference pipeline's exact ops.

torchvision is not installed here, but the reference's transforms
(Training/ptsemseg/augmentations/augmentations.py) are thin wrappers over
PIL: ``tf.affine`` (rotate/translate-mask), ``tf.crop``+``tf.pad`` with
reflect (translate-image), ``PIL.ImageEnhance`` chains (colorjtr). The
oracle below transcribes torchvision's PIL backend literally — the
GENERAL ``_get_inverse_affine_matrix`` (angle/translate/scale/shear, as
in torchvision 0.2.2-0.8, functional.py) — so it is independent of the
specialized fast path in ``tdnet_tpu.data.augment.tv_affine``.
"""

import math

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from tdnet_tpu.data.augment import (ColorJitter, RandomRotate,
                                    RandomTranslate)


# --- oracle: torchvision.transforms.functional (PIL backend), verbatim ---

def _tv_get_inverse_affine_matrix(center, angle, translate, scale, shear):
    # transcription of torchvision 0.2.2 functional._get_inverse_affine_matrix
    angle = math.radians(angle)
    shear = math.radians(shear)
    scale = 1.0 / scale

    d = (math.cos(angle + shear) * math.cos(angle)
         + math.sin(angle + shear) * math.sin(angle))
    matrix = [
        math.cos(angle + shear), math.sin(angle + shear), 0,
        -math.sin(angle), math.cos(angle), 0,
    ]
    matrix = [scale / d * m for m in matrix]
    matrix[2] += (matrix[0] * (-center[0] - translate[0])
                  + matrix[1] * (-center[1] - translate[1]))
    matrix[5] += (matrix[3] * (-center[0] - translate[0])
                  + matrix[4] * (-center[1] - translate[1]))
    matrix[2] += center[0]
    matrix[5] += center[1]
    return matrix


def tv_affine_oracle(img, angle, translate, scale, shear, resample,
                     fillcolor):
    # transcription of torchvision functional.affine (PIL path)
    center = (img.size[0] * 0.5 + 0.5, img.size[1] * 0.5 + 0.5)
    matrix = _tv_get_inverse_affine_matrix(center, angle, translate, scale,
                                           shear)
    return img.transform(img.size, Image.AFFINE, matrix, resample,
                         fillcolor=fillcolor)


def tv_crop_oracle(img, top, left, height, width):
    # torchvision functional.crop (PIL path)
    return img.crop((left, top, left + width, top + height))


def tv_pad_reflect_oracle(img, padding):
    # torchvision functional.pad(padding_mode="reflect"): PIL -> np.pad
    # -> PIL (functional.py pads numpy with mode='reflect')
    pl, pt, pr, pb = padding
    a = np.asarray(img)
    pad = ((pt, pb), (pl, pr)) + (((0, 0),) if a.ndim == 3 else ())
    return Image.fromarray(np.pad(a, pad, mode="reflect"))


class _FixedRng:
    """Stub rng producing a chosen sequence of draws."""

    def __init__(self, randoms=(), uniforms=(), choices=()):
        self._r = list(randoms)
        self._u = list(uniforms)
        self._c = list(choices)

    def random(self):
        return self._r.pop(0)

    def uniform(self, a, b):
        v = self._u.pop(0)
        assert a <= v <= b, f"injected uniform {v} outside [{a},{b}]"
        return v

    def choice(self, seq):
        return self._c.pop(0)


def _rand_pair(seed, hw=(64, 96)):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (*hw, 3), np.uint8), "RGB")
    mask = Image.fromarray(rng.randint(0, 19, hw).astype(np.uint8), "L")
    return img, mask


@pytest.mark.parametrize("angle", [-9.7, -0.3, 4.2, 8.9])
def test_rotate_value_parity(angle):
    """Reference RandomRotate (augmentations.py:230-258): tf.affine with
    the drawn angle, BILINEAR/(0,0,0) for images, NEAREST/250 for mask."""
    img, mask = _rand_pair(1)
    degree = 10.0
    # our class draws angle = r*2*degree - degree
    r = (angle + degree) / (2 * degree)
    out_imgs, out_mask = RandomRotate(degree)([img], mask, _FixedRng([r]))

    want_img = tv_affine_oracle(img, angle, (0, 0), 1.0, 0.0,
                                Image.BILINEAR, (0, 0, 0))
    want_mask = tv_affine_oracle(mask, angle, (0, 0), 1.0, 0.0,
                                 Image.NEAREST, 250)
    np.testing.assert_array_equal(np.asarray(out_imgs[0]),
                                  np.asarray(want_img))
    np.testing.assert_array_equal(np.asarray(out_mask),
                                  np.asarray(want_mask))


@pytest.mark.parametrize("dx,dy", [(7, 5), (-6, 4), (5, -8), (-3, -2), (0, 0)])
def test_translate_value_parity(dx, dy):
    """Reference RandomTranslate (augmentations.py:175-227): image =
    tf.crop + tf.pad(reflect); mask = tf.affine(translate=(-dx,-dy),
    fillcolor=250)."""
    img, mask = _rand_pair(2)
    offset = (10, 10)  # (max_dx, max_dy)
    rx = (dx / (2 * offset[0])) + 0.5
    ry = (dy / (2 * offset[1])) + 0.5
    out_imgs, out_mask = RandomTranslate(offset)([img], mask,
                                                 _FixedRng([rx, ry]))
    # both implementations truncate via int(2*(r-0.5)*offset); replay the
    # same truncation so float noise in the injected draw cancels
    dx = int(2 * (rx - 0.5) * offset[0])
    dy = int(2 * (ry - 0.5) * offset[1])

    # reference image path, literally:
    x_crop = 0 if dx < 0 else dx
    y_crop = 0 if dy < 0 else dy
    cropped = tv_crop_oracle(img, y_crop, x_crop,
                             img.size[1] - abs(dy), img.size[0] - abs(dx))
    if dx >= 0 and dy >= 0:
        padding = (0, 0, dx, dy)
    elif dx >= 0 > dy:
        padding = (0, abs(dy), dx, 0)
    elif dx < 0 <= dy:
        padding = (abs(dx), 0, 0, dy)
    else:
        padding = (abs(dx), abs(dy), 0, 0)
    want_img = tv_pad_reflect_oracle(cropped, padding)
    want_mask = tv_affine_oracle(mask, 0.0, (-dx, -dy), 1.0, 0.0,
                                 Image.NEAREST, 250)
    np.testing.assert_array_equal(np.asarray(out_imgs[0]),
                                  np.asarray(want_img))
    np.testing.assert_array_equal(np.asarray(out_mask),
                                  np.asarray(want_mask))


def test_colorjitter_value_parity():
    """Reference ColorJitter (augmentations.py:69-96): ImageEnhance
    Brightness -> Contrast -> Color with per-clip drawn factors."""
    img, mask = _rand_pair(3)
    rb, rc, rs = 1.3, 0.72, 1.18
    out_imgs, _ = ColorJitter([0.5, 0.5, 0.5])(
        [img, img.copy()], mask, _FixedRng(uniforms=[rb, rc, rs]))

    want = ImageEnhance.Brightness(img).enhance(rb)
    want = ImageEnhance.Contrast(want).enhance(rc)
    want = ImageEnhance.Color(want).enhance(rs)
    for got in out_imgs:  # same params for every frame in the clip
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
