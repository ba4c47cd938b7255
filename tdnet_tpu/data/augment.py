"""Clip-consistent augmentations (host-side, PIL/numpy).

Mirrors Training/ptsemseg/augmentations/augmentations.py: each op draws
its random parameters ONCE per clip (at the first frame) and applies
them identically to every frame and the mask (reference
augmentations.py:60-62,87-90,130-133,238-239,273-274). Pipeline order
follows the config dict order (reference __init__.py:39-41).

Key registry (reference __init__.py:19-30): rcrop, hflip, vflip, scale,
rscale, rotate, translate, ccrop, colorjtr, colornorm.
"""

from __future__ import annotations

import math
import numbers
import random as _random

import numpy as np
from PIL import Image, ImageEnhance


def tv_affine(img, angle, translate, resample, fillcolor):
    """``torchvision.transforms.functional.affine`` (PIL backend) for
    scale=1, shear=0 — the only form the reference uses
    (augmentations.py:219-258): inverse-matrix ``Image.transform`` with
    positive ``angle`` rotating CLOCKWISE about (w/2+0.5, h/2+0.5).
    Note this is NOT ``PIL.Image.rotate`` (counter-clockwise, center
    w/2,h/2); value parity with the reference needs this exact form."""
    w, h = img.size
    cx, cy = w * 0.5 + 0.5, h * 0.5 + 0.5
    rot = math.radians(angle)
    a, b = math.cos(rot), math.sin(rot)
    m = [a, b, 0.0, -b, a, 0.0]
    tx, ty = translate
    m[2] = m[0] * (-cx - tx) + m[1] * (-cy - ty) + cx
    m[5] = m[3] * (-cx - tx) + m[4] * (-cy - ty) + cy
    return img.transform((w, h), Image.AFFINE, m, resample,
                         fillcolor=fillcolor)

from tdnet_tpu.data.streaming import IMAGENET_MEAN, IMAGENET_STD


class Compose:
    def __init__(self, augmentations, seed=None):
        self.augmentations = augmentations
        self.rng = _random.Random(seed) if seed is not None else _random

    def __call__(self, imgs, mask):
        assert isinstance(imgs, list)
        imgs = [Image.fromarray(im, mode="RGB") if isinstance(im, np.ndarray)
                else im for im in imgs]
        if isinstance(mask, np.ndarray):
            mask = Image.fromarray(mask.astype(np.uint8), mode="L")
        for a in self.augmentations:
            imgs, mask = a(imgs, mask, self.rng)
        return imgs, mask


class Scale:
    def __init__(self, size):
        self.size = size  # (h, w)

    def __call__(self, imgs, mask, rng):
        out = [im.resize((self.size[1], self.size[0]), Image.BILINEAR)
               for im in imgs]
        if mask is not None:
            mask = mask.resize((self.size[1], self.size[0]), Image.NEAREST)
        return out, mask


class RandomScale:
    def __init__(self, scales=(1,)):
        self.scales = scales

    def __call__(self, imgs, mask, rng):
        scale = rng.choice(self.scales)
        W, H = imgs[0].size
        w, h = int(W * scale), int(H * scale)
        out = [im.resize((w, h), Image.BILINEAR) for im in imgs]
        return out, mask.resize((w, h), Image.NEAREST)


class RandomCrop:
    def __init__(self, size):
        if isinstance(size, numbers.Number):
            size = (int(size), int(size))
        self.size = size  # (th, tw)

    def __call__(self, imgs, mask, rng):
        w, h = imgs[0].size
        th, tw = self.size
        if w == tw and h == th:
            return imgs, mask
        if w < tw or h < th:
            out = [im.resize((tw, th), Image.BILINEAR) for im in imgs]
            return out, mask.resize((tw, th), Image.NEAREST)
        x1 = rng.randint(0, w - tw)
        y1 = rng.randint(0, h - th)
        out = [im.crop((x1, y1, x1 + tw, y1 + th)) for im in imgs]
        return out, mask.crop((x1, y1, x1 + tw, y1 + th))


class CenterCrop:
    def __init__(self, size):
        if isinstance(size, numbers.Number):
            size = (int(size), int(size))
        self.size = size

    def __call__(self, imgs, mask, rng):
        w, h = imgs[0].size
        th, tw = self.size
        x1 = int(round((w - tw) / 2.0))
        y1 = int(round((h - th) / 2.0))
        out = [im.crop((x1, y1, x1 + tw, y1 + th)) for im in imgs]
        return out, mask.crop((x1, y1, x1 + tw, y1 + th))


class RandomHorizontallyFlip:
    def __init__(self, p):
        self.p = p

    def __call__(self, imgs, mask, rng):
        if rng.random() < self.p:
            return ([im.transpose(Image.FLIP_LEFT_RIGHT) for im in imgs],
                    mask.transpose(Image.FLIP_LEFT_RIGHT))
        return imgs, mask


class RandomVerticallyFlip:
    def __init__(self, p):
        self.p = p

    def __call__(self, imgs, mask, rng):
        if rng.random() < self.p:
            return ([im.transpose(Image.FLIP_TOP_BOTTOM) for im in imgs],
                    mask.transpose(Image.FLIP_TOP_BOTTOM))
        return imgs, mask


class RandomRotate:
    def __init__(self, degree):
        self.degree = degree

    def __call__(self, imgs, mask, rng):
        angle = rng.random() * 2 * self.degree - self.degree
        out = [tv_affine(im, angle, (0, 0), Image.BILINEAR, (0, 0, 0))
               for im in imgs]
        mask = tv_affine(mask, angle, (0, 0), Image.NEAREST, 250)
        return out, mask


class RandomTranslate:
    """Shift image content by (-dx, -dy) with reflect-padded borders;
    the mask shifts identically with vacated pixels filled with the
    ignore index (reference augmentations.py:175-227 crop + reflect-pad
    + affine-fill-250 semantics)."""

    def __init__(self, offset):
        self.offset = offset  # (max_dx, max_dy)

    def __call__(self, imgs, mask, rng):
        dx = int(2 * (rng.random() - 0.5) * self.offset[0])
        dy = int(2 * (rng.random() - 0.5) * self.offset[1])

        def crop_box(h, w):
            top = max(dy, 0)
            left = max(dx, 0)
            return top, left, h - abs(dy), w - abs(dx)

        out = []
        for im in imgs:
            a = np.asarray(im)
            h, w = a.shape[:2]
            top, left, ch, cw = crop_box(h, w)
            cropped = a[top:top + ch, left:left + cw]
            pad = ((abs(dy) if dy < 0 else 0, dy if dy > 0 else 0),
                   (abs(dx) if dx < 0 else 0, dx if dx > 0 else 0))
            if a.ndim == 3:
                pad = pad + ((0, 0),)
            out.append(Image.fromarray(np.pad(cropped, pad, mode="reflect")))

        m = np.asarray(mask)
        h, w = m.shape
        top, left, ch, cw = crop_box(h, w)
        shifted = np.full_like(m, 250)
        dst_top = abs(dy) if dy < 0 else 0
        dst_left = abs(dx) if dx < 0 else 0
        shifted[dst_top:dst_top + ch, dst_left:dst_left + cw] = \
            m[top:top + ch, left:left + cw]
        return out, Image.fromarray(shifted)


class ColorJitter:
    def __init__(self, p):
        b, c, s = p[0], p[1], p[2]
        self.brightness = [max(1 - b, 0), 1 + b]
        self.contrast = [max(1 - c, 0), 1 + c]
        self.saturation = [max(1 - s, 0), 1 + s]

    def __call__(self, imgs, mask, rng):
        rb = rng.uniform(*self.brightness)
        rc = rng.uniform(*self.contrast)
        rs = rng.uniform(*self.saturation)
        out = []
        for im in imgs:
            im = ImageEnhance.Brightness(im).enhance(rb)
            im = ImageEnhance.Contrast(im).enhance(rc)
            im = ImageEnhance.Color(im).enhance(rs)
            out.append(im)
        return out, mask


class ColorNorm:
    """ToTensor + Normalize; terminal op. Returns float32 HWC arrays and
    an int64 mask array (reference augmentations.py:299-313)."""

    def __init__(self, mean_std):
        self.mean = np.asarray(mean_std[0], np.float32) if mean_std else IMAGENET_MEAN
        self.std = np.asarray(mean_std[1], np.float32) if mean_std else IMAGENET_STD

    def __call__(self, imgs, mask, rng):
        out = [(np.asarray(im, np.float32) / 255.0 - self.mean) / self.std
               for im in imgs]
        return out, np.asarray(mask).astype(np.int64)


KEY2AUG = {
    "rcrop": RandomCrop,
    "hflip": RandomHorizontallyFlip,
    "vflip": RandomVerticallyFlip,
    "scale": Scale,
    "rscale": RandomScale,
    "rotate": RandomRotate,
    "translate": RandomTranslate,
    "ccrop": CenterCrop,
    "colorjtr": ColorJitter,
    "colornorm": ColorNorm,
}


def get_composed_augmentations(aug_dict, seed=None):
    if aug_dict is None:
        return None
    return Compose([KEY2AUG[k](v) for k, v in aug_dict.items()], seed=seed)
