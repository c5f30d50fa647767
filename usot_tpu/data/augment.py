"""Stateless image augmentations for the training loader.

Re-implements the capability set of the reference's imgaug pipelines
(ref: lib/dataset_loader/datasets_usot.py:71-95) with cv2/NumPy only:
  template: fliplr(p=.4), flipud(p=.2), perspective(0.01-0.07),
            coarse dropout, salt&pepper
  search:   hue/saturation x(0.5-1.5 per channel), brightness x(0.5-1.5),
            motion blur (k 3-9, angle +-60)
  memory:   both groups

Geometric ops also transform the bbox (corners projected, axis-aligned
envelope taken, like imgaug). All randomness from a passed
numpy.random.Generator so loader workers are seedable.
"""
from __future__ import annotations

import numpy as np


def _project_bbox(H, bbox):
    x1, y1, x2, y2 = bbox
    pts = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float64)
    ones = np.ones((4, 1))
    hom = np.concatenate([pts, ones], axis=1) @ H.T
    hom = hom[:, :2] / hom[:, 2:3]
    return [hom[:, 0].min(), hom[:, 1].min(), hom[:, 0].max(), hom[:, 1].max()]


def fliplr(image, bbox):
    w = image.shape[1]
    x1, y1, x2, y2 = bbox
    return image[:, ::-1].copy(), [w - x2, y1, w - x1, y2]


def flipud(image, bbox):
    h = image.shape[0]
    x1, y1, x2, y2 = bbox
    return image[::-1].copy(), [x1, h - y2, x2, h - y1]


def perspective(image, bbox, rng, scale=(0.01, 0.07)):
    """Random projective warp: corners jittered by N(0, s*size)."""
    import cv2

    h, w = image.shape[:2]
    s = rng.uniform(*scale)
    jitter = rng.normal(0, s, (4, 2)) * [w, h]
    src = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
    dst = (src + jitter).astype(np.float32)
    H = cv2.getPerspectiveTransform(src, dst)
    out = cv2.warpPerspective(image, H, (w, h), borderMode=cv2.BORDER_REPLICATE)
    return out, _project_bbox(H, bbox)


def coarse_dropout(image, rng, p=(0.0, 0.05), size_percent=0.15,
                   per_channel_p=0.5):
    """Drop rectangular cells of a coarse grid to 0."""
    import cv2

    h, w = image.shape[:2]
    drop_p = rng.uniform(*p)
    if drop_p <= 0:
        return image
    gh = max(2, int(h * size_percent))
    gw = max(2, int(w * size_percent))
    out = image.copy()
    if rng.random() < per_channel_p:
        for c in range(image.shape[2]):
            m = (rng.random((gh, gw)) < drop_p).astype(np.uint8)
            mask = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
            out[:, :, c] = np.where(mask > 0, 0, out[:, :, c])
    else:
        m = (rng.random((gh, gw)) < drop_p).astype(np.uint8)
        mask = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
        out = np.where(mask[..., None] > 0, 0, out)
    return out


def salt_and_pepper(image, rng, p=0.05, per_channel=True):
    out = image.copy()
    if per_channel:
        noise = rng.random(image.shape)
        out[noise < p / 2] = 0
        out[noise > 1 - p / 2] = 255
    else:
        noise = rng.random(image.shape[:2])
        out[noise < p / 2] = 0
        out[noise > 1 - p / 2] = 255
    return out


def multiply_hue_saturation(image, rng, lo=0.5, hi=1.5):
    import cv2

    hsv = cv2.cvtColor(image, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[:, :, 0] = (hsv[:, :, 0] * rng.uniform(lo, hi)) % 180
    hsv[:, :, 1] = np.clip(hsv[:, :, 1] * rng.uniform(lo, hi), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def multiply_brightness(image, rng, lo=0.5, hi=1.5):
    return np.clip(image.astype(np.float32) * rng.uniform(lo, hi),
                   0, 255).astype(np.uint8)


def motion_blur(image, rng, k_range=(3, 9), angle_range=(-60, 60)):
    import cv2

    k = int(rng.integers(k_range[0], k_range[1] + 1))
    if k < 3:
        return image
    angle = rng.uniform(*angle_range)
    kernel = np.zeros((k, k), np.float32)
    kernel[k // 2, :] = 1.0
    M = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle, 1.0)
    kernel = cv2.warpAffine(kernel, M, (k, k))
    s = kernel.sum()
    if s > 0:
        kernel /= s
    return cv2.filter2D(image, -1, kernel)


class TemplateAug:
    def __call__(self, image, bbox, rng):
        if rng.random() < 0.4:
            image, bbox = fliplr(image, bbox)
        if rng.random() < 0.2:
            image, bbox = flipud(image, bbox)
        image, bbox = perspective(image, bbox, rng, scale=(0.01, 0.07))
        image = coarse_dropout(image, rng)
        image = salt_and_pepper(image, rng)
        return image, bbox


class SearchAug:
    def __call__(self, image, bbox, rng):
        image = multiply_hue_saturation(image, rng)
        image = multiply_brightness(image, rng)
        image = motion_blur(image, rng)
        return image, bbox


class MemoryAug:
    def __call__(self, image, bbox, rng):
        if rng.random() < 0.4:
            image, bbox = fliplr(image, bbox)
        if rng.random() < 0.2:
            image, bbox = flipud(image, bbox)
        image, bbox = perspective(image, bbox, rng, scale=(0.01, 0.15))
        image = multiply_hue_saturation(image, rng)
        image = multiply_brightness(image, rng)
        image = motion_blur(image, rng)
        return image, bbox
