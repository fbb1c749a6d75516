"""Image utilities (NHWC numpy), mirroring hyperseg/utils/img_utils.py and the
visualization helpers of utils/seg_utils.py."""

from __future__ import annotations

from typing import List

import numpy as np


def denormalize(img_hwc: np.ndarray, mean=(0.5,) * 3, std=(0.5,) * 3) -> np.ndarray:
    """Invert Normalize back to [0, 1] (tensor2rgb, img_utils.py:49-90)."""
    out = img_hwc * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    return np.clip(out, 0.0, 1.0)


def create_pyramid(img_nhwc: np.ndarray, n: int = 1) -> List[np.ndarray]:
    """Average-pool image pyramid (img_utils.py:110-128; 3x3 stride-2 avg pool
    with edge-aware padding)."""
    if isinstance(img_nhwc, (list, tuple)):
        return list(img_nhwc)
    pyd = [img_nhwc]
    for _ in range(n - 1):
        x = pyd[-1]
        pad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        h, w = x.shape[1], x.shape[2]
        acc = np.zeros((x.shape[0], (h + 1) // 2, (w + 1) // 2, x.shape[3]),
                       np.float32)
        cnt = np.zeros_like(acc)
        for dy in range(3):
            for dx in range(3):
                sl = pad[:, dy:dy + h:2, dx:dx + w:2]
                acc[:, :sl.shape[1], :sl.shape[2]] += sl
                cnt[:, :sl.shape[1], :sl.shape[2]] += 1
        pyd.append(acc / cnt)
    return pyd


def blend_seg(img_hwc: np.ndarray, seg_hw: np.ndarray, color_map,
              alpha: float = 0.5, ignore_index: int = 255) -> np.ndarray:
    """Colorized segmentation overlay (seg_utils.py:82-103). img in [0,1]."""
    cmap = np.asarray(color_map, np.float32) / 255.0
    seg = np.asarray(seg_hw)
    valid = seg != ignore_index
    safe = np.where(valid, seg, 0)
    colored = cmap[np.clip(safe, 0, len(cmap) - 1)]
    out = img_hwc.copy()
    out[valid] = img_hwc[valid] * (1 - alpha) + colored[valid] * alpha
    return np.clip(out, 0.0, 1.0)


def make_grid(*imgs: np.ndarray, pad: int = 2) -> np.ndarray:
    """Horizontal concat of equally-sized HWC images with padding
    (img_utils.py:93-107)."""
    h = max(im.shape[0] for im in imgs)
    parts = []
    for im in imgs:
        if im.shape[0] != h:
            canvas = np.zeros((h, im.shape[1], im.shape[2]), im.dtype)
            canvas[:im.shape[0]] = im
            im = canvas
        parts.append(im)
        parts.append(np.ones((h, pad, im.shape[2]), im.dtype))
    return np.concatenate(parts[:-1], axis=1)
