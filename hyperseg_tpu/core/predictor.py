"""Shape-bucketed inference predictor.

The reference accepts arbitrary input resolutions (dynamic shapes); XLA wants
static ones. This predictor bridges the two (SURVEY.md §7.2 "dynamic spatial
shapes"): inputs are right/bottom padded to the next shape bucket (a multiple
of the model's stride-32 patch grid), one executable is compiled and cached
per bucket, and logits are cropped back to the true size. Padding is
reflective so BN statistics and patch contents stay in-distribution; the
crop happens before any metric sees the logits.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def pad_to_multiple(x: np.ndarray, multiple: int = 32, mode: str = "reflect"):
    """Pad (B, H, W, C) right/bottom to the next multiple. Returns
    (padded, (H, W))."""
    b, h, w, c = x.shape
    hp = -(-h // multiple) * multiple
    wp = -(-w // multiple) * multiple
    if (hp, wp) == (h, w):
        return x, (h, w)
    if mode == "reflect" and (hp - h >= h or wp - w >= w):
        # np.pad reflect requires pad < dim; tiny inputs fall back to edge
        mode = "edge"
    return np.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                  mode=mode), (h, w)


class Predictor:
    """Cached-jit segmentation predictor over shape buckets.

    >>> pred = Predictor(model, params)
    >>> logits = pred(image_bhwc)     # any H, W; returns logits at (H, W)
    """

    def __init__(self, model, params, *, dtype=jnp.bfloat16, multiple: int = 32,
                 max_cache: int = 16):
        self.model = model
        self.dtype = dtype
        # the weight mapper downsamples its stride-32 input levels-1 more
        # times; pad far enough that every pyramid level stays >= 1 px
        wm_levels = getattr(getattr(model, "weight_mapper", None), "levels", 1)
        self.multiple = max(multiple, 32 * 2 ** max(wm_levels - 1, 0))
        self.max_cache = max_cache
        self.params = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 and a.ndim >= 2
            else a, params)
        self._cache: Dict[Tuple[int, ...], object] = {}

    def _fn_for(self, shape):
        if shape not in self._cache:
            if len(self._cache) >= self.max_cache:
                self._cache.pop(next(iter(self._cache)))
            self._cache[shape] = jax.jit(lambda p, x: self.model(p, x))
        return self._cache[shape]

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image: (H, W, C) or (B, H, W, C) float array -> logits at the input
        resolution (fp32 numpy)."""
        squeeze = image.ndim == 3
        if squeeze:
            image = image[None]
        padded, (h, w) = pad_to_multiple(np.asarray(image, np.float32),
                                         self.multiple)
        x = jnp.asarray(padded, self.dtype)
        out = self._fn_for(x.shape)(self.params, x)
        logits = np.asarray(out, np.float32)[:, :h, :w]
        return logits[0] if squeeze else logits

    def predict_classes(self, image: np.ndarray) -> np.ndarray:
        return np.argmax(self(image), axis=-1)
