"""PyTorch checkpoint importer.

Converts a reference HyperSeg state_dict (or a full checkpoint file with
{'state_dict': ..., 'arch': ...}, train.py:267-274) into this framework's flat
NHWC parameter dict. Key names are preserved verbatim (our parameter trees use
torch-style dotted keys by design), only tensor layouts change:

  * 4-D conv kernels: OIHW -> HWIO (transpose 2,3,1,0) — covers dense,
    grouped (O, I/g, kh, kw), and depthwise (O, 1, kh, kw) convs.
  * 2-D linear weights: (out, in) -> (in, out).
  * 1-D vectors (BN affine/stats, biases): unchanged.
  * 'num_batches_tracked' counters: dropped.
  * DataParallel 'module.' prefixes: stripped (utils/utils.py:76-82).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp


def _to_numpy(v):
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def convert_state_dict(state_dict: Mapping, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Convert a torch state_dict to a flat NHWC/HWIO jax parameter dict."""
    params = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        if re.search(r"\bcoord\d+_\d+$", k):
            # cached coordinate-grid buffers (hyperseg_v1_0.py:193); we build
            # coordinates statically at trace time instead.
            continue
        a = _to_numpy(v)
        if a.ndim == 4:
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2 and k.endswith("weight"):
            a = a.transpose(1, 0)
        params[k] = jnp.asarray(a, dtype=dtype)
    return params


def load_torch_checkpoint(path: str, dtype=jnp.float32):
    """Load a reference .pth checkpoint. Returns (params, checkpoint_meta).

    checkpoint_meta carries the reference's self-describing fields (epoch,
    arch string, best_iou) when present (train.py:267-274)."""
    import torch  # local import: torch is only needed for interop

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    meta = {}
    if isinstance(ckpt, dict):
        for key in ("epoch", "arch", "best_iou"):
            if key in ckpt:
                meta[key] = ckpt[key]
    return convert_state_dict(state_dict, dtype=dtype), meta


def export_state_dict(params: Mapping[str, jnp.ndarray]):
    """Inverse conversion: flat NHWC params -> torch-layout numpy state_dict
    (for writing checkpoints the reference implementation can load)."""
    out = {}
    for k, v in params.items():
        a = np.asarray(v)
        if a.ndim == 4:
            a = a.transpose(3, 2, 0, 1)
        elif a.ndim == 2 and k.endswith("weight"):
            a = a.transpose(1, 0)
        out[k] = a
    return out
