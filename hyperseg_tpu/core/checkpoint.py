"""Self-describing checkpoint I/O.

Checkpoint contract mirrors the reference (train.py:267-274, utils/utils.py:
61-82): a checkpoint carries {epoch, state_dict/params, optimizer?, scheduler
step, best_iou, arch}, saved as <exp_dir>/model_latest.* each epoch and copied
to model_best.* on val-mIoU improvement; the 'arch' string lets evaluation
rebuild the exact model without the config (utils/utils.py:96-144,
test.py:89-95).

Storage here is a .npz of the flat parameter dict plus a JSON sidecar record —
parameters are flat {dotted-name: array} by design, so the container is
trivial and fast. Reference .pth checkpoints load transparently through
core.torch_import; arch strings with reference module paths resolve via the
registry alias table.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from hyperseg_tpu.core import registry


def save_checkpoint(exp_dir: str, name: str, params: Dict, *, meta: Optional[dict] = None,
                    opt_state=None, is_best: bool = False):
    """Write <exp_dir>/<name>_latest.npz (+ .json meta), copy to _best on
    improvement (utils/utils.py:61-73 semantics)."""
    os.makedirs(exp_dir, exist_ok=True)
    base = os.path.join(exp_dir, f"{name}_latest")
    np.savez(base + ".npz", **{k: np.asarray(v) for k, v in params.items()})
    with open(base + ".json", "w") as f:
        json.dump(meta or {}, f, indent=1, default=str)
    if opt_state is not None:
        save_opt_state(base + ".opt.npz", opt_state)
    if is_best:
        best = os.path.join(exp_dir, f"{name}_best")
        shutil.copyfile(base + ".npz", best + ".npz")
        shutil.copyfile(base + ".json", best + ".json")
        if opt_state is not None:
            shutil.copyfile(base + ".opt.npz", best + ".opt.npz")


def save_opt_state(path: str, opt_state) -> None:
    """Write an optimizer-state pytree (optax namedtuple nest) as a flat .npz
    keyed by jax keystr paths — same container as the params, no pickle."""
    import jax
    leaves, _ = jax.tree_util.tree_flatten_with_path(opt_state)
    np.savez(path, **{jax.tree_util.keystr(kp): np.asarray(v)
                      for kp, v in leaves})


def load_opt_state(path: str, ref_opt_state):
    """Restore an opt-state .npz into the structure of `ref_opt_state` (a
    freshly initialized state from the same optimizer): leaves are matched by
    keystr path and checked for shape; returns the rebuilt pytree."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten_with_path(ref_opt_state)
    with np.load(path) as z:
        stored = {k: z[k] for k in z.files}
    new_leaves = []
    for kp, ref in leaves:
        key = jax.tree_util.keystr(kp)
        if key not in stored:
            raise KeyError(f"opt-state checkpoint {path} is missing {key} "
                           "(optimizer definition changed since saving?)")
        a = stored[key]
        if tuple(a.shape) != tuple(np.shape(ref)):
            raise ValueError(f"opt-state leaf {key}: checkpoint shape "
                             f"{a.shape} != expected {np.shape(ref)}")
        new_leaves.append(jnp.asarray(a, dtype=np.asarray(ref).dtype))
    return treedef.unflatten(new_leaves)


def jnp_to_np(tree):
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def load_params(path: str, dtype=jnp.float32) -> Tuple[Dict, dict]:
    """Load parameters from .npz (native) or .pth (reference, converted).
    Returns (params, meta)."""
    if path.endswith(".pth"):
        from hyperseg_tpu.core.torch_import import load_torch_checkpoint
        return load_torch_checkpoint(path, dtype=dtype)
    with np.load(path) as z:
        params = {k: jnp.asarray(z[k], dtype=dtype if z[k].ndim else None)
                  for k in z.files}
    meta = {}
    sidecar = path[:-4] + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    return params, meta


def load_model(path: str, *, arch: Optional[str] = None, dtype=jnp.float32,
               **arch_overrides):
    """Rebuild (model, params, meta) from a self-describing checkpoint —
    the equivalent of test.py:67-101 / utils/utils.py:147-181."""
    params, meta = load_params(path, dtype=dtype)
    arch = arch or meta.get("arch")
    if arch is None:
        raise ValueError(f"checkpoint {path} has no arch string; pass arch=")
    spec = registry.parse_spec(arch) if isinstance(arch, str) else arch
    if spec.kwargs.get("pretrained"):
        # the checkpoint's own parameters supersede ImageNet init; don't
        # require (or fetch) backbone weights just to overwrite them
        spec = spec.with_overrides(pretrained=False)
    if arch_overrides:
        spec = spec.with_overrides(**arch_overrides)
    model = spec.build()
    return model, params, meta


def arch_string(model_spec, **extra_kwargs) -> str:
    """Serialize a model spec (+ runtime kwargs like num_classes) into the
    canonical constructor string stored in checkpoints — the get_arch
    equivalent (utils/utils.py:96-144)."""
    spec = registry.spec_of(model_spec)
    if spec is None:
        raise ValueError(f"cannot serialize arch from {model_spec!r}")
    if extra_kwargs:
        spec = spec.with_overrides(**extra_kwargs)
    return spec.to_string()
