"""Per-component on-device timing for the flagship HyperSeg-M forward.

Times nested prefixes of the pipeline with the bench.py fori_loop methodology
(the only valid timing on this tunneled platform) and reports differences:
stem, backbone, weight mapper, decoder, final resize.

Round-3 correction: the fori_loop harness itself costs a fixed ~0.15-0.19 ms
per iteration on this platform (identity-body measurement) — per-component
numbers subtract a same-shape identity baseline; the raw column is what the
harness printed in rounds 1-2.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])


import functools

from tools._bench import timed as _timed

timed = functools.partial(_timed, iters=500)


def main():
    from __graft_entry__ import _build_model
    from hyperseg_tpu.nn import functional as F

    model = _build_model()
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 and a.ndim >= 2 else a,
                          params)
    x = jnp.asarray(np.random.rand(1, 512, 1024, 3), jnp.bfloat16)
    bb = model.backbone
    bparams = model._backbone_params(params)

    base = timed(lambda xx: xx, x)   # harness floor: perturb + sum, no model
    t_full = timed(lambda xx: model(params, xx), x)
    t_backbone = timed(lambda xx: jnp.concatenate(
        [f.sum(axis=-1, keepdims=True).reshape(1, -1, 1, 1)
         for f in bb(bparams, xx)], axis=1), x)
    t_bb_map = timed(lambda xx: model.weight_mapper(
        params, bb(bparams, xx)[-1], None), x)

    y = jnp.asarray(np.random.rand(1, 256, 512, 19), jnp.bfloat16)
    base_r = timed(lambda yy: yy, y)
    t_resize = timed(lambda yy: F.resize_bilinear(yy, (512, 1024)), y)

    r_full, r_bb, r_map, r_res = (t_full - base, t_backbone - base,
                                  t_bb_map - base, t_resize - base_r)
    print(f"harness floor     : {base:.3f} ms/iter (identity body; "
          f"subtracted below)")
    print(f"full forward      : {r_full:.3f} ms  (raw {t_full:.3f})")
    print(f"backbone          : {r_bb:.3f} ms  (raw {t_backbone:.3f})")
    print(f"backbone+mapper   : {r_map:.3f} ms  (mapper ~{r_map - r_bb:.3f})")
    print(f"decoder (by diff) : {r_full - r_map - r_res:.3f} ms")
    print(f"final resize      : {r_res:.3f} ms  (raw {t_resize:.3f})")


if __name__ == "__main__":
    main()
