"""Per-level decoder timing vs batch size for the flagship HyperSeg-M.

The batch-scaling diagnostic (tools/bench_batch.py) showed the decoder's
per-image cost roughly doubling from batch 1 to 8 while the backbone stays
flat. This tool localizes that: it times the decoder with levels truncated
to a prefix (the plan is a plain Python object, so a shallow copy with
level_units[:k] is a valid sub-plan) and the final bilinear resize alone.

Run alone on the idle chip. Usage: python tools/bench_decoder_batch.py [batches...]
"""

import copy
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])


import functools

from tools._bench import timed as _timed

timed = functools.partial(_timed, iters=300)


def main():
    from __graft_entry__ import _build_model
    from hyperseg_tpu.nn import functional as F

    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    model = _build_model()
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 and a.ndim >= 2 else a,
                          params)
    rng = np.random.RandomState(0)
    dec = model.decoder

    for b in batches:
        x = jnp.asarray(rng.rand(b, 512, 1024, 3), jnp.bfloat16)
        feats = jax.jit(lambda xx: model.backbone(
            model._backbone_params(params), xx))(x)
        s = jax.jit(lambda f: model.weight_mapper(params, f, None))(feats[-1])
        s = jax.block_until_ready(s)
        xs = [x] + list(feats[:-1])

        base = timed(lambda ss: ss, s)
        prev = 0.0
        for k in range(1, dec.levels + 1):
            sub = copy.copy(dec)
            sub.level_units = dec.level_units[:k]
            sub.levels = k
            # truncated sub-plans: neutralize the final resize by passing a
            # dummy xs[0] whose spatial shape matches level k-1's output
            # (the level consumes xs[-k], so its spatial shape is the
            # output's); the full plan keeps the real xs
            sub_xs = xs if k == dec.levels else [xs[-k]] + xs[1:]
            t = timed(lambda ss, sub=sub, sub_xs=sub_xs:
                      sub(params, sub_xs, ss), s) - base
            print(f"  b={b} levels<= {k - 1}: {t:8.3f} ms total "
                  f"(level {k - 1}: {t - prev:6.3f} ms, "
                  f"{(t - prev) / b * 1e3:6.1f} us/img)", flush=True)
            prev = t

        y = jnp.asarray(rng.rand(b, 256, 512, 19), jnp.bfloat16)
        base_r = timed(lambda yy: yy, y)
        t_r = timed(lambda yy: F.resize_bilinear(yy, (512, 1024)), y) - base_r
        print(f"  b={b} final resize alone: {t_r:8.3f} ms "
              f"({t_r / b * 1e3:6.1f} us/img)", flush=True)


if __name__ == "__main__":
    main()
