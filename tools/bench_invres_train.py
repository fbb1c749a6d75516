"""A/B the InvResUnit TRAINING path: 6D halo-gather oracle vs full-map
formulation (fullmap_pointwise + halo bands + interleaved blocked depthwise).

Times value_and_grad (w.r.t. x and w) of a scalar loss through one unit at
the HyperSeg-M k=3 decoder-level shapes — the training step can't use the
eval-only Pallas kernel, so this decides ops.patch.FULLMAP_INVRES for the
train step (and the eval batch >= 2 XLA fallback). Run alone on the idle
chip; fori_loop methodology, iters >= 100.

Usage: python tools/bench_invres_train.py [batch ...]   (default: 8 16)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hyperseg_tpu.models.decoder import InvResUnit
from hyperseg_tpu.nn import functional as F
from hyperseg_tpu.ops import patch as P

SHAPES = [
    # name, (H, W), fh, fw, cin, hidden, out, k
    ("M_level3", (128, 256), 16, 32, 24, 48, 16, 3),
    ("M_level4", (256, 512), 16, 32, 34, 68, 19, 3),
]
ITERS = 100


import functools

from tools._bench import timed as _timed

# grad steps are ms-scale, so 100 iterations already amortize the ~40 ms
# per-call dispatch bias past the 1% mark
timed = functools.partial(_timed, iters=ITERS)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 16]
    dtype = jnp.bfloat16
    for batch in batches:
        for name, (hgt, wid), fh, fw, cin, hidden, out, k in SHAPES:
            unit = InvResUnit(prefix="u", in_ch=cin, out_ch=out,
                              hidden=hidden, kernel=k)
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.rand(batch, hgt, wid, cin), dtype)
            w = jnp.asarray(rng.rand(batch, fh, fw, unit.hyper_params) * 0.1,
                            dtype)
            params = {}
            for i, ch in [(1, hidden), (2, hidden), (3, out)]:
                params[f"u.bn{i}.weight"] = jnp.ones(ch, jnp.float32)
                params[f"u.bn{i}.bias"] = jnp.zeros(ch, jnp.float32)
                params[f"u.bn{i}.running_mean"] = jnp.zeros(ch, jnp.float32)
                params[f"u.bn{i}.running_var"] = jnp.ones(ch, jnp.float32)

            def loss(xx, ww):
                ctx = F.Ctx(train=True)
                y = unit.apply(params, xx, ww, ctx)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

            grad_fn = jax.value_and_grad(loss, argnums=(0, 1))

            def step(xx, ww):
                val, (gx, gw) = grad_fn(xx, ww)
                return (val + gx.astype(jnp.float32).sum()
                        + gw.astype(jnp.float32).sum())

            times = {}
            for flag in (False, True):
                P.FULLMAP_INVRES = flag
                times[flag] = timed(step, x, w)
            P.FULLMAP_INVRES = True
            print(f"b={batch} {name}: gather={times[False]:.3f} ms "
                  f"fullmap={times[True]:.3f} ms  "
                  f"speedup={times[False] / times[True]:.2f}x")


if __name__ == "__main__":
    main()
