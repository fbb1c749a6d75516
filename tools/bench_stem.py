"""A/B the fused stem kernel's de-interleave: one-hot selection matmul vs
lane-permutation gather (tpu.dynamic_gather), plus the XLA stem for scale.

Shapes are the shipped benchmark inputs. Run alone on the idle chip;
fori_loop methodology, iters >= 200 (amortizes the ~40 ms per-call bias).

Usage: python tools/bench_stem.py [batch ...]   (default: 1 8)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hyperseg_tpu.nn import functional as F
from hyperseg_tpu.ops.pallas import stem as S

SHAPES = [("M_city", 512, 1024), ("S_camvid", 576, 768), ("L_voc", 512, 512)]
ITERS = 200


import functools

from tools._bench import timed as _timed

timed = functools.partial(_timed, iters=ITERS)


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8]
    only = [a for a in sys.argv[1:] if not a.isdigit()]
    shapes = [s for s in SHAPES if not only or any(o in s[0] for o in only)]
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    wt = jnp.asarray(rng.randn(3, 3, 3, 32) * 0.1, dtype)
    s = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    m = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    v = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)

    for batch in batches:
        for name, H, W in shapes:
            if not S.supported(H, W, 3):
                print(f"b={batch} {name}: unsupported, skipped")
                continue
            x = jnp.asarray(rng.rand(batch, H, W, 3), dtype)
            pad = F.same_padding_2d((H, W), (3, 3), (2, 2))

            def xla_stem(xi):
                y = F.conv2d(xi, wt, stride=(2, 2), padding=pad)
                y = (y - m) * jax.lax.rsqrt(v + 1e-3) * s + b
                return y * jax.nn.sigmoid(y)

            def matmul_stem(xi, band=32, cw=None):
                return S.stem_conv_bn_swish(xi, wt, s, b, m, v, gather=False,
                                            band_rows=band, chunk_cols=cw)

            def gather_stem(xi):
                return S.stem_conv_bn_swish(xi, wt, s, b, m, v, gather=True)

            res = {}
            # band sweep: the selection matmul's M dim is 2*band+2 rows —
            # band=32 is 66 rows (half an MXU M-tile), band=64 is 130
            for vname, fn in [("xla", xla_stem), ("matmul", matmul_stem),
                              ("band64",
                               functools.partial(matmul_stem, band=64)),
                              ("band128",
                               functools.partial(matmul_stem, band=128)),
                              # narrow chunks: per-col selection MACs scale
                              # with CW, so 128 halves the dominant matmul
                              ("cw128",
                               functools.partial(matmul_stem, cw=128)),
                              ("cw128b64",
                               functools.partial(matmul_stem, band=64,
                                                 cw=128)),
                              ("cw128b128",
                               functools.partial(matmul_stem, band=128,
                                                 cw=128)),
                              ("gather", gather_stem)]:
                try:
                    res[vname] = timed(fn, x)
                except Exception as e:
                    res[vname] = float("nan")
                    print(f"  {vname} failed: {type(e).__name__}: "
                          f"{str(e)[:200]}")
            print(f"b={batch} {name}: " +
                  "  ".join(f"{k}={t:.3f}ms" for k, t in res.items()),
                  flush=True)


if __name__ == "__main__":
    main()
