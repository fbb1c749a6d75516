"""A/B the per-patch 1x1 conv formulations on the chip.

blocked  = block_patches + patch_pointwise + unblock_patches (two explicit
           (ph <-> fw) HBM transposes around the dot)
fullmap  = fullmap_pointwise (same contraction on the blocked view; no
           explicit transpose)

Shapes are the shipped decoders' 1x1 hyper convs at the benchmark
resolutions (v1_0 k=1 levels + out_fc; v0_1 expand/project 1x1s, the L-voc
batch-8 cost center). Run alone on the idle chip; bench.py fori_loop
methodology (iters >= 200 amortizes the ~40 ms per-call dispatch bias).

Usage: python tools/bench_pointwise.py [batch ...]   (default: 1 8)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hyperseg_tpu.ops import patch as P

SHAPES = [
    # name, (H, W), fh, fw, cin, cout, groups
    ("M_outfc_l4", (256, 512), 16, 32, 16, 19, 1),
    ("M_l2_k1", (64, 128), 16, 32, 32, 16, 1),
    ("Lvoc_expand_l4", (512, 512), 16, 16, 32, 64, 1),
    ("Lvoc_project_l4", (512, 512), 16, 16, 64, 32, 1),
    ("Lvoc_expand_l3", (256, 256), 16, 16, 48, 96, 1),
]


from tools._bench import timed


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    dtype = jnp.bfloat16
    for batch in batches:
        for name, (hgt, wid), fh, fw, cin, cout, g in SHAPES:
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.rand(batch, hgt, wid, cin), dtype)
            w = jnp.asarray(rng.rand(batch, fh, fw, cout * cin // g) * 0.1,
                            dtype)

            def blocked(xx, ww):
                xp = P.block_patches(xx, fh, fw)
                return P.unblock_patches(P.patch_pointwise(xp, ww, cout, g))

            def fullmap(xx, ww):
                return P.fullmap_pointwise(xx, ww, fh, fw, cout, g)

            t_b = timed(blocked, x, w)
            t_f = timed(fullmap, x, w)
            dev = float(jnp.max(jnp.abs(
                blocked(x, w).astype(jnp.float32)
                - fullmap(x, w).astype(jnp.float32))))
            print(f"b={batch} {name}: blocked={t_b:.3f} ms "
                  f"fullmap={t_f:.3f} ms  speedup={t_b / t_f:.2f}x  "
                  f"dev={dev:.2e}")


if __name__ == "__main__":
    main()
