"""Measure the patch inverted-residual op: XLA path vs fused Pallas kernel.

Runs on the real TPU chip; shapes are the HyperSeg-M k=3 decoder levels at
the benchmark resolution (512x1024). Methodology matches bench.py: on-device
fori_loop, perturbed input, single scalar readback."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hyperseg_tpu.models.decoder import InvResUnit
from hyperseg_tpu.nn import functional as F

SHAPES = [
    # name, (B, H, W), fh, fw, cin, hidden, out, k
    # (decoder level ℓ of a (H0, W0) input runs at H0/2^(4-ℓ); the patch grid
    # is H0/32 x W0/32 — traced for HyperSeg-M 512x1024 / HyperSeg-S CamVid
    # 576x768: level-3 patches are 8x8, level-4 patches 16x16)
    ("M_level3", (1, 128, 256), 16, 32, 24, 48, 16, 3),
    ("M_level4", (1, 256, 512), 16, 32, 34, 68, 19, 3),
    ("S_camvid_l3", (1, 144, 192), 18, 24, 24, 48, 16, 3),
    ("S_camvid_l4", (1, 288, 384), 18, 24, 34, 68, 12, 3),
]


def timed(fn, *args, iters=200):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            x = a[0] + i.astype(a[0].dtype) * jnp.asarray(1e-6, a[0].dtype)
            return acc + fn(x, *a[1:]).astype(jnp.float32).sum()
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from hyperseg_tpu.ops import pallas as pallas_cfg
    dtype = jnp.bfloat16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for name, (b, hgt, wid), fh, fw, cin, hidden, out, k in SHAPES:
        b *= batch
        unit = InvResUnit(prefix="u", in_ch=cin, out_ch=out, hidden=hidden,
                          kernel=k)
        P = unit.hyper_params
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(b, hgt, wid, cin), dtype)
        w = jnp.asarray(rng.rand(b, fh, fw, P) * 0.1, dtype)
        params = {}
        for i, ch in [(1, hidden), (2, hidden), (3, out)]:
            params[f"u.bn{i}.weight"] = jnp.ones(ch, jnp.float32)
            params[f"u.bn{i}.bias"] = jnp.zeros(ch, jnp.float32)
            params[f"u.bn{i}.running_mean"] = jnp.zeros(ch, jnp.float32)
            params[f"u.bn{i}.running_var"] = jnp.ones(ch, jnp.float32)

        from hyperseg_tpu.ops.pallas import patch_invres as PI
        pallas_cfg.ENABLED = False
        t_xla = timed(lambda xx, ww: unit.apply(params, xx, ww), x, w)
        pallas_cfg.ENABLED = True
        PI.RANK4_DOT = False
        t_pl = timed(lambda xx, ww: unit.apply(params, xx, ww), x, w)
        PI.RANK4_DOT = True
        t_r4 = timed(lambda xx, ww: unit.apply(params, xx, ww), x, w)
        PI.RANK4_DOT = False
        pallas_cfg.ENABLED = False

        # parity sanity on the same inputs
        y0 = np.asarray(unit.apply(params, x.astype(jnp.float32),
                                   w.astype(jnp.float32)))
        pallas_cfg.ENABLED = True
        y1 = np.asarray(unit.apply(params, x.astype(jnp.float32),
                                   w.astype(jnp.float32)))
        pallas_cfg.ENABLED = False
        dev = np.abs(y0 - y1).max() / (np.abs(y0).max() + 1e-6)
        print(f"{name}: xla={t_xla:.3f} ms  pallas={t_pl:.3f} ms  "
              f"rank4={t_r4:.3f} ms  speedup={t_xla / t_pl:.2f}x  "
              f"rel_dev={dev:.2e}")


if __name__ == "__main__":
    main()
