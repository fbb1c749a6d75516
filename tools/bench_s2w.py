"""A/B the fully fused signal2weights + inverted-residual kernel (S2W_FUSED)
at the full-model level: the v1_0-family configs whose k=3 levels dispatch it.

Run alone on the idle chip. Usage: python tools/bench_s2w.py [batches...]
(default: 1 8). Batch 1 additionally forces the kernels on (pallas ENABLED)
so the fused form can be compared against both the XLA path and the plain
kernel there.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench_all import CONFIGS, fps_of
from hyperseg_tpu.core import registry
from hyperseg_tpu.ops import pallas as pallas_cfg
from hyperseg_tpu.ops.pallas import patch_invres as PI

NAMES = ("hyperseg-m_cityscapes_1024x512", "hyperseg-s_camvid_768x576",
         "hyperseg-l_camvid_1024x768")


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    for name, spec, res, _ in CONFIGS:
        if name not in NAMES:
            continue
        model = registry.parse_spec(spec).build()
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 and a.ndim >= 2 else a, params)
        for b in batches:
            row = {}
            for fused in (False, True):
                PI.S2W_FUSED = fused
                force = b < pallas_cfg.INVRES_MIN_BATCH
                pallas_cfg.ENABLED = force  # expose the kernels at batch 1
                try:
                    row["fused" if fused else "plain"] = fps_of(
                        model, params, res, batch=b,
                        iters=max(50, 400 // b))
                except Exception as e:
                    print(f"  {name} b={b} fused={fused} failed: "
                          f"{type(e).__name__}: {str(e)[:140]}", flush=True)
                    row["fused" if fused else "plain"] = float("nan")
                finally:
                    pallas_cfg.ENABLED = False
                    PI.S2W_FUSED = False
            sp = row["fused"] / row["plain"] if row["plain"] == row["plain"] \
                else float("nan")
            print(f"{name} b={b}: plain={row['plain']:.1f} "
                  f"fused={row['fused']:.1f} img/s  speedup={sp:.3f}x",
                  flush=True)


if __name__ == "__main__":
    main()
