"""Benchmark all headline model configurations against the reference table
(README.md:25-31 / BASELINE.md). Prints one JSON line per config plus a
markdown table; bench.py remains the single-metric driver entry."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from hyperseg_tpu.core import registry

CONFIGS = [
    ("hyperseg-m_cityscapes_1024x512",
     "hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet('efficientnet-b1',"
     "levels=2, out_feat_scale=[1.0,0.25,0.25,0.25,0.25], kernel_sizes=[1,1,1,3,3],"
     "level_channels=[64,32,16,16,16], expand_ratio=2,"
     "weight_groups=[32,16,8,16,4], num_classes=19)",
     (512, 1024), 36.9),
    ("hyperseg-s_cityscapes_1536x768",
     "hyperseg_tpu.models.hyperseg_v1_0_unify.hyperseg_efficientnet('efficientnet-b1',"
     "levels=2, out_feat_scale=[1.0,0.166,0.2,0.25,0.4], kernel_sizes=[1,1,1,3,3],"
     "level_channels=[32,16,8,8,8], expand_ratio=2, weight_groups=[32,16,8,16,4],"
     "unify_level=4, num_classes=19)",
     (768, 1536), 16.1),
    ("hyperseg-s_camvid_768x576",
     "hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet('efficientnet-b1',"
     "levels=2, kernel_sizes=(1,1,1,3,3), level_channels=[64,32,16,16,16],"
     "expand_ratio=2, weight_groups=[64,32,32,16,8], num_classes=12)",
     (576, 768), 38.0),
    ("hyperseg-l_camvid_1024x768",
     "hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet('efficientnet-b1',"
     "levels=2, kernel_sizes=(1,1,1,3,3,3), level_channels=[64,32,16,16,16,16],"
     "expand_ratio=2, weight_groups=[64,32,32,16,8,8], num_classes=12)",
     (768, 1024), 16.6),
    ("hyperseg-l_voc_512x512",
     "hyperseg_tpu.models.hyperseg_v0_1.hyperseg_efficientnet('efficientnet-b3',"
     "levels=3, kernel_sizes=(1,1,3,3,3,3), expand_ratio=2, weight_groups=16,"
     "num_classes=21)",
     (512, 512), None),
]


def fps_of(model, params, res, batch=1, iters=100):
    @jax.jit
    def loop(p, x):
        def body(i, acc):
            xi = x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
            return acc + model(p, xi).sum().astype(jnp.float32)
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    x = jnp.asarray(np.random.rand(batch, *res, 3), jnp.bfloat16)
    float(loop(params, x))
    t0 = time.perf_counter()
    float(loop(params, x))
    return batch * iters / (time.perf_counter() - t0)


def main():
    rows = []
    for name, spec, res, base in CONFIGS:
        model = registry.parse_spec(spec).build()
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 and a.ndim >= 2 else a, params)
        fps = fps_of(model, params, res)
        rec = {"metric": f"{name}_fps", "value": round(fps, 2), "unit": "img/s",
               "vs_baseline": round(fps / base, 3) if base else None}
        print(json.dumps(rec), flush=True)
        rows.append((name, res, fps, base))

    print("\n| config | resolution | TPU v5e img/s | 1080Ti img/s | speedup |")
    print("|---|---|---|---|---|")
    for name, res, fps, base in rows:
        spd = f"{fps / base:.1f}x" if base else "-"
        print(f"| {name} | {res[1]}x{res[0]} | {fps:.1f} | {base or '-'} | {spd} |")


if __name__ == "__main__":
    main()
