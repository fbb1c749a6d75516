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


def fps_of(model, params, res, batch=1, iters=400):
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
    import sys
    from hyperseg_tpu.utils.profile import model_profile
    # numeric args are batch sizes; non-numeric args filter configs by
    # substring (e.g. `python bench_all.py 1 l_camvid`)
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8]
    only = [a for a in sys.argv[1:] if not a.isdigit()]

    rows = []
    for name, spec, res, base in CONFIGS:
        if only and not any(o in name for o in only):
            continue
        model = registry.parse_spec(spec).build()
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 and a.ndim >= 2 else a, params)
        try:
            _, total = model_profile(model, res, print_table=False)
            gmacs = total.macs / 1e9
        except Exception:
            gmacs = None
        for batch in batches:
            # iters >= 200 regardless of batch: the fixed ~40 ms per-call
            # dispatch bias needs >= ~4 s of loop to stay under ~1%
            # (bench.py docstring / round-3 standing constraint)
            fps = fps_of(model, params, res, batch=batch,
                         iters=max(400 // batch, 200))
            # achieved TFLOP/s against the analytic MAC count (2 FLOPs/MAC);
            # MFU denominator: 197 TFLOP/s bf16 peak (v5e datasheet; chip
            # probes measure 165-240 depending on shape)
            tflops = (2 * gmacs * fps / 1e3) if gmacs else None
            rec = {"metric": f"{name}_fps", "batch": batch,
                   "value": round(fps, 2), "unit": "img/s",
                   "vs_baseline": round(fps / base, 3) if base else None,
                   "achieved_tflops": round(tflops, 2) if tflops else None,
                   "mfu_pct": round(100 * tflops / 197, 1) if tflops else None}
            print(json.dumps(rec), flush=True)
            rows.append((name, res, batch, fps, base, tflops))

    print("\n| config | resolution | batch | TPU v5e img/s | 1080Ti img/s "
          "| speedup | TFLOP/s (MFU) |")
    print("|---|---|---|---|---|---|---|")
    for name, res, batch, fps, base, tflops in rows:
        spd = f"{fps / base:.1f}x" if (base and batch == 1) else "-"
        mfu = f"{tflops:.1f} ({100 * tflops / 197:.1f}%)" if tflops else "-"
        print(f"| {name} | {res[1]}x{res[0]} | {batch} | {fps:.1f} "
              f"| {base if batch == 1 and base else '-'} | {spd} | {mfu} |")


if __name__ == "__main__":
    main()
