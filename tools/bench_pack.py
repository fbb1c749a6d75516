"""In-graph (whole-model) A/B for the lane-packed inverted-residual kernel
(round-3 item 10 / round-4 verdict item 3).

The isolated sweep (tools/bench_invres.py) shows pack4 beating BOTH the base
fused kernel (-21..-42%) and the XLA gather path (6/7 shapes) at batch 1 —
but the repo's standing rule is that only the in-graph measurement binds
(the stem kernel's isolated-vs-in-graph inversion, BENCHMARKS.md). This tool
measures full-model img/s per config under flag sets:

  default : shipped defaults (s2w-fused kernel at b>=2 + b1 big-patch
            carve-out; LANE_PACK=1)
  pack    : packed kernel wherever the invres kernel dispatches, weights
            materialized by the XLA s2w matmul (S2W_FUSED off — the packed
            kernel consumes materialized weights; their HBM round-trip is
            <3 MB/level)
  pack_b1 : pack + kernels forced at batch 1 (isolated sweep says the packed
            kernel beats gather at b1 on 6/7 shapes)

Usage: python tools/bench_pack.py [batch ...] [config-substring ...]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import numpy as np
    import jax.numpy as jnp
    from hyperseg_tpu.core import registry
    from hyperseg_tpu.ops import pallas as pallas_cfg
    from hyperseg_tpu.ops.pallas import patch_invres as PI
    import bench_all

    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 8]
    only = [a for a in sys.argv[1:] if not a.isdigit()]

    defaults = (pallas_cfg.INVRES_MIN_BATCH, pallas_cfg.INVRES_B1_MIN_PATCH_AREA,
                PI.S2W_FUSED, PI.LANE_PACK)

    def pin(variant):
        (pallas_cfg.INVRES_MIN_BATCH, pallas_cfg.INVRES_B1_MIN_PATCH_AREA,
         PI.S2W_FUSED, PI.LANE_PACK) = defaults
        if variant == "r4":           # round-4 shipped behavior (the b1
            PI.LANE_PACK = 1          # pixel gate self-disables at g=1)
        elif variant == "pack":       # packed, weights materialized by XLA
            PI.S2W_FUSED = False
            PI.LANE_PACK = 4
        elif variant == "pack_b1":
            PI.S2W_FUSED = False
            PI.LANE_PACK = 4
            pallas_cfg.INVRES_MIN_BATCH = 1

    for name, spec, res, base in bench_all.CONFIGS:
        if only and not any(o in name for o in only):
            continue
        model = registry.parse_spec(spec).build()
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 and a.ndim >= 2 else a, params)
        for batch in batches:
            row = {}
            variants = (["default", "r4", "pack"]
                        + (["pack_b1"] if batch == 1 else []))
            for variant in variants:
                pin(variant)
                try:
                    row[variant] = bench_all.fps_of(
                        model, params, res, batch=batch,
                        iters=max(400 // batch, 200))
                except Exception as e:
                    print(f"  {name}/b{batch}/{variant} failed: "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                    row[variant] = float("nan")
            pin("default")
            cells = "  ".join(f"{k}={v:.1f}" for k, v in row.items())
            print(f"{name} b{batch}: {cells} img/s", flush=True)


if __name__ == "__main__":
    main()
