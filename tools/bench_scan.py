"""In-graph A/B for the eval decoder batch scan (models/hypergen.py
_scan_decoder): full-model img/s per config, batched decoder vs lax.map over
the batch.

Motivation (tools/bench_stages.py, v5e): per-IMAGE decoder cost at batch 8 is
1.5-4x its batch-1 value (L-voc level4 0.27 -> 1.01 ms, level5 1.17 -> 2.42;
S-city level4 1.67 -> 1.93) because XLA materializes per-patch layouts it
fuses away at batch 1, while the backbone and mapper amortize with batch.
The scan keeps the batched backbone and the batch-1 decoder graph (with its
measured batch-1 kernel dispatch mix) for each image.

Run alone on the idle chip.
Usage: python tools/bench_scan.py [batch ...] [config-substring ...]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import numpy as np
    import jax.numpy as jnp
    from hyperseg_tpu.core import registry
    from hyperseg_tpu.ops import pallas as pallas_cfg
    import bench_all

    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8]
    only = [a for a in sys.argv[1:] if not a.isdigit()]

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
            for variant, gate in [("batched", 0), ("scan", 2)]:
                pallas_cfg.DECODER_SCAN_MIN_BATCH = gate
                try:
                    row[variant] = bench_all.fps_of(model, params, res,
                                                    batch=batch, iters=200)
                except Exception as e:  # noqa: BLE001 — record and continue
                    row[variant] = f"ERR {type(e).__name__}"
            pallas_cfg.DECODER_SCAN_MIN_BATCH = 2
            cells = "  ".join(
                f"{k}={v:.1f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items())
            print(f"{name} b{batch}: {cells} img/s", flush=True)


if __name__ == "__main__":
    main()
