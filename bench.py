"""Benchmark: HyperSeg-M forward throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 36.9 FPS on a GTX 1080Ti (reference README.md:28,33), Cityscapes
1024x512. Methodology mirrors test_fps.py (warmup pass then timed pass with
device sync, test_fps.py:163-191) but keeps BatchNorm (XLA folds it) and uses
bfloat16 compute on the MXU.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 36.9


def main():
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    from __graft_entry__ import HYPERSEG_M_KW

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    model = V1.hyperseg_efficientnet("efficientnet-b1", **HYPERSEG_M_KW)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 and a.ndim >= 2 else a, params)

    @jax.jit
    def forward(params, x):
        return model(params, x)

    x = jnp.asarray(np.random.rand(batch, 512, 1024, 3), jnp.bfloat16)

    # compile + warmup
    out = forward(params, x)
    jax.block_until_ready(out)
    for _ in range(5):
        jax.block_until_ready(forward(params, x))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "hyperseg_m_cityscapes_1024x512_fps",
        "value": round(fps, 2),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
