"""Benchmark: HyperSeg-M forward throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 36.9 FPS on a GTX 1080Ti (reference README.md:28,33), Cityscapes
1024x512.

Methodology: the forward runs inside an on-device lax.fori_loop (input
perturbed per iteration to prevent loop-invariant hoisting) with a single
scalar readback — this measures pure device throughput. Naive async-dispatch
timing is invalid on this tunneled platform (block_until_ready returns before
device completion), and per-call readbacks would bill one network RTT per
batch. A fixed ~40 ms per-call dispatch cost rides every loop invocation
(measured round 3 via identity bodies at 50/200/1000 iters: 0.87/0.19/0.044
ms/iter — pure 1/iters scaling), so iters defaults to 1000 to keep that
constant bias under ~2%; rounds 1-2 ran iters=100 and under-reported all
throughputs by ~15%.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BASELINE_FPS = 36.9


def device_loop_fps(model, params, batch, res=(512, 1024), iters=1000, dtype=jnp.bfloat16):
    @jax.jit
    def loop(p, x, offset):
        def body(i, acc):
            xi = x + (i + offset).astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
            return acc + model(p, xi).sum().astype(jnp.float32)
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    # The offset makes every invocation's args unique: the tunneled platform
    # coalesces/dedups repeated executions with identical (executable, args),
    # which can return the warm call's cached scalar in ~0 time and fake an
    # arbitrarily high throughput (observed round 3 on the loss/train benches).
    # Process-unique offsets (stride iters): fixed 0/iters would repeat the
    # exact (executable, args) pairs of an earlier same-process call and
    # re-trigger the platform dedup.
    from tools._bench import _CALL_SEQ
    x = jnp.asarray(np.random.rand(batch, *res, 3), dtype)
    float(loop(params, x, jnp.int32(next(_CALL_SEQ) * iters)))  # compile+warm
    t0 = time.perf_counter()
    float(loop(params, x, jnp.int32(next(_CALL_SEQ) * iters)))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _init_backend_or_die(timeout_s=900):
    """Force backend init under a watchdog: when the TPU tunnel is black-holed
    the first device query blocks forever (even SIGTERM-proof for the caller's
    pipe), which would hang the whole benchmark run. Fail loudly instead —
    stderr message + nonzero exit, and NO metric line, so a dead tunnel is
    recorded as a failed run rather than a fake number."""
    import os
    import threading

    def die():
        print(f"bench.py: TPU backend init exceeded {timeout_s}s — "
              "tunnel down? no metric emitted", file=sys.stderr, flush=True)
        os._exit(3)

    t = threading.Timer(timeout_s, die)
    t.daemon = True
    t.start()
    dev = jax.devices()
    t.cancel()
    return dev


def main():
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    from __graft_entry__ import HYPERSEG_M_KW

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    _init_backend_or_die()

    model = V1.hyperseg_efficientnet("efficientnet-b1", **HYPERSEG_M_KW)
    params = model.init(jax.random.PRNGKey(0))
    # Pin the benchmarked model to the exact config the parity suite
    # validates (tests/test_hyperseg_v1_0.py uses the same kwargs): a drifted
    # kwarg would silently benchmark the wrong architecture otherwise.
    from hyperseg_tpu.utils.profile import count_params
    got = count_params(params)
    expected = (10378108, 10311214)
    assert got == expected, (
        f"benchmark model param count {got} != parity-tested HyperSeg-M "
        f"{expected}; HYPERSEG_M_KW drifted from the validated config")
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 and a.ndim >= 2 else a, params)

    fps = device_loop_fps(model, params, batch, iters=iters)
    print(json.dumps({
        "metric": "hyperseg_m_cityscapes_1024x512_fps",
        "value": round(fps, 2),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
