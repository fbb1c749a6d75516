"""Shared on-device timing harness for tools/bench_*.

Methodology (bench.py docstring): run the op inside an on-device
lax.fori_loop with the first argument perturbed per iteration (prevents
loop-invariant hoisting), reduce to one f32 scalar (single readback),
compile+warm once, then time the next invocation.

EVERY invocation must be made unique (the `offset` scalar below): the
tunneled platform DEDUPLICATES repeated executions with identical
(executable, args) — the second call can return the first call's cached
scalar in ~0 time with the correct value, which silently zeroes the
measurement (observed round 3: a 72 ms/iter loss loop read 0.000 ms).
Never time a call whose arguments exactly repeat an earlier call's.

A fixed ~40 ms per-call dispatch cost rides every loop invocation, so keep
iters * per-iter-time >= ~4 s — iters >= 200 for sub-20 ms ops, more for
very fast ops, fewer only when each iteration is long (e.g. full train
steps). BUT keep a single execute under ~60 s: a ~144 s fori_loop execute
died with UNAVAILABLE (device watchdog). When the op cost is unknown, probe
with small iters first (see timed_auto).

Run benches serially: concurrent TPU processes corrupt each other's
fori_loop timings (2x distortions observed round 2; 1000x-fast reads
observed round 3).
"""

import itertools
import time

import jax
import jax.numpy as jnp
from jax import lax

_CALL_SEQ = itertools.count(1)


def float_perturb(a, i):
    """Default per-iteration input perturbation for float arrays."""
    return a + i.astype(a.dtype) * jnp.asarray(1e-6, a.dtype)


def timed(fn, *args, iters=200, perturb=float_perturb):
    """ms per call of fn(*args), on-device fori_loop methodology.

    The first argument is perturbed each iteration via `perturb(a0, i)`
    (pass a custom one for integer inputs, e.g. lambda a, i: (a + i) % C).
    Each invocation threads a fresh process-unique offset through the
    perturbation so no two executions ever have identical args (defeats
    the platform's execution dedup — see module docstring).
    """
    @jax.jit
    def loop(a0, rest, offset):
        def body(i, acc):
            return acc + jnp.sum(fn(perturb(a0, i + offset), *rest),
                                 dtype=jnp.float32)
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    # float(...) forces the scalar readback — the only reliable sync on this
    # platform (block_until_ready can return before device completion here).
    float(loop(args[0], args[1:], jnp.int32(next(_CALL_SEQ))))
    t0 = time.perf_counter()
    float(loop(args[0], args[1:], jnp.int32(next(_CALL_SEQ))))
    return (time.perf_counter() - t0) / iters * 1e3


DISPATCH_S = 0.040  # fixed per-invocation dispatch cost on this platform


def timed_auto(fn, *args, target_s=4.0, perturb=float_perturb):
    """Like timed, but sizes iters automatically.

    Probes with ONE iteration first so an op of unknown cost can never run
    a probe past the ~60 s device watchdog; escalates to an 8-iter probe
    only when the 1-iter reading is dispatch-dominated (i.e. the op is
    cheap, so the bigger probe is also cheap). The dispatch cost is
    subtracted from the probe reading before sizing the measurement loop —
    otherwise a 0.05 ms/iter op reads the 40 ms dispatch amortized over the
    probe as its own cost and the final loop runs ~10x short of target_s.
    """
    ms1 = timed(fn, *args, iters=1, perturb=perturb)
    if ms1 / 1e3 > 10 * DISPATCH_S:
        per_iter_s = ms1 / 1e3 - DISPATCH_S
    else:
        probe_iters = 8
        ms = timed(fn, *args, iters=probe_iters, perturb=perturb)
        per_iter_s = max(ms / 1e3 - DISPATCH_S / probe_iters, 1e-6)
    iters = max(8, min(int(target_s / per_iter_s), 100_000))
    return timed(fn, *args, iters=iters, perturb=perturb)
