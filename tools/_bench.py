"""Shared on-device timing harness for tools/bench_*.

Methodology (bench.py docstring): run the op inside an on-device
lax.fori_loop with the first argument perturbed per iteration (prevents
loop-invariant hoisting), reduce to one f32 scalar (single readback),
compile+warm once, then time the second invocation.

A fixed ~40 ms per-call dispatch cost rides every loop invocation on this
tunneled platform, so keep iters * per-iter-time >= ~4 s — iters >= 200 for
sub-20 ms ops, more for very fast ops, fewer only when each iteration is
long (e.g. full train steps). Round-3 standing constraint; at iters=50 the
bias inflates per-iter numbers by ~0.4 ms.

Run benches serially: concurrent TPU processes corrupt each other's
fori_loop timings (2x distortions observed round 2).
"""

import time

import jax
import jax.numpy as jnp
from jax import lax


def float_perturb(a, i):
    """Default per-iteration input perturbation for float arrays."""
    return a + i.astype(a.dtype) * jnp.asarray(1e-6, a.dtype)


def timed(fn, *args, iters=200, perturb=float_perturb):
    """ms per call of fn(*args), on-device fori_loop methodology.

    The first argument is perturbed each iteration via `perturb(a0, i)`
    (pass a custom one for integer inputs, e.g. lambda a, i: (a + i) % C).
    """
    @jax.jit
    def loop(a0, rest):
        def body(i, acc):
            return acc + jnp.sum(fn(perturb(a0, i), *rest),
                                 dtype=jnp.float32)
        return lax.fori_loop(0, iters, body, jnp.float32(0))

    jax.block_until_ready(loop(args[0], args[1:]))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(args[0], args[1:]))
    return (time.perf_counter() - t0) / iters * 1e3
