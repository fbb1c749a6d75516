"""A/B the bootstrapped-CE formulations (sort vs select) on the chip.

Times value_and_grad of the loss alone at the Cityscapes-M training shape
(the loss consumes full-resolution logits, so its cost scales with batch).
Run alone on the idle chip; bench.py fori_loop methodology.

Usage: python tools/bench_loss.py [batch ...]   (default: 8 16)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

RES = (512, 1024)
C = 19
# the sort formulation measured ~72 ms/iter at batch 8 (round 3, fixed
# harness) — a fixed iter count either starves fast methods of resolution or
# rams slow ones into the ~60 s execute watchdog; size adaptively.
from tools._bench import timed_auto as timed


def main():
    from hyperseg_tpu.train import losses as L

    batches = [int(a) for a in sys.argv[1:]] or [8, 16]
    rng = np.random.RandomState(0)
    print("| batch | method | fwd ms | fwd+bwd ms |")
    print("|---|---|---|---|")
    for b in batches:
        logits = jnp.asarray(rng.randn(b, *RES, C), jnp.float32)
        labels = jnp.asarray(rng.randint(0, C, (b, *RES)), jnp.int32)
        base = timed(lambda x, y: x[0, 0, 0, 0], logits, labels)
        for method in ("sort", "select"):
            for cmajor in (False, True):
                L.CE_CLASS_MAJOR = cmajor
                def f(x, y, m=method):
                    return L.bootstrapped_cross_entropy(
                        x, y, k=4096, thresh=0.3, ignore_index=255, method=m)

                fwd = timed(f, logits, labels) - base
                fb = timed(lambda x, y: jax.value_and_grad(f)(x, y)[0],
                           logits, labels) - base
                tag = method + ("+cmajor" if cmajor else "")
                print(f"| {b} | {tag} | {fwd:.3f} | {fb:.3f} |", flush=True)
        L.CE_CLASS_MAJOR = True


if __name__ == "__main__":
    main()
