"""A/B the confusion-matrix formulations (MXU matmul vs scatter bincount).

The confmat runs inside every train and eval step at full label resolution,
so a slow lowering taxes every step. Run alone on the idle chip.

Usage: python tools/bench_metrics.py [batch ...]   (default: 8 16)
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
ITERS = 200


import functools

from tools._bench import timed as _timed

timed = functools.partial(_timed, iters=ITERS,
                          perturb=lambda a, i: (a + i) % C)


def main():
    from hyperseg_tpu.train import metrics as M

    batches = [int(x) for x in sys.argv[1:]] or [8, 16]
    rng = np.random.RandomState(0)
    print("| batch | method | ms/step |")
    print("|---|---|---|")
    for b in batches:
        labels = jnp.asarray(rng.randint(0, C, (b, *RES)), jnp.int32)
        preds = jnp.asarray(rng.randint(0, C, (b, *RES)), jnp.int32)
        base = timed(lambda l, p: l[0, 0, 0], labels, preds)
        for method in ("matmul", "bincount"):
            ms = timed(lambda l, p, m=method: M.confusion_matrix(
                l, p, C, method=m), labels, preds) - base
            print(f"| {b} | {method} | {ms:.3f} |", flush=True)


if __name__ == "__main__":
    main()
