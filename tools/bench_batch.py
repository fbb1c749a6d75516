"""Batch-scaling diagnostic for the flagship HyperSeg-M forward.

Times pipeline prefixes at several batch sizes with the bench.py fori_loop
methodology (identity-baseline subtracted) to localize any component whose
per-image cost grows with batch. Run alone on the idle chip.

Usage: python tools/bench_batch.py [batches...]   (default: 1 8)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])


from tools._bench import timed


def main():
    from __graft_entry__ import _build_model
    from hyperseg_tpu.ops import pallas as cfg

    batches = [int(a) for a in sys.argv[1:]] or [1, 8]
    model = _build_model()
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 and a.ndim >= 2 else a,
                          params)
    bb = model.backbone
    bparams = model._backbone_params(params)
    rng = np.random.RandomState(0)

    for b in batches:
        x = jnp.asarray(rng.rand(b, 512, 1024, 3), jnp.bfloat16)
        base = timed(lambda xx: xx, x)
        rows = []

        def probe(label, fn):
            ms = timed(fn, x) - base
            rows.append((label, ms))
            print(f"  b={b} {label:24s}: {ms:8.3f} ms/iter "
                  f"({ms / b:6.3f} ms/img)", flush=True)

        probe("backbone", lambda xx: jnp.concatenate(
            [f.sum(axis=-1, keepdims=True).reshape(b, -1, 1, 1)
             for f in bb(bparams, xx)], axis=1))
        probe("backbone+mapper", lambda xx: model.weight_mapper(
            params, bb(bparams, xx)[-1], None))
        probe("full (pallas on)", lambda xx: model(params, xx))
        st, mb = cfg.STEM_ENABLED, cfg.MBCONV_ENABLED
        cfg.STEM_ENABLED = cfg.MBCONV_ENABLED = False
        try:
            probe("full (pallas off)", lambda xx: model(params, xx))
        finally:
            cfg.STEM_ENABLED, cfg.MBCONV_ENABLED = st, mb


if __name__ == "__main__":
    main()
