"""Coarse per-stage batch-scaling diagnostic for ANY bench_all config:
backbone / weight-mapper / decoder level prefixes, at several batch sizes.

Generalizes tools/bench_batch.py (M-specific) to the other configs —
written for the L-voc (v0_1) batch-8 gap. Decoder truncation exploits the
plans being plain Python objects: a shallow copy with level_units[:k] is a
valid sub-plan; for the V0 decoder the per-level weights list is sliced to
match. The final out_fc/resize stages only run on the full plan.

Run alone on the idle chip.
Usage: python tools/bench_stages.py <config-substring> [batches...]
"""

import copy
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools._bench import timed as _timed

timed = functools.partial(_timed, iters=300)


def main():
    from bench_all import CONFIGS
    from hyperseg_tpu.core import registry
    from hyperseg_tpu.models.decoder import MultiScaleDecoderV0

    args = sys.argv[1:]
    only = [a for a in args if not a.isdigit()]
    batches = [int(a) for a in args if a.isdigit()] or [1, 8]
    assert only, "pass a config substring (e.g. l_voc)"
    name, spec, res, _ = next(c for c in CONFIGS if only[0] in c[0])
    print(f"# {name} {res}")

    model = registry.parse_spec(spec).build()
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 and a.ndim >= 2 else a,
                          params)
    rng = np.random.RandomState(0)
    dec = model.decoder
    is_v0 = isinstance(dec, MultiScaleDecoderV0)

    for b in batches:
        x = jnp.asarray(rng.rand(b, *res, 3), jnp.bfloat16)
        bb_ms = timed(lambda xx: model.backbone(
            model._backbone_params(params), xx)[-1], x)
        feats = jax.jit(lambda xx: model.backbone(
            model._backbone_params(params), xx))(x)
        feats = jax.block_until_ready(feats)
        wm_ms = timed(lambda f: jax.tree.leaves(
            model.weight_mapper(params, f, None))[0], feats[-1])
        s = jax.jit(lambda f: model.weight_mapper(params, f, None))(feats[-1])
        s = jax.block_until_ready(s)
        xs = [x] + list(feats[:-1])

        rows = [("backbone", bb_ms), ("weight_mapper", wm_ms)]
        prev = 0.0
        gap_from = None  # first errored level in the current ERR run
        for k in range(1, dec.levels + 1):
            sub = copy.copy(dec)
            sub.level_units = dec.level_units[:k]
            sub.levels = k
            if k < dec.levels:
                sub.out_fc_units = []
            if is_v0:
                # spread the per-level weight list: timed()'s perturb only
                # handles array args
                n = k + 1
                fn = lambda *ws: sub(params, xs, list(ws), None)
                args = tuple(s[:n])
            else:
                fn = lambda ss: sub(params, xs, ss, None)
                args = (s,)
            try:
                ms = timed(fn, *args)
            except Exception as e:
                rows.append((f"level{k - 1}", float("nan")))
                print(f"  level{k - 1}: ERR {type(e).__name__}: {str(e)[:120]}")
                if gap_from is None:
                    gap_from = k - 1
                continue
            # after an ERR, prev is stale: this delta spans the errored
            # level(s) too — label it so the cost isn't misattributed.
            if gap_from is not None:
                rows.append((f"level{gap_from}..{k - 1}", ms - prev))
                gap_from = None
            else:
                rows.append((f"level{k - 1}", ms - prev))
            prev = ms
        rows.append(("decoder_total", prev))
        print(f"batch={b} (ms total / ms-per-img):")
        for nm, ms in rows:
            print(f"  {nm:14s} {ms:8.3f}  {ms / b:8.3f}")


if __name__ == "__main__":
    main()
