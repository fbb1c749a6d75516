"""Per-stage fwd+bwd attribution for the flagship training step (VERDICT r4
item 4: the backward adds ~183 ms of the 274 ms b16 step and has never been
localized).

Each row times value_and_grad of a truncated train-mode forward (backbone ->
+mapper -> +decoder level 0..4 -> +resize+CE): the delta between consecutive
rows is that stage's OWN fwd+bwd cost (backbone fwd+bwd rides every row and
cancels in the deltas). Train-mode Ctx so BN batch stats and the halo-band
bn1 multiset are the real training graph. Run alone on the idle chip.

Usage: python tools/bench_bwd.py [batch ...]   (default: 16)
"""

import copy
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

RES = (512, 1024)


def main():
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    from hyperseg_tpu.nn import functional as F
    from hyperseg_tpu.train import losses as L, step as T
    from tools.bench_train import timed_steps
    from __graft_entry__ import HYPERSEG_M_KW

    batches = [int(a) for a in sys.argv[1:]] or [16]
    model = V1.hyperseg_efficientnet("efficientnet-b1", **HYPERSEG_M_KW)
    params = model.init(jax.random.PRNGKey(0))
    criterion = L.BootstrappedCrossEntropyLoss(ignore_index=255)
    trainable, frozen = T.split_params(params)
    dec = model.decoder

    def truncated(tr, x, i, k, with_loss=False, label=None):
        """Train-mode forward through decoder prefix k (0 = backbone only,
        1 = +mapper, 2.. = +decoder levels)."""
        p = {**tr, **frozen}
        ctx = F.Ctx(train=True, rng=jax.random.fold_in(jax.random.PRNGKey(0), i))
        bctx = F.Ctx(train=True, rng=ctx.rng)
        feats = model.backbone(model._backbone_params(p), x, bctx)
        if k == 0:
            return sum(f.astype(jnp.float32).mean() for f in feats)
        s = model.weight_mapper(p, feats[-1], ctx)
        if k == 1:
            return jax.tree.leaves(s)[0].astype(jnp.float32).mean()
        sub = copy.copy(dec)
        sub.level_units = dec.level_units[:k - 1]
        sub.levels = k - 1
        if k - 1 < dec.levels:
            sub.out_fc_units = []
        out = sub(p, [x] + list(feats[:-1]), s, ctx)
        if with_loss:
            if out.shape[1:3] != label.shape[1:3]:
                out = F.resize_bilinear(out, label.shape[1:3])
            return criterion(out, label)
        return out.astype(jnp.float32).mean()

    print("| batch | stage | ms (cum) | delta ms |")
    print("|---|---|---|---|")
    for batch in batches:
        rng = np.random.RandomState(0)
        data = {"image": jnp.asarray(rng.rand(batch, *RES, 3), jnp.float32),
                "label": jnp.asarray(rng.randint(0, 19, (batch, *RES)),
                                     jnp.int32)}
        stages = ([("backbone", 0, False), ("+mapper", 1, False)]
                  + [(f"+level{j}", j + 2, False)
                     for j in range(dec.levels - 1)]
                  + [(f"+level{dec.levels - 1}+out", dec.levels + 1, False),
                     ("+resize+CE (full)", dec.levels + 1, True)])
        prev = 0.0
        for name, k, with_loss in stages:
            def fn(st, b, i, k=k, with_loss=with_loss):
                def loss_fn(tr):
                    return truncated(tr, b["image"].astype(jnp.bfloat16), i,
                                     k, with_loss, b["label"])
                loss, grads = jax.value_and_grad(loss_fn)(st["params"])
                gsum = sum(jnp.sum(jnp.abs(g)).astype(jnp.float32)
                           for g in jax.tree.leaves(grads))
                return st, loss.astype(jnp.float32) + 0.0 * gsum
            try:
                ms = timed_steps(fn, {"params": trainable}, data, iters=30)
            except Exception as e:
                print(f"| {batch} | {name} | ERR {type(e).__name__}: "
                      f"{str(e)[:90]} | - |", flush=True)
                continue
            print(f"| {batch} | {name} | {ms:.1f} | {ms - prev:.1f} |",
                  flush=True)
            prev = ms


if __name__ == "__main__":
    main()
