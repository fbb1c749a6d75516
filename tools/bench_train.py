"""Training-step profiling for the flagship HyperSeg-M recipe.

Per-prefix on-device breakdown of make_train_step (the counterpart of
tools/bench_components.py for eval), plus img/s at several batch sizes with
the backbone rematerialization on and off. Run alone on the idle chip.

Methodology: each prefix runs inside an on-device lax.fori_loop with the
state threaded as the carry (so the optimizer/BN updates are real, nothing
is loop-hoisted) and a single scalar readback.

Usage: python tools/bench_train.py [batch ...]   (default: 8 16)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

RES = (512, 1024)
ITERS = 50


def timed_steps(step_fn, state, batch, iters=ITERS):
    """ms per call of state-carrying step_fn(state, batch, i) -> state, scalar."""
    @jax.jit
    def loop(state, batch, offset):
        def body(i, carry):
            st, acc = carry
            b = {"image": batch["image"]
                 + (i + offset).astype(batch["image"].dtype) * jnp.asarray(1e-6),
                 "label": batch["label"]}
            st, s = step_fn(st, b, i + offset)
            return st, acc + s
        return lax.fori_loop(0, iters, body, (state, jnp.float32(0)))

    # offset keeps every invocation's args unique (the tunneled platform
    # dedups identical repeated executions — tools/_bench.py docstring) and
    # float(acc) forces the readback (block_until_ready can return early).
    # The process-unique _CALL_SEQ (stride iters) guarantees two timed_steps
    # calls with identical executables never repeat an (args, offset) pair.
    from tools._bench import _CALL_SEQ
    out = loop(state, batch, jnp.int32(next(_CALL_SEQ) * iters))
    float(out[1])
    t0 = time.perf_counter()
    out = loop(state, batch, jnp.int32(next(_CALL_SEQ) * iters))
    float(out[1])
    return (time.perf_counter() - t0) / iters * 1e3


def build(remat, batch):
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    from hyperseg_tpu.train import losses as L, schedule as S, step as T
    from __graft_entry__ import HYPERSEG_M_KW

    model = V1.hyperseg_efficientnet("efficientnet-b1", backbone_remat=remat,
                                     decoder_remat=remat, **HYPERSEG_M_KW)
    params = model.init(jax.random.PRNGKey(0))
    criterion = L.BootstrappedCrossEntropyLoss(k=4096 * batch, thresh=0.3,
                                               ignore_index=255)
    optimizer = T.make_optimizer(S.poly_lr(2.5e-4, 1000))
    train_step = T.make_train_step(model, criterion, optimizer, num_classes=19,
                                   compute_dtype=jnp.bfloat16)
    state = T.init_train_state(params, optimizer)
    rng = np.random.RandomState(0)
    data = {
        "image": jnp.asarray(rng.rand(batch, *RES, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 19, (batch, *RES)), jnp.int32),
    }
    return model, criterion, optimizer, train_step, state, data


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 16]
    from hyperseg_tpu.train import step as T
    from hyperseg_tpu.nn import functional as F

    from hyperseg_tpu.ops import pallas as pallas_cfg

    print("| batch | remat | stem | component | ms/step | img/s |")
    print("|---|---|---|---|---|---|")
    for batch in batches:
        # (remat spec, STEM_TRAIN_ENABLED): the stem A/B runs at one remat
        # point to keep the sweep linear — remat=off, the measured-best
        # (round-4 pass: off 30.1 / full 27.3 / dots 27.7 img/s full step).
        # Ordered most-informative-first so a watchdog timeout still yields
        # the headline numbers.
        for remat, stem_train in ((False, False), (False, True),
                                  (True, False), ("dots", False)):
            pallas_cfg.STEM_TRAIN_ENABLED = stem_train
            model, criterion, optimizer, train_step, state, data = build(
                remat, batch)

            def fwd_only(st, b, i):
                logits, _upd = model.apply_train(
                    st["params"], b["image"].astype(jnp.bfloat16),
                    jax.random.fold_in(jax.random.PRNGKey(0), i))
                return st, logits.astype(jnp.float32).mean()

            def fwd_loss(st, b, i):
                logits, _upd = model.apply_train(
                    st["params"], b["image"].astype(jnp.bfloat16),
                    jax.random.fold_in(jax.random.PRNGKey(0), i))
                return st, criterion(logits, b["label"])

            def fwd_bwd(st, b, i):
                tr, fz = T.split_params(st["params"])

                def loss_fn(tr):
                    logits, _upd = model.apply_train(
                        {**tr, **fz}, b["image"].astype(jnp.bfloat16),
                        jax.random.fold_in(jax.random.PRNGKey(0), i))
                    return criterion(logits, b["label"])

                loss, grads = jax.value_and_grad(loss_fn)(tr)
                gsum = sum(jnp.sum(jnp.abs(g)).astype(jnp.float32)
                           for g in jax.tree.leaves(grads))
                return st, loss + 0.0 * gsum

            def full(st, b, i):
                st, m = train_step(st, b, jax.random.fold_in(
                    jax.random.PRNGKey(0), i))
                return st, m["loss"].astype(jnp.float32)

            rows = [("full step", full), ("forward", fwd_only),
                    ("fwd+loss", fwd_loss), ("fwd+bwd", fwd_bwd)]
            tag = {False: "off", True: "full"}.get(remat, remat)
            stag = "kernel" if stem_train else "xla"
            try:
                for name, fn in rows:
                    ms = timed_steps(fn, state, data)
                    print(f"| {batch} | {tag} | {stag} | {name} "
                          f"| {ms:.1f} | {batch / ms * 1e3:.1f} |", flush=True)
            except Exception as e:  # OOM at large batch without remat
                print(f"| {batch} | {tag} | {stag} | FAILED "
                      f"({type(e).__name__}) | - | - |", flush=True)
    pallas_cfg.STEM_TRAIN_ENABLED = False


if __name__ == "__main__":
    main()
