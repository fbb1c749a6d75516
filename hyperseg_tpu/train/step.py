"""Training and evaluation step functions (pure, jit/SPMD-ready).

Mirrors the reference hot loop (train.py:104-146): forward, logits resized to
label resolution when needed, bootstrapped CE, Adam(beta1=0.5) with per-batch
PolyLR, per-step confusion-matrix metrics — but fully on-device: the metric
accumulator is a device array (no per-step host sync), BN running stats are
functional state updates, and under a sharded jit the gradient/metric
reductions ride ICI automatically.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from hyperseg_tpu.nn import functional as F
from hyperseg_tpu.train import metrics as M

STATE_SUFFIXES = (".running_mean", ".running_var")


def is_trainable(key: str) -> bool:
    return not key.endswith(STATE_SUFFIXES)


def split_params(params):
    train = {k: v for k, v in params.items() if is_trainable(k)}
    state = {k: v for k, v in params.items() if not is_trainable(k)}
    return train, state


def make_optimizer(schedule, *, beta1=0.5, beta2=0.999, eps=1e-8):
    """Adam with the reference's beta1=0.5 (all shipped configs,
    e.g. configs/train/cityscapes_efficientnet_b1_hyperseg-m.py:31)."""
    return optax.adam(learning_rate=schedule, b1=beta1, b2=beta2, eps=eps)


def init_train_state(params, optimizer):
    trainable, _ = split_params(params)
    return {
        "params": params,
        "opt_state": optimizer.init(trainable),
        "step": jnp.zeros((), jnp.int32),
    }


def make_train_step(model, criterion, optimizer, *, num_classes: int,
                    ignore_index: int = 255, compute_dtype=jnp.float32):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {'image': (B,H,W,3), 'label': (B,h,w) int32}. metrics: {'loss',
    'confmat'} — accumulate confmat across steps and derive scores on host.
    """

    def train_step(state, batch, rng):
        params = state["params"]
        trainable, frozen = split_params(params)
        image = batch["image"].astype(compute_dtype)
        label = batch["label"]

        def loss_fn(trainable):
            p = {**trainable, **frozen}
            logits, updates = model.apply_train(p, image, rng)
            if logits.shape[1:3] != label.shape[1:3]:
                logits = F.resize_bilinear(logits, label.shape[1:3])
            loss = criterion(logits, label)
            return loss, (logits, updates)

        (loss, (logits, bn_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        opt_updates, new_opt_state = optimizer.update(grads, state["opt_state"],
                                                      trainable)
        new_trainable = optax.apply_updates(trainable, opt_updates)
        new_params = {**frozen, **new_trainable}
        for k, v in bn_updates.items():
            new_params[k] = v

        preds = jnp.argmax(logits, axis=-1)
        confmat = M.confusion_matrix(label, preds, num_classes,
                                     ignore_index=ignore_index)
        new_state = {
            "params": new_params,
            "opt_state": new_opt_state,
            "step": state["step"] + 1,
        }
        return new_state, {"loss": loss, "confmat": confmat}

    return train_step


def make_eval_step(model, *, num_classes: int, ignore_index: int = 255,
                   compute_dtype=jnp.float32):
    """Returns eval_step(params, batch) -> {'confmat', 'preds'} mirroring the
    test.py hot loop (logits upsampled to label resolution before argmax,
    test.py:165-175)."""

    def eval_step(params, batch):
        image = batch["image"].astype(compute_dtype)
        label = batch["label"]
        logits = model(params, image)
        if logits.shape[1:3] != label.shape[1:3]:
            logits = F.resize_bilinear(logits, label.shape[1:3])
        preds = jnp.argmax(logits, axis=-1)
        confmat = M.confusion_matrix(label, preds, num_classes,
                                     ignore_index=ignore_index)
        return {"confmat": confmat, "preds": preds}

    return eval_step
