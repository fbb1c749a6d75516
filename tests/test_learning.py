"""Learning smoke test: the full train step must actually fit data.

Overfits a tiny model on one synthetic image; train mIoU must approach 1.
Catches sign errors in gradients, BN-state mixups, schedule bugs — the class
of failure that shape tests cannot see."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperseg_tpu.train import losses as L, metrics as M, schedule as S, step as T


@pytest.mark.slow
def test_overfit_single_image():
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    model = V1.hyperseg_efficientnet(
        "efficientnet-b0", levels=2, kernel_sizes=[1, 3],
        level_channels=[16, 16], expand_ratio=2, weight_groups=[8, 8],
        num_classes=4)
    params = model.init(jax.random.PRNGKey(0))

    # batch of 2 DISTINCT images: train-mode BN at the weight mapper's 1x1
    # bottleneck needs >1 distinct value per channel (torch raises on batch 1
    # there; identical duplicates are equally degenerate)
    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    lbl = np.zeros((2, 64, 64), np.int32)
    lbl[0, :32, :32] = 1
    lbl[0, 32:, :32] = 2
    lbl[0, :, 32:] = 3
    lbl[1, :, :] = 1
    lbl[1, 16:48, 16:48] = 0
    batch = {"image": jnp.asarray(img), "label": jnp.asarray(lbl)}

    optimizer = T.make_optimizer(S.constant_lr(5e-3))
    criterion = L.cross_entropy_loss
    train_step = jax.jit(T.make_train_step(model, criterion, optimizer,
                                           num_classes=4))
    state = T.init_train_state(params, optimizer)
    first_loss = None
    for i in range(150):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    scores = M.scores_from_confmat(np.asarray(metrics["confmat"]))
    assert last_loss < first_loss * 0.5, (first_loss, last_loss)
    assert scores["mean_iou"] > 0.7, scores
