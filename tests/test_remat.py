"""Rematerialization options must not change the math.

Remat recomputes forward activations during the backward pass, which reorders
floating-point reductions — so gradients are compared in a
relative-to-magnitude sense (observed ~3e-6), not bitwise, and training
*trajectories* are expected to drift chaotically from that noise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperseg_tpu.train import losses as L, step as T


def _grads(decoder_remat, backbone_remat, img, lbl):
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    m = V1.hyperseg_efficientnet(
        "efficientnet-b0", levels=2, kernel_sizes=[1, 3],
        level_channels=[16, 16], expand_ratio=2, weight_groups=[8, 8],
        num_classes=4, decoder_remat=decoder_remat,
        backbone_remat=backbone_remat)
    params = m.init(jax.random.PRNGKey(0))
    tr, fr = T.split_params(params)

    def loss_fn(tp):
        pp = {**tp, **fr}
        lg, _ = m.apply_train(pp, img, jax.random.PRNGKey(7))
        return L.cross_entropy_loss(lg, lbl)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(tr)
    return float(loss), grads


@pytest.mark.slow
@pytest.mark.parametrize("spec", [True, "dots"])
def test_remat_grads_match(spec):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    lbl = jnp.asarray(rng.randint(0, 4, (2, 64, 64)), jnp.int32)
    loss0, g0 = _grads(False, False, img, lbl)
    loss1, g1 = _grads(spec, spec, img, lbl)
    assert loss0 == pytest.approx(loss1, rel=1e-6)
    # near-zero gradients are pure noise at random init, so compare against
    # the per-tensor magnitude floored by a fraction of the global scale
    gscale = max(float(jnp.abs(v).max()) for v in g0.values())
    a = np.concatenate([np.asarray(g0[k]).ravel() for k in sorted(g0)])
    b = np.concatenate([np.asarray(g1[k]).ravel() for k in sorted(g1)])
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99999, cos
    for k in g0:
        d = float(jnp.abs(g0[k] - g1[k]).max())
        assert d < 1e-5 * gscale, (k, d, gscale)
