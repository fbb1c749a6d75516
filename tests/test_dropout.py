"""Decoder out_fc dropout (reference hyperseg_v1_0.py:166-171: out_fc =
MetaSequential(Dropout2d(dropout, True), HyperPatchConv2d(...)))."""

import numpy as np
import jax
import jax.numpy as jnp

from hyperseg_tpu.nn import functional as F


def test_dropout2d_semantics():
    """Whole channels are zeroed per sample; survivors scaled by 1/keep."""
    x = jnp.ones((4, 8, 8, 32))
    y = np.asarray(F.dropout2d(x, 0.5, jax.random.PRNGKey(0)))
    # each (sample, channel) plane is constant: all 0 or all 2.0
    planes = y.transpose(0, 3, 1, 2).reshape(4 * 32, -1)
    assert set(np.unique(planes)) <= {0.0, 2.0}
    assert all(len(np.unique(p)) == 1 for p in planes)
    frac = (planes[:, 0] == 0).mean()
    assert 0.3 < frac < 0.7
    # identity in eval (no rng) and with p=None
    assert F.dropout2d(x, 0.5, None) is x
    assert F.dropout2d(x, None, jax.random.PRNGKey(0)) is x


def _tiny_model(dropout):
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    return V1.hyperseg_efficientnet(
        "efficientnet-b0", levels=2, kernel_sizes=[1, 1, 1, 3, 3],
        level_channels=[8, 8, 8, 8, 8], expand_ratio=2,
        weight_groups=4, num_classes=3,
        with_out_fc=True, decoder_dropout=dropout)


def test_out_fc_dropout_train_only():
    model = _tiny_model(0.5)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)

    # eval: deterministic, dropout inactive
    y1 = model(params, x)
    y2 = model(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    # train: different rngs give different outputs (dropout active)
    ta, _ = model.apply_train(params, x, jax.random.PRNGKey(1))
    tb, _ = model.apply_train(params, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(ta), np.asarray(tb))


def test_out_fc_param_prefix_shift():
    """With dropout the out_fc conv sits at index 1 of the reference
    MetaSequential (dropout is module 0), without it at index 0."""
    with_d = _tiny_model(0.5)
    without = _tiny_model(None)
    pd = with_d.init(jax.random.PRNGKey(0))
    pn = without.init(jax.random.PRNGKey(0))
    assert any(".out_fc.1." in k for k in pd)
    assert any(".out_fc.0." in k for k in pn)
