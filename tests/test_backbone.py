"""EfficientNet backbone parity vs the PyTorch reference (random weights)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyperseg_tpu.core.torch_import import convert_state_dict
from hyperseg_tpu.models.backbones.efficientnet import EfficientNet


@pytest.mark.parametrize("name,out_feat_scale,res", [
    ("efficientnet-b1", [1.0, 0.25, 0.25, 0.25, 0.25], (192, 256)),
    ("efficientnet-b1", 0.25, (224, 224)),
    ("efficientnet-b3", 0.25, (192, 192)),
])
def test_backbone_features_parity(reference, torch, calibrate, name, out_feat_scale, res):
    from hyperseg.models.backbones.efficientnet import EfficientNet as TorchEffNet

    tm = TorchEffNet.from_name(name, out_feat_scale=out_feat_scale, head=None,
                               return_features=True)
    x = torch.randn(2, 3, *res)
    calibrate(tm, x)
    with torch.no_grad():
        ref_feats = tm(x)

    jm = EfficientNet(name, out_feat_scale=out_feat_scale, head=None,
                      return_features=True)
    assert jm.feat_channels == list(tm.feat_channels), (
        jm.feat_channels, tm.feat_channels)
    params = convert_state_dict(tm.state_dict())
    feats = jm(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))

    assert len(feats) == len(ref_feats)
    for i, (a, b) in enumerate(zip(feats, ref_feats)):
        got = np.asarray(a).transpose(0, 3, 1, 2)
        want = b.numpy()
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4,
                                   err_msg=f"feature {i}")


def test_backbone_init_shapes():
    import jax
    jm = EfficientNet("efficientnet-b0", out_feat_scale=0.25, head=None)
    params = jm.init(jax.random.PRNGKey(0))
    feats = jm(params, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape[-1] for f in feats] == jm.feat_channels
    # stride pyramid: 2, 4, 8, 16, 32, 32
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2, 2]
