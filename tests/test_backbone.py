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


def test_load_pretrained_backbone(reference, torch, tmp_path):
    """load_fc=False partial-match semantics: backbone tensors with matching
    shapes load; feature compressors / heads absent from ImageNet checkpoints
    stay initialized."""
    import jax
    from hyperseg_tpu.models.backbones.efficientnet import load_pretrained_backbone
    from hyperseg_tpu.models import hyperseg_v1_0 as M

    # fabricate an "ImageNet" checkpoint: a plain reference b0 classifier
    from hyperseg.models.backbones.efficientnet import EfficientNet as TorchEffNet
    tm = TorchEffNet.from_name("efficientnet-b0", out_feat_scale=None,
                               head=None, return_features=False)
    path = tmp_path / "effnet_b0.pth"
    torch.save(tm.state_dict(), str(path))

    jm = M.hyperseg_efficientnet(
        "efficientnet-b0", levels=2, kernel_sizes=[1, 3],
        level_channels=[16, 16], expand_ratio=2, weight_groups=[8, 8],
        num_classes=4)
    params = jm.init(jax.random.PRNGKey(0))
    loaded, n = load_pretrained_backbone(params, str(path))
    assert n > 100  # stem + blocks + head conv/BNs matched
    w = np.asarray(loaded["backbone._conv_stem.weight"])
    want = tm.state_dict()["_conv_stem.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(w, want, atol=1e-6)
    # decoder params untouched
    k = "decoder.level_0.0.0.signal2weights.weight"
    np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(params[k]))


@pytest.mark.parametrize("name,expected_levels", [
    ("efficientnet-c0", 6),  # extra stride stage, 1920-ch head
    ("efficientnet-s0", 5),  # first stage already stride 2
])
def test_custom_variants_smoke(name, expected_levels):
    """The reference defines c*/s* block tables (efficientnet_utils.py:579-600)
    but its from_name validator rejects the names (efficientnet.py:473-479),
    making them unreachable there; here they build and run."""
    import jax
    jm = EfficientNet(name, out_feat_scale=0.25, head=None)
    assert len(jm.feat_channels) == expected_levels + 1
    params = jm.init(jax.random.PRNGKey(0))
    feats = jm(params, jnp.zeros((1, 128, 128, 3)))
    assert [f.shape[-1] for f in feats] == jm.feat_channels
