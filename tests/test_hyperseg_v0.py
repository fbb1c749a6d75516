"""End-to-end logits parity for hyperseg_v0_1 (VOC HyperSeg-L) and v0_2."""

import copy

import numpy as np
import jax.numpy as jnp

from hyperseg_tpu.core.torch_import import convert_state_dict
from hyperseg_tpu.models import hyperseg_v0_1 as M01
from hyperseg_tpu.models import hyperseg_v0_2 as M02


VOC_L_KW = dict(levels=3, kernel_sizes=(1, 1, 3, 3, 3, 3), expand_ratio=2,
                with_out_fc=False, decoder_dropout=None, weight_groups=16,
                num_classes=21)


def test_logits_parity_v0_1_voc_l(reference, torch):
    from hyperseg.models.hyperseg_v0_1 import hyperseg_efficientnet
    torch.manual_seed(11)
    tm = hyperseg_efficientnet("efficientnet-b3", pretrained=False,
                               **copy.deepcopy(VOC_L_KW))
    tm.eval()
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        ref = tm(x).numpy()

    jm = M01.hyperseg_efficientnet("efficientnet-b3", **copy.deepcopy(VOC_L_KW))
    assert jm.decoder.param_groups == list(tm.decoder.param_groups)
    ref_ranges = list(tm.weight_mapper.out_conv._ranges)
    ref_parts = [ref_ranges[i + 1] - ref_ranges[i] for i in range(len(ref_ranges) - 1)]
    assert jm.weight_mapper.in_parts == ref_parts
    params = convert_state_dict(tm.state_dict())
    out = jm(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_logits_parity_v0_2(reference, torch):
    kw = dict(levels=2, out_feat_scale=[1.0, 0.25, 0.25, 0.25, 0.25],
              kernel_sizes=[1, 1, 1, 3, 3], level_channels=[64, 32, 16, 16, 16],
              expand_ratio=2, with_out_fc=False, decoder_dropout=None,
              weight_groups=[32, 16, 8, 16, 4], decoder_groups=1,
              num_classes=19)
    from hyperseg.models.hyperseg_v0_2 import hyperseg_efficientnet
    torch.manual_seed(13)
    tm = hyperseg_efficientnet("efficientnet-b1", pretrained=False,
                               **copy.deepcopy(kw))
    tm.eval()
    x = torch.randn(1, 3, 128, 256)
    with torch.no_grad():
        ref = tm(x).numpy()

    jm = M02.hyperseg_efficientnet("efficientnet-b1", **copy.deepcopy(kw))
    params = convert_state_dict(tm.state_dict())
    out = jm(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
