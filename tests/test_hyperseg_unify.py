"""End-to-end logits parity for hyperseg_v1_0_unify (HyperSeg-S Cityscapes)."""

import copy

import numpy as np
import jax.numpy as jnp

from hyperseg_tpu.core.torch_import import convert_state_dict
from hyperseg_tpu.models import hyperseg_v1_0_unify as M


HYPERSEG_S_KW = dict(
    levels=2, out_feat_scale=[1.0, 0.166, 0.2, 0.25, 0.4],
    kernel_sizes=[1, 1, 1, 3, 3], level_channels=[32, 16, 8, 8, 8],
    expand_ratio=2, with_out_fc=False, decoder_dropout=None,
    weight_groups=[32, 16, 8, 16, 4], decoder_groups=1, unify_level=4,
    num_classes=19,
)


def test_logits_parity_hyperseg_s(reference, torch, calibrate):
    from hyperseg.models.hyperseg_v1_0_unify import hyperseg_efficientnet
    torch.manual_seed(3)
    tm = hyperseg_efficientnet("efficientnet-b1", pretrained=False,
                               **copy.deepcopy(HYPERSEG_S_KW))
    x = torch.randn(2, 3, 192, 384)
    calibrate(tm, x)
    with torch.no_grad():
        ref = tm(x).numpy()
    assert np.std(ref) > 1e-2, "degenerate reference output" 

    jm = M.hyperseg_efficientnet("efficientnet-b1",
                                 **copy.deepcopy(HYPERSEG_S_KW))
    # structure checks: param_groups, cumulative signal routing, fused ranges
    assert jm.decoder.param_groups == list(tm.decoder.param_groups)
    for r, wb in zip(jm.decoder.weight_routes, tm.decoder.weight_blocks):
        assert r.signal_ch == int(wb.signal_channels)
        assert r.signal_index == int(wb.signal_index)
        assert r.out_ch == wb.signal2weights.out_channels
    assert jm.decoder._ranges == list(tm.decoder._ranges)

    params = convert_state_dict(tm.state_dict())
    out = jm(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
