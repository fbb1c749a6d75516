"""End-to-end logits parity for hyperseg_v1_0 vs the PyTorch reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyperseg_tpu.core.torch_import import convert_state_dict
from hyperseg_tpu.models import hyperseg_v1_0 as M


HYPERSEG_M_KW = dict(
    levels=2, out_feat_scale=[1.0, 0.25, 0.25, 0.25, 0.25],
    kernel_sizes=[1, 1, 1, 3, 3], level_channels=[64, 32, 16, 16, 16],
    expand_ratio=2, with_out_fc=False, decoder_dropout=None,
    weight_groups=[32, 16, 8, 16, 4], decoder_groups=1,
    num_classes=19,
)


def build_reference_m(reference, torch, **overrides):
    import copy
    from hyperseg.models.hyperseg_v1_0 import hyperseg_efficientnet
    kw = copy.deepcopy({**HYPERSEG_M_KW, **overrides})
    torch.manual_seed(7)
    # note: the reference factory mutates list kwargs (init_signal2weights
    # pops weight_groups), so feed it its own deep copy
    tm = hyperseg_efficientnet("efficientnet-b1", pretrained=False,
                               **copy.deepcopy(kw))
    tm.eval()
    return tm, kw


def test_structure_matches(reference, torch):
    tm, kw = build_reference_m(reference, torch)
    jm = M.hyperseg_efficientnet("efficientnet-b1", **kw)
    # hyper-param accounting (quirk-sensitive)
    assert jm.decoder.param_groups == list(tm.decoder.param_groups)
    assert jm.decoder.hyper_params == int(tm.decoder.hyper_params)
    # signal routing: every level reads a prefix slice (signal-index reset)
    routes = [u.s2w for lvl in jm.decoder.level_units for u in lvl]
    ref_mods = [getattr(tm.decoder, f"level_{i}")[0] for i in range(5)]
    ref_hyper = [m[0] if hasattr(m, "_ranges") and hasattr(m, "__getitem__") else m
                 for m in ref_mods]
    for r, m_ in zip(routes, ref_hyper):
        assert r.signal_ch == int(m_.signal_channels)
        assert r.signal_index == int(m_.signal_index)
        assert r.out_ch == m_.signal2weights.out_channels
    # parameter keys match the torch state_dict exactly (minus BN counters
    # and coordinate caches)
    import jax
    jp = jm.init(jax.random.PRNGKey(0))
    want = {k for k in tm.state_dict().keys()
            if "num_batches_tracked" not in k and ".coord" not in k
            and not k.startswith("decoder.coord")}
    got = set(jp.keys())
    assert got == want, (sorted(got - want)[:8], sorted(want - got)[:8])


def test_logits_parity_hyperseg_m(reference, torch):
    tm, kw = build_reference_m(reference, torch)
    x = torch.randn(2, 3, 128, 256)
    with torch.no_grad():
        ref = tm(x).numpy()

    jm = M.hyperseg_efficientnet("efficientnet-b1", **kw)
    params = convert_state_dict(tm.state_dict())
    out = jm(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_pyramid_hflip_parity(reference, torch):
    # pyramid built as in img_utils.create_pyramid (:110-128); inlined because
    # the reference's img_utils imports torchvision, absent here
    tm, kw = build_reference_m(reference, torch, inference_hflip=True)
    x = torch.randn(1, 3, 128, 256)
    pyd = [x, torch.nn.functional.avg_pool2d(x, 3, stride=2, padding=1,
                                             count_include_pad=False)]
    with torch.no_grad():
        ref = tm(pyd).numpy()

    jm = M.hyperseg_efficientnet("efficientnet-b1", **kw)
    params = convert_state_dict(tm.state_dict())
    jpyd = [jnp.asarray(p.numpy().transpose(0, 2, 3, 1)) for p in pyd]
    out = jm.forward_pyramid(params, jpyd)
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
