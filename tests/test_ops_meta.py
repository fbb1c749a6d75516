"""Parity tests for the dynamic-weight ops against the PyTorch reference.

Oracle: hyperseg/models/layers/meta_conv.py, meta_patch.py and the in-model
patch ops of hyperseg_v1_0.py, executed on CPU with random weights.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from hyperseg_tpu.ops import meta, patch as P


def to_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def from_nhwc(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("groups,k,pad,mode,dil", [
    (1, 1, 0, "zeros", 1), (1, 3, 1, "zeros", 1), (2, 3, 1, "reflect", 1),
    (4, 1, 0, "zeros", 1), (1, 3, 2, "zeros", 2), (2, 3, 2, "reflect", 2),
])
def test_meta_conv2d(reference, torch, groups, k, pad, mode, dil):
    from hyperseg.models.layers.meta_conv import MetaConv2d
    b, cin, cout, h, w = 3, 8, 12, 16, 16
    m = MetaConv2d(cin, cout, k, padding=pad, groups=groups, padding_mode=mode,
                   dilation=dil)
    x = torch.randn(b, cin, h, w)
    wt = torch.randn(b, m.hyper_params)
    ref = m(x, wt).numpy()

    out = meta.meta_conv2d(
        to_nhwc(x), jnp.asarray(wt.numpy()),
        out_channels=cout, kernel_size=(k, k), dilation=(dil, dil),
        padding=((pad, pad), (pad, pad)), groups=groups, padding_mode=mode)
    np.testing.assert_allclose(from_nhwc(out), ref, atol=2e-5, rtol=1e-5)


def test_meta_linear(reference, torch):
    from hyperseg.models.layers.meta_linear import MetaLinear
    m = MetaLinear(6, 10)
    x = torch.randn(4, 6)
    wt = torch.randn(4, m.hyper_params)
    ref = m(x, wt).numpy()
    out = meta.meta_linear(jnp.asarray(x.numpy()), jnp.asarray(wt.numpy()),
                           out_features=10, in_features=6)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_patch_block_roundtrip():
    x = jnp.arange(2 * 12 * 8 * 3, dtype=jnp.float32).reshape(2, 12, 8, 3)
    xp = P.block_patches(x, 3, 2)
    assert xp.shape == (2, 3, 2, 4, 4, 3)
    np.testing.assert_array_equal(np.asarray(P.unblock_patches(xp)), np.asarray(x))


def test_hyper_patch_no_padding(reference, torch):
    """Oracle: HyperPatchNoPadding.forward (hyperseg_v1_0.py:486-498) minus the
    signal2weights step (weights fed directly)."""
    from hyperseg.models.hyperseg_v1_0 import HyperPatchNoPadding
    b, cin, cout, fh, fw, ph, pw, groups = 2, 8, 6, 4, 4, 4, 4, 2
    m = HyperPatchNoPadding(cin, cout, 1, groups=groups)
    x = torch.randn(b, cin, fh * ph, fw * pw)
    wt = torch.randn(b, int(m.hyper_params), fh, fw)
    m.signal2weights = None  # feed raw weights

    ref = m(x, wt).numpy()

    xp = P.block_patches(to_nhwc(x), fh, fw)
    wflat = jnp.asarray(wt.numpy().transpose(0, 2, 3, 1))  # (B, fh, fw, P)
    out = P.patch_pointwise(xp, wflat, cout, groups=groups)
    out = P.unblock_patches(out)
    np.testing.assert_allclose(from_nhwc(out), ref, atol=2e-5, rtol=1e-5)


def test_meta_patch_conv2d(reference, torch):
    """Oracle: MetaPatchConv2d (meta_patch.py:35-57): halo unfold + MetaConv2d
    + fold, here as extract_patches_with_halo + patch_conv_valid."""
    from hyperseg.models.layers.meta_patch import MetaPatchConv2d
    b, cin, cout, fh, fw, ph, pw, k = 2, 6, 5, 2, 3, 8, 8, 3
    m = MetaPatchConv2d(cin, cout, k, padding=k // 2, padding_mode="reflect")
    x = torch.randn(b, cin, fh * ph, fw * pw)
    wt = torch.randn(b * fh * fw, int(m.hyper_params))
    # reference forward takes weight of shape (B, P, fh, fw) pre-permuted
    wt_map = wt.view(b, fh, fw, -1).permute(0, 3, 1, 2)
    ref = m(x, wt_map).numpy()

    xp = P.extract_patches_with_halo(to_nhwc(x), fh, fw, (1, 1), mode="reflect")
    wflat = jnp.asarray(wt.numpy().reshape(b, fh, fw, -1))
    out = P.patch_conv_valid(xp, wflat, cout, (k, k))
    out = P.unblock_patches(out)
    np.testing.assert_allclose(from_nhwc(out), ref, atol=2e-5, rtol=1e-5)


def test_patch_depthwise(reference, torch):
    from hyperseg.models.layers.meta_patch import MetaPatchConv2d
    b, c, fh, fw, ph, pw, k = 2, 6, 3, 2, 8, 8, 3
    m = MetaPatchConv2d(c, c, k, padding=1, groups=c, padding_mode="reflect")
    x = torch.randn(b, c, fh * ph, fw * pw)
    wt = torch.randn(b * fh * fw, int(m.hyper_params))
    wt_map = wt.view(b, fh, fw, -1).permute(0, 3, 1, 2)
    ref = m(x, wt_map).numpy()

    xp = P.extract_patches_with_halo(to_nhwc(x), fh, fw, (1, 1), mode="reflect")
    wflat = jnp.asarray(wt.numpy().reshape(b, fh, fw, -1))
    out = P.patch_depthwise_valid(xp, wflat, (k, k))
    out = P.unblock_patches(out)
    np.testing.assert_allclose(from_nhwc(out), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["reflect", "replicate"])
@pytest.mark.parametrize("b,c,fh,fw,ph,pw,k",
                         [(2, 6, 3, 2, 8, 8, 3), (1, 4, 2, 4, 8, 16, 5)])
def test_fullmap_depthwise_matches_patch_path(b, c, fh, fw, ph, pw, k, mode):
    """fullmap_depthwise is the batch-friendly formulation of halo-unfold +
    patch_depthwise_valid + fold — it must be BIT-identical (same taps, same
    summation order) whenever the unit input is a full map."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, fh * ph, fw * pw, c), jnp.float32)
    w = jnp.asarray(rng.randn(b, fh, fw, c * k * k), jnp.float32)
    pad = k // 2
    xp = P.extract_patches_with_halo(x, fh, fw, (pad, pad), mode=mode)
    want = P.unblock_patches(P.patch_depthwise_valid(xp, w, (k, k)))
    got = P.fullmap_depthwise(x, w, fh, fw, k, mode=mode)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("groups", [1, 2, 4])
@pytest.mark.parametrize("b,cin,cout,fh,fw,ph,pw",
                         [(2, 8, 12, 3, 2, 8, 8), (1, 4, 4, 2, 4, 16, 8)])
def test_fullmap_pointwise_matches_patch_path(b, cin, cout, fh, fw, ph, pw,
                                              groups):
    """fullmap_pointwise is the transpose-free formulation of block_patches +
    patch_pointwise + unblock_patches — same per-patch contraction on the
    blocked view of the full map."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, fh * ph, fw * pw, cin), jnp.float32)
    w = jnp.asarray(rng.randn(b, fh, fw, cout * cin // groups), jnp.float32)
    xp = P.block_patches(x, fh, fw)
    want = P.unblock_patches(P.patch_pointwise(xp, w, cout, groups))
    got = P.fullmap_pointwise(x, w, fh, fw, cout, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("train", [False, True])
@pytest.mark.parametrize("cin,cout,mode", [(10, 10, "reflect"),
                                           (8, 12, "replicate")])
def test_invres_fullmap_matches_patch_path(train, cin, cout, mode,
                                           monkeypatch):
    """The full-map InvRes formulation (expand on the un-halo'd map + halo
    band einsums + interleaved blocked depthwise, with bn1 over the map+bands
    multiset) must match the halo-gather oracle path in BOTH modes — in train,
    outputs AND the recorded BN running-stat updates."""
    from hyperseg_tpu.models.decoder import InvResUnit
    from hyperseg_tpu.nn import functional as F

    b, hid, fh, fw, ph, pw, k = 2, 20, 3, 2, 8, 16, 3
    unit = InvResUnit(prefix="u", in_ch=cin, out_ch=cout, hidden=hid,
                      kernel=k, padding_mode=mode)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, fh * ph, fw * pw, cin), jnp.float32)
    w = jnp.asarray(rng.randn(b, fh, fw, unit.hyper_params) * 0.1, jnp.float32)
    params = {}
    for i, ch in [(1, hid), (2, hid), (3, cout)]:
        params[f"u.bn{i}.weight"] = jnp.asarray(0.5 + rng.rand(ch), jnp.float32)
        params[f"u.bn{i}.bias"] = jnp.asarray(rng.randn(ch), jnp.float32)
        params[f"u.bn{i}.running_mean"] = jnp.asarray(rng.randn(ch) * 0.1,
                                                      jnp.float32)
        params[f"u.bn{i}.running_var"] = jnp.asarray(0.5 + rng.rand(ch),
                                                     jnp.float32)

    def run(fullmap):
        monkeypatch.setattr(P, "FULLMAP_INVRES", fullmap)
        ctx = F.Ctx(train=True) if train else None
        out = unit.apply(params, x, w, ctx)
        return np.asarray(out), (ctx.updates if ctx else {})

    want, want_upd = run(False)
    got, got_upd = run(True)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
    assert set(got_upd) == set(want_upd)
    for key in want_upd:
        np.testing.assert_allclose(np.asarray(got_upd[key]),
                                   np.asarray(want_upd[key]),
                                   atol=1e-5, rtol=1e-5)


def test_invres_fullmap_gradients_match_patch_path(monkeypatch):
    """FULLMAP_INVRES dispatches inside the jitted TRAINING step, so its
    gradients (w.r.t. the input map, the hyper-weights, and the BN affines)
    must match the halo-gather oracle path, not just its outputs."""
    import jax
    from hyperseg_tpu.models.decoder import InvResUnit
    from hyperseg_tpu.nn import functional as F

    b, cin, cout, hid, fh, fw, ph, pw, k = 2, 10, 10, 20, 3, 2, 8, 16, 3
    unit = InvResUnit(prefix="u", in_ch=cin, out_ch=cout, hidden=hid,
                      kernel=k, padding_mode="reflect")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, fh * ph, fw * pw, cin), jnp.float32)
    w = jnp.asarray(rng.randn(b, fh, fw, unit.hyper_params) * 0.1, jnp.float32)
    params = {}
    for i, ch in [(1, hid), (2, hid), (3, cout)]:
        params[f"u.bn{i}.weight"] = jnp.asarray(0.5 + rng.rand(ch), jnp.float32)
        params[f"u.bn{i}.bias"] = jnp.asarray(rng.randn(ch), jnp.float32)
        params[f"u.bn{i}.running_mean"] = jnp.zeros(ch, jnp.float32)
        params[f"u.bn{i}.running_var"] = jnp.ones(ch, jnp.float32)
    cot = jnp.asarray(rng.randn(b, fh * ph, fw * pw, cout), jnp.float32)

    def loss(xx, ww, pp):
        y = unit.apply(pp, xx, ww, F.Ctx(train=True))
        return jnp.sum(y * cot)

    def grads(fullmap):
        monkeypatch.setattr(P, "FULLMAP_INVRES", fullmap)
        return jax.grad(loss, argnums=(0, 1, 2))(x, w, params)

    want, got = grads(False), grads(True)
    names = ["d_x", "d_w"] + [f"d_{k}" for k in sorted(params)]
    flat_w = list(want[:2]) + [want[2][k] for k in sorted(params)]
    flat_g = list(got[:2]) + [got[2][k] for k in sorted(params)]
    for name, a, bb in zip(names, flat_w, flat_g):
        scale = max(float(np.abs(np.asarray(a)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(bb) / scale,
                                   np.asarray(a) / scale,
                                   atol=5e-5, err_msg=name)


def test_meta_patch_conv2d_wrapper(reference, torch):
    from hyperseg.models.layers.meta_patch import MetaPatchConv2d
    b, cin, cout, fh, fw, ph, pw, k = 1, 6, 5, 2, 2, 8, 8, 3
    m = MetaPatchConv2d(cin, cout, k, padding=1, padding_mode="reflect")
    x = torch.randn(b, cin, fh * ph, fw * pw)
    wt = torch.randn(b * fh * fw, int(m.hyper_params))
    ref = m(x, wt.view(b, fh, fw, -1).permute(0, 3, 1, 2)).numpy()
    out = meta.meta_patch_conv2d(
        to_nhwc(x), jnp.asarray(wt.numpy().reshape(b, fh, fw, -1)),
        out_channels=cout, kernel_size=k)
    np.testing.assert_allclose(from_nhwc(out), ref, atol=2e-5, rtol=1e-5)


def test_meta_sequential_routing():
    import types

    calls = []

    def make_child(hp, tag):
        def fn(x, w=None):
            calls.append((tag, None if w is None else w.shape[-1]))
            return x
        obj = types.SimpleNamespace(hyper_params=hp)
        wrapped = lambda x, w=None, f=fn: f(x, w)
        wrapped.hyper_params = hp
        return wrapped

    plain = lambda x: x
    seq = meta.MetaSequential(make_child(4, "a"), plain, make_child(6, "b"))
    assert seq.hyper_params == 10
    import numpy as _np
    x = jnp.zeros((1, 2))
    w = jnp.zeros((1, 8))  # fewer channels than hyper_params: clamped slices
    seq(x, w)
    assert calls == [("a", 4), ("b", 4)]  # second slice clamped to 8-4=4


@pytest.mark.parametrize("mode", ["reflect", "replicate", "constant"])
@pytest.mark.parametrize("b,c,fh,fw,ph,pw,pt,pl",
                         [(2, 5, 4, 6, 8, 8, 1, 1), (1, 3, 2, 4, 8, 16, 2, 2),
                          (2, 4, 3, 5, 8, 8, 0, 0), (1, 6, 8, 2, 8, 16, 1, 2)])
def test_halo_slice_vjp_matches_scatter_vjp(b, c, fh, fw, ph, pw, pt, pl,
                                            mode):
    """The slice-based custom VJP of the halo gather (overlap-add transpose,
    no scatter) must be BIT-identical to XLA's native gather transpose —
    forward and cotangent — at every pad/mode combination the decoder uses."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, fh * ph, fw * pw, c), jnp.float32)
    ct = jnp.asarray(
        rng.randn(b, fh, fw, ph + 2 * pt, pw + 2 * pl, c), jnp.float32)

    def run(flag):
        old = P.HALO_SLICE_VJP
        P.HALO_SLICE_VJP = flag
        try:
            y, vjp = jax.vjp(
                lambda t: P.extract_patches_with_halo(
                    t, fh, fw, (pt, pl), mode=mode), x)
            return np.asarray(y), np.asarray(vjp(ct)[0])
        finally:
            P.HALO_SLICE_VJP = old

    y_ref, g_ref = run(False)
    y_new, g_new = run(True)
    np.testing.assert_array_equal(y_new, y_ref)
    np.testing.assert_array_equal(g_new, g_ref)
