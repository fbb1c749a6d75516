"""Pallas kernels vs the lax oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperseg_tpu.ops import patch as P
from hyperseg_tpu.ops.pallas.patch_invres import patch_inverted_residual_fused
from hyperseg_tpu.nn import functional as F


@pytest.mark.parametrize("b,fh,fw,ph,pw,cin,hidden,out", [
    (2, 4, 4, 8, 8, 24, 48, 16),
    (1, 2, 3, 16, 16, 34, 68, 19),
    (1, 2, 2, 8, 8, 16, 32, 16),   # residual path (cin == out)
    (1, 2, 8, 8, 8, 16, 32, 16),   # lane_pack g=4 (residual, M-level-like)
    (2, 2, 8, 8, 8, 8, 16, 8),     # lane_pack g=8
])
def test_invres_fused_matches_oracle(b, fh, fw, ph, pw, cin, hidden, out):
    rng = np.random.RandomState(0)
    H, W = fh * ph, fw * pw
    x = jnp.asarray(rng.randn(b, H, W, cin), jnp.float32)
    P_total = cin * hidden + hidden * 9 + hidden * out
    w = jnp.asarray(rng.randn(b, fh, fw, P_total) * 0.1, jnp.float32)
    bns = []
    for c in (hidden, hidden, out):
        bns.append((jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
                    jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                    jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                    jnp.asarray(rng.rand(c) + 0.5, jnp.float32)))

    # oracle: lax patch ops, exactly as InvResUnit.apply
    xp = P.extract_patches_with_halo(x, fh, fw, (1, 1), mode="reflect")
    r1, r2 = cin * hidden, cin * hidden + hidden * 9
    h = P.patch_pointwise(xp, w[..., :r1], hidden)
    h = jnp.clip(F.batch_norm(h, *bns[0]), 0, 6)
    h = P.patch_depthwise_valid(h, w[..., r1:r2], (3, 3))
    h = jnp.clip(F.batch_norm(h, *bns[1]), 0, 6)
    h = P.patch_pointwise(h, w[..., r2:], out)
    h = F.batch_norm(h, *bns[2])
    want = P.unblock_patches(h)
    if cin == out:
        want = want + x

    # the default path (lane-packed where the chunk divides) vs the oracle;
    # kernel computes matmuls in bf16 inputs/fp32 accum, tolerance accordingly
    got_default = patch_inverted_residual_fused(
        x, w, hidden=hidden, out_ch=out, kernel=3,
        bn1=bns[0], bn2=bns[1], bn3=bns[2], interpret=True)
    # the BASE (unpacked) kernel is the anchor for the bit-level variant
    # checks below — the packed path regroups accumulations, so it matches
    # to fp noise, not bitwise
    got = patch_inverted_residual_fused(
        x, w, hidden=hidden, out_ch=out, kernel=3,
        bn1=bns[0], bn2=bns[1], bn3=bns[2], lane_pack=1, interpret=True)
    for arr in (got_default, got):
        np.testing.assert_allclose(np.asarray(arr), np.asarray(want),
                                   atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(got_default), np.asarray(got),
                               atol=1e-5, rtol=1e-5)
    # agreement in structure: correlation ~ 1
    g, w_ = np.asarray(got).ravel(), np.asarray(want).ravel()
    assert np.corrcoef(g, w_)[0, 1] > 0.999

    # the rank-4 batched-dot formulation is the same arithmetic on unmerged
    # window shapes — must agree with the merged formulation to fp noise
    got4 = patch_inverted_residual_fused(
        x, w, hidden=hidden, out_ch=out, kernel=3,
        bn1=bns[0], bn2=bns[1], bn3=bns[2], rank4=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(got),
                               atol=1e-5, rtol=1e-5)
    # rank-6 out_spec variant (no in-VMEM lane-merge): same bytes exactly
    got6 = patch_inverted_residual_fused(
        x, w, hidden=hidden, out_ch=out, kernel=3,
        bn1=bns[0], bn2=bns[1], bn3=bns[2], out6d=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got6), np.asarray(got))

    # lane-packed formulation: identical arithmetic via block-diagonal
    # stage-1/3 weights (the zero off-diagonal blocks contribute exact zeros)
    if 128 % hidden == 0 and fw % (128 // hidden) == 0:
        gotp = patch_inverted_residual_fused(
            x, w, hidden=hidden, out_ch=out, kernel=3,
            bn1=bns[0], bn2=bns[1], bn3=bns[2], lane_pack=True,
            interpret=True)
        np.testing.assert_allclose(np.asarray(gotp), np.asarray(got),
                                   atol=1e-5, rtol=1e-5)
    if fw % 2 == 0:  # explicit g at arbitrary (non-tile-aligned) g*hidden
        gotp2 = patch_inverted_residual_fused(
            x, w, hidden=hidden, out_ch=out, kernel=3,
            bn1=bns[0], bn2=bns[1], bn3=bns[2], lane_pack=2,
            interpret=True)
        np.testing.assert_allclose(np.asarray(gotp2), np.asarray(got),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("b,fh,fw,ph,pw,cin,hidden,out", [
    (2, 4, 4, 8, 8, 11, 22, 11),    # residual (L-voc level-5-like ratios)
    (1, 2, 4, 16, 16, 16, 32, 14),  # non-residual, wide patches
    (1, 1, 2, 8, 16, 6, 12, 6),     # single patch row (w1u == w1d == w1)
])
def test_invres_v01_matches_oracle(b, fh, fw, ph, pw, cin, hidden, out):
    """V01 semantics (hyperseg_v0_1.py:205-237): each conv folds back to the
    full map, so depthwise halo pixels are the NEIGHBOR patches' expand
    outputs. Oracle = the three PatchConvUnit stages exactly as
    V01InvResUnit.apply's XLA path computes them."""
    from hyperseg_tpu.ops.pallas.patch_invres import (
        patch_inverted_residual_v01, v01_supported)

    rng = np.random.RandomState(2)
    H, W = fh * ph, fw * pw
    x = jnp.asarray(rng.randn(b, H, W, cin), jnp.float32)
    P_total = cin * hidden + hidden * 9 + hidden * out
    w = jnp.asarray(rng.randn(b, fh, fw, P_total) * 0.1, jnp.float32)
    bns = []
    for c in (hidden, hidden, out):
        bns.append((jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
                    jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                    jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                    jnp.asarray(rng.rand(c) + 0.5, jnp.float32)))
    assert v01_supported(x.shape, w.shape, 3)

    r1, r2 = cin * hidden, cin * hidden + hidden * 9
    # stage 1: per-patch 1x1 on owned pixels, fold back, full-map BN + relu6
    h = P.unblock_patches(P.patch_pointwise(
        P.block_patches(x, fh, fw), w[..., :r1], hidden))
    h = jnp.clip(F.batch_norm(h, *bns[0]), 0, 6)
    # stage 2: depthwise with halo from the reassembled hidden MAP (neighbor
    # pixels carry neighbor weights' outputs)
    hp = P.extract_patches_with_halo(h, fh, fw, (1, 1), mode="reflect")
    h = P.unblock_patches(P.patch_depthwise_valid(hp, w[..., r1:r2], (3, 3)))
    h = jnp.clip(F.batch_norm(h, *bns[1]), 0, 6)
    # stage 3: per-patch 1x1 project, full-map BN, residual
    h = P.unblock_patches(P.patch_pointwise(
        P.block_patches(h, fh, fw), w[..., r2:], out))
    want = F.batch_norm(h, *bns[2])
    if cin == out:
        want = want + x

    got = patch_inverted_residual_v01(
        x, w, hidden=hidden, out_ch=out, kernel=3,
        bn1=bns[0], bn2=bns[1], bn3=bns[2], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)
    g, w_ = np.asarray(got).ravel(), np.asarray(want).ravel()
    assert np.corrcoef(g, w_)[0, 1] > 0.999


@pytest.mark.parametrize("b,fh,fw,ph,pw,cin,hidden,out,sig,padded", [
    (2, 4, 4, 8, 8, 24, 48, 16, 96, 0),
    (1, 2, 3, 16, 16, 34, 68, 19, 128, 7),  # dense wider than P (group pad)
    (1, 2, 2, 8, 8, 16, 32, 16, 64, 0),     # residual path (cin == out)
])
def test_invres_s2w_fused_matches_oracle(b, fh, fw, ph, pw, cin, hidden, out,
                                         sig, padded):
    """The fully fused form (weights GENERATED in VMEM from the routed signal
    slice) vs generate-then-consume: w = s @ dense[:, :P] followed by the
    plain fused kernel. The generated (B, fh, fw, P) tensor never exists on
    the fused path (hyperseg_v1_0.py:321-326 feeding :328-370)."""
    from hyperseg_tpu.ops.pallas.patch_invres import (
        patch_inverted_residual_s2w_fused)

    rng = np.random.RandomState(1)
    H, W = fh * ph, fw * pw
    x = jnp.asarray(rng.randn(b, H, W, cin), jnp.float32)
    P_total = cin * hidden + hidden * 9 + hidden * out
    s = jnp.asarray(rng.randn(b, fh, fw, sig) * 0.3, jnp.float32)
    dense = jnp.asarray(rng.randn(sig, P_total + padded) * 0.05, jnp.float32)
    bns = []
    for c in (hidden, hidden, out):
        bns.append((jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
                    jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                    jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                    jnp.asarray(rng.rand(c) + 0.5, jnp.float32)))

    w = jnp.einsum("bfgs,sp->bfgp", s, dense[:, :P_total])
    want = patch_inverted_residual_fused(
        x, w, hidden=hidden, out_ch=out, kernel=3,
        bn1=bns[0], bn2=bns[1], bn3=bns[2], interpret=True)

    got = patch_inverted_residual_s2w_fused(
        x, s, dense, hidden=hidden, out_ch=out, kernel=3,
        bn1=bns[0], bn2=bns[1], bn3=bns[2], interpret=True)
    # both paths use bf16 matmul inputs / f32 accumulation; the only
    # difference is where the generation matmul associates
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)
    g, w_ = np.asarray(got).ravel(), np.asarray(want).ravel()
    assert np.corrcoef(g, w_)[0, 1] > 0.999

    # lane-packed s2w variant (S2W_LANE_PACK is OFF by default — Mosaic
    # rejects it at most production shapes — but the formulation must stay
    # correct): same generation, block-diagonal consume dots regroup f32
    # accumulation only
    if fw % 2 == 0:
        gotp = patch_inverted_residual_s2w_fused(
            x, s, dense, hidden=hidden, out_ch=out, kernel=3,
            bn1=bns[0], bn2=bns[1], bn3=bns[2], lane_pack=2, interpret=True)
        np.testing.assert_allclose(np.asarray(gotp), np.asarray(got),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [(64, 256), (128, 768), (64, 128)])
def test_stem_kernel_parity(shape):
    """Fused stem (conv3x3/s2 + BN + swish) vs the XLA oracle, interpret
    mode. Covers the supported() gate and both supported benchmark-like
    shapes and one where W//2 is not a 128-multiple (fallback expected)."""
    from hyperseg_tpu.nn import functional as F
    from hyperseg_tpu.ops.pallas import stem as S

    H, W = shape
    if not S.supported(H, W, 3):
        assert (W // 2) % 128 != 0  # only reason these shapes can fall back
        return
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, W, 3), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, 3, 32) * 0.1, jnp.float32)
    s = jnp.asarray(rng.rand(32) + 0.5)
    b = jnp.asarray(rng.randn(32) * 0.1)
    m = jnp.asarray(rng.randn(32) * 0.1)
    v = jnp.asarray(rng.rand(32) + 0.5)

    pad = F.same_padding_2d((H, W), (3, 3), (2, 2))
    ref = F.conv2d(x, wt, stride=(2, 2), padding=pad)
    ref = (ref - m) * jax.lax.rsqrt(v + 1e-3) * s + b
    ref = ref * jax.nn.sigmoid(ref)
    got = S.stem_conv_bn_swish(x, wt, s, b, m, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # the band-rows grid parameter (MXU M-tile sizing lever) is layout-only
    got64 = S.stem_conv_bn_swish(x, wt, s, b, m, v, band_rows=64,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got64), np.asarray(got), atol=1e-6)
    # lane-permutation gather de-interleave must be the same map exactly
    got_g = S.stem_conv_bn_swish(x, wt, s, b, m, v, gather=True,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(got), atol=1e-6)
    # and in the channel-planar layout the fused MBConv chain consumes
    got_p = S.stem_conv_bn_swish(x, wt, s, b, m, v, gather=True, planar=True,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got_p),
                               np.moveaxis(np.asarray(got), -1, 1), atol=1e-6)

    # differentiable stem_conv (training dispatch): value AND grads must
    # match the XLA conv it replaces
    def loss_k(xx, ww):
        return jnp.sum(S.stem_conv(xx, ww, True) ** 2)

    def loss_x(xx, ww):
        return jnp.sum(F.conv2d(xx, ww, stride=(2, 2),
                                padding=((0, 1), (0, 1))) ** 2)

    (vk, (gxk, gwk)) = jax.value_and_grad(loss_k, argnums=(0, 1))(x, wt)
    (vx, (gxx, gwx)) = jax.value_and_grad(loss_x, argnums=(0, 1))(x, wt)
    np.testing.assert_allclose(float(vk), float(vx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gxk), np.asarray(gxx),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gwk), np.asarray(gwx),
                               atol=1e-4, rtol=1e-5)


def test_mbconv_fused_phases_parity():
    """Planar dw_phase + project_phase vs the NHWC XLA oracle (the _block
    semantics they replace), interpret mode; covers residual and both output
    layouts."""
    from jax import lax
    from hyperseg_tpu.nn import functional as F
    from hyperseg_tpu.ops.pallas import mbconv as MB

    rng = np.random.RandomState(0)
    B, C, CO, H, W = 2, 32, 16, 64, 128
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    wdw = jnp.asarray(rng.randn(3, 3, 1, C) * 0.2, jnp.float32)
    wproj = jnp.asarray(rng.randn(1, 1, C, CO) * 0.2, jnp.float32)
    wred = jnp.asarray(rng.randn(1, 1, C, 8) * 0.2, jnp.float32)
    bred = jnp.asarray(rng.randn(8) * 0.1)
    wexp = jnp.asarray(rng.randn(1, 1, 8, C) * 0.2, jnp.float32)
    bexp = jnp.asarray(rng.randn(C) * 0.1)
    bn1 = [jnp.asarray(rng.rand(C) + 0.5), jnp.asarray(rng.randn(C) * 0.1),
           jnp.asarray(rng.randn(C) * 0.1), jnp.asarray(rng.rand(C) + 0.5)]
    bn2 = [jnp.asarray(rng.rand(CO) + 0.5), jnp.asarray(rng.randn(CO) * 0.1),
           jnp.asarray(rng.randn(CO) * 0.1), jnp.asarray(rng.rand(CO) + 0.5)]

    def oracle(xx):
        y = lax.conv_general_dilated(
            xx, wdw, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
        y = F.swish(F.batch_norm(y, *bn1, eps=1e-3))
        se = jnp.mean(y, axis=(1, 2), keepdims=True)
        se = F.swish(lax.conv_general_dilated(
            se, wred, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bred)
        se = lax.conv_general_dilated(
            se, wexp, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bexp
        y = jax.nn.sigmoid(se) * y
        y = lax.conv_general_dilated(
            y, wproj, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return F.batch_norm(y, *bn2, eps=1e-3)

    ref = np.asarray(oracle(x))
    xp = jnp.transpose(x, (0, 3, 1, 2))
    h = MB.dw_phase(xp, wdw, *bn1, interpret=True)
    pooled = jnp.mean(h.astype(jnp.float32), axis=(2, 3))
    se = F.swish(pooled @ wred[0, 0] + bred)
    se = jax.nn.sigmoid(se @ wexp[0, 0] + bexp)
    out = MB.project_phase(h, se, wproj, *bn2, nhwc=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    # planar output consistency + residual path (C == CO)
    wproj2 = jnp.asarray(rng.randn(1, 1, C, C) * 0.2, jnp.float32)
    bn3 = [jnp.asarray(rng.rand(C) + 0.5), jnp.asarray(rng.randn(C) * 0.1),
           jnp.asarray(rng.randn(C) * 0.1), jnp.asarray(rng.rand(C) + 0.5)]
    o_pl = MB.project_phase(h, se, wproj2, *bn3, residual=xp, nhwc=False,
                            interpret=True)
    o_nh = MB.project_phase(h, se, wproj2, *bn3, residual=xp, nhwc=True,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.transpose(o_pl, (0, 2, 3, 1))),
                               np.asarray(o_nh), atol=1e-6)
    ref_res = np.asarray(o_nh)
    base = oracle  # reuse weights except project
    def oracle_res(xx):
        y = lax.conv_general_dilated(
            xx, wdw, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
        y = F.swish(F.batch_norm(y, *bn1, eps=1e-3))
        y = se[:, None, None, :] * y
        y = lax.conv_general_dilated(
            y, wproj2, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return F.batch_norm(y, *bn3, eps=1e-3) + xx
    np.testing.assert_allclose(ref_res, np.asarray(oracle_res(x)), atol=2e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_expand_dw_phase_parity(stride):
    """expand 1x1 + bn0 + swish + dw3x3 (stride 1/2, TF-SAME) + bn1 + swish
    vs the XLA oracle, interpret mode. The kernel is correct but currently
    undispatched (measured slower end to end than XLA for expand blocks —
    see EfficientNet._fusable_prefix)."""
    from jax import lax
    from hyperseg_tpu.nn import functional as F
    from hyperseg_tpu.ops.pallas import mbconv as MB

    rng = np.random.RandomState(0)
    B, CIN, CMID, H, W = 2, 16, 96, 64, 128
    x = jnp.asarray(rng.rand(B, H, W, CIN).astype(np.float32))
    wexp = jnp.asarray(rng.randn(1, 1, CIN, CMID) * 0.2, jnp.float32)
    wdw = jnp.asarray(rng.randn(3, 3, 1, CMID) * 0.2, jnp.float32)
    bn0 = [jnp.asarray(rng.rand(CMID) + 0.5), jnp.asarray(rng.randn(CMID) * 0.1),
           jnp.asarray(rng.randn(CMID) * 0.1), jnp.asarray(rng.rand(CMID) + 0.5)]
    bn1 = [jnp.asarray(rng.rand(CMID) + 0.5), jnp.asarray(rng.randn(CMID) * 0.1),
           jnp.asarray(rng.randn(CMID) * 0.1), jnp.asarray(rng.rand(CMID) + 0.5)]
    pad = [(1, 1), (1, 1)] if stride == 1 else [(0, 1), (0, 1)]

    def oracle(xx):
        y = lax.conv_general_dilated(
            xx, wexp, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = F.swish(F.batch_norm(y, *bn0, eps=1e-3))
        y = lax.conv_general_dilated(
            y, wdw, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=CMID)
        return F.swish(F.batch_norm(y, *bn1, eps=1e-3))

    ref = np.asarray(oracle(x))
    got = np.asarray(jnp.transpose(MB.expand_dw_phase(
        jnp.transpose(x, (0, 3, 1, 2)), wexp, bn0, wdw, bn1,
        stride=stride, interpret=True), (0, 2, 3, 1)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("shape,scale", [
    ((1, 16, 32, 19), 2),    # HyperSeg-M-like: 19ch, WC=608 not 128-mult -> gate
    ((1, 16, 32, 8), 2),     # WC=256 supported
    ((2, 8, 64, 16), 2),     # batch of 2, WC=1024
    ((1, 8, 32, 12), 4),     # 4x scale (VOC-like channel count at WC=384)
    ((1, 8, 128, 4), 3),     # 3x scale
])
def test_resize_kernel_matches_oracle(shape, scale):
    """Banded-MXU bilinear upsample vs the dense-matmul oracle (interpret
    mode), plus the custom-vjp backward vs the oracle's autodiff."""
    from hyperseg_tpu.ops.pallas import resize as R
    from hyperseg_tpu.nn import functional as F

    b, h, w, c = shape
    out_hw = (h * scale, w * scale)
    if not R.supported(shape, out_hw):
        assert (w * c) % 128 != 0  # only reason these shapes can fall back
        return
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)

    want = F.resize_bilinear(x, out_hw)
    got = R._forward(x, out_hw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # backward: custom-vjp transpose vs autodiff of the oracle
    g = jnp.asarray(rng.randn(b, *out_hw, c), jnp.float32)
    _, vjp_oracle = jax.vjp(lambda xx: F.resize_bilinear(xx, out_hw), x)
    dx_want = vjp_oracle(g)[0]
    dx_got = R._bwd(out_hw, shape, g)[0]
    np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_want),
                               atol=1e-4, rtol=1e-4)


def test_resize_kernel_supported_gate():
    from hyperseg_tpu.ops.pallas import resize as R
    assert R.supported((1, 256, 512, 19), (512, 1024))   # flagship 2x
    assert R.supported((1, 128, 128, 21), (512, 512))    # VOC 4x
    assert not R.supported((1, 256, 512, 19), (768, 1024))  # mixed scale
    assert not R.supported((1, 255, 512, 19), (510, 1024))  # h % 8
    assert not R.supported((1, 16, 32, 19), (32, 64))       # WC % 128
    assert not R.supported((1, 256, 512, 19), (256, 512))   # identity
