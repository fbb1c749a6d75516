"""Fused EfficientNet stem Pallas kernel: 3x3/s2 conv + BN + swish.

XLA's lowering of the 3-channel stem conv is the single most expensive op in
the HyperSeg forward (0.84 ms of a 2.9 ms HyperSeg-M pass at 512x1024 on
v5e: it space-to-batches H and pays a pathological pad/select pipeline, the
3/128-lane channel underfill making every layout choice bad). Measured
alternatives all lose: plain s2d + k2 conv, parity-plane matmuls, and any
XLA-side transpose of the 3-channel input each cost 0.9-6.4 ms in layout
changes alone.

This kernel never rearranges the input in XLA. It reads raw interleaved
rows — (B, H, W, 3) viewed as (B, H, W*3), a free row-major reshape — and
de-interleaves in VMEM with a one-hot selection matmul on the MXU (Mosaic
has no strided vector extracts, but a (rows, K) @ (K, groups) one-hot dot is
a natural MXU op):

  grid cell = (batch, row band, column chunk of CW output cols)
  1. assemble the interleaved band (2R+2, 2cin*CW + CW) from main+halo blocks
  2. g = band @ SEL: one matmul splits columns into 2*cin groups
     (col-parity x channel), each a contiguous (2R+2, CW) slab
  3. 12*cin contiguous slices (3 dy x groups x 2 col-offsets) stack into the
     tap tensor; row parity is a free leading-dim reshape
  4. taps contract with the folded (12cin, cout) filter on the MXU, giving
     the NHWC band directly; folded BN bias + swish finish on the VPU

CW spans the full output width whenever the selection matrix fits on-chip
(chunking costs ~1.5x in grid/assembly overhead, measured). At 512x1024
bf16 on v5e: 0.58 ms vs 0.93 ms for the XLA stem, identical numerics
(max dev 4e-3 at bf16). Eval-path only: training keeps the
(differentiable) XLA conv.

Reference stem: efficientnet.py:241-246 (_conv_stem + _bn0 + swish).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

# Cap chosen so the selection matrix + pipeline buffers stay inside the
# 16 MB scoped VMEM in every context. Round-3 re-measure with the amortized
# harness (bench.py docstring): cw=256 beats cw=512 at batch 1 AND 8
# (0.329 vs 0.366 / 1.420 vs 1.625 ms), and the 20 MB cw=512 sel matrix
# vmem-OOMs inside fori_loop bodies at batch 8 — the round-2 "chunking
# costs 1.5x" claim was per-call dispatch bias, not device time.
SEL_BYTES_CAP = 6 * 1024 * 1024

# De-interleave via a lane-permutation gather (tpu.dynamic_gather) instead of
# the one-hot selection matmul. The selection matmul is the kernel's dominant
# cost (~10x the conv's own FLOPs: K=2cin*cw+128 contracted against
# N=2cin*(cw+8) one-hot columns per row); the gather is the same permutation
# with no MACs at all. A/B lever (tools/bench_stem.py) — pinned OFF: the
# Mosaic compile of the gather variant consistently fails on the shipping
# toolchain (remote_compile HTTP 500 at every benchmark shape, 2026-08-18);
# interpret-mode parity still covers the code path.
SEL_GATHER = False


def _pick_cw(w2, cin, itemsize, gather=False):
    """Largest 128-multiple column chunk (preferring the full width) whose
    selection matrix stays under the on-chip cap. In gather mode the
    "selection" is a 1-row index vector, so the cap never binds and the full
    width wins (fewer cells, no column-halo re-reads)."""
    for cw in [w2, 512, 256, 128]:
        if cw <= w2 and cw % 128 == 0 and w2 % cw == 0:
            if gather:
                return cw
            sel_bytes = (2 * cin * cw + 128) * (2 * cin * (cw + 8)) * itemsize
            if sel_bytes <= SEL_BYTES_CAP:
                return cw
    return None


def supported(h, w, cin, band_rows=32, itemsize=2):
    """Shapes the kernel handles; callers fall back to XLA otherwise."""
    if h % 2 or w % 2 or _pick_cw(w // 2, cin, itemsize) is None:
        return False
    rows = band_rows
    while rows >= 8 and (h // 2) % rows:
        rows //= 2
    return rows >= 8


def _gather_indices(cin, cw):
    """(1, 2cin*cw + 128) int32 lane-permutation equivalent of
    _selection_matrix: output lane (cin*p + ci)*cwp + c2 reads input lane
    cin*(2*c2 + p) + ci. Lanes past 2cin*cwp (alignment spare) read lane 0."""
    kwi = 2 * cin * cw + 128
    cwp = cw + 8
    idx = np.zeros(kwi, np.int32)
    for c2 in range(cw + 1):
        for p in range(2):
            for ci in range(cin):
                o = (cin * p + ci) * cwp + c2
                if o < kwi:
                    idx[o] = cin * (2 * c2 + p) + ci
    return idx[None, :]


def _selection_matrix(cin, cw):
    """(K, 2cin*(cw+8)) one-hot: interleaved window column
    cin*(2*c2 + p) + ci -> group (cin*p + ci), local col c2. Covers
    c2 in [0, cw] so the shifted (dx=2) taps read in-bounds."""
    kwi = 2 * cin * cw + 128   # main window + 128-lane right halo
    cwp = cw + 8
    sel = np.zeros((kwi, 2 * cin * cwp), np.float32)
    for c2 in range(cw + 1):
        for p in range(2):
            for ci in range(cin):
                j = cin * (2 * c2 + p) + ci
                if j < kwi:
                    sel[j, (cin * p + ci) * cwp + c2] = 1.0
    return sel


def _fold_filter(weight, bn_scale, bn_var, eps):
    """(3,3,cin,cout) HWIO -> (12cin taps, cout) with the BN scale folded in;
    tap order matches the in-kernel stack (dy, group=(p,ci), off). Traceable
    (jnp): tap (p, off) <- dx = 2*off + p is a pure permutation, with the
    nonexistent dx=3 slot zero."""
    kh, kw, cin, cout = weight.shape
    inv = bn_scale.astype(jnp.float32) * jax.lax.rsqrt(
        bn_var.astype(jnp.float32) + eps)
    w = weight.astype(jnp.float32) * inv
    wpad = jnp.pad(w, ((0, 0), (0, 1), (0, 0), (0, 0)))   # dx: 0..3
    sel = wpad[:, jnp.array([[0, 2], [1, 3]])]            # (dy, p, off, ci, o)
    out = jnp.transpose(sel, (0, 1, 3, 2, 4))             # (dy, p, ci, off, o)
    return out.reshape(3 * 2 * cin * 2, cout)


def _kernel(xm, xrh, xch, xcc, sel_ref, w_ref, b_ref, o_ref, *,
            rows, cin, cout, cw, act, planar, gather=False):
    """One cell: R output rows x CW output cols, all cout channels."""
    kwi = 2 * cin * cw
    cwp = cw + 8
    top = jnp.concatenate([xm[0], xch[0]], 1)               # (2R, kwi+128)
    bot = jnp.concatenate([xrh[0][:2, :kwi], xcc[0][:2]], 1)
    xb = jnp.concatenate([top, bot], 0)                     # (2R+2, kwi+128)
    if gather:
        # lane-permutation de-interleave: same mapping as the one-hot
        # matmul, zero MACs (tpu.dynamic_gather along lanes)
        idx = jnp.broadcast_to(sel_ref[:], xb.shape)
        g = jnp.take_along_axis(xb, idx, axis=1)[:, :2 * cin * cwp]
    else:
        g = lax.dot_general(xb, sel_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(xb.dtype)
    ts = []
    for dy in range(3):
        # rows 2r+dy for r=0..R-1: stride-2 row select via leading reshape
        r = g[dy:dy + 2 * rows].reshape(rows, 2, 2 * cin * cwp)[:, 0, :]
        for grp in range(2 * cin):
            for off in range(2):
                ts.append(r[:, grp * cwp + off: grp * cwp + off + cw])
    taps = jnp.stack(ts)                                    # (12cin, R, CW)
    if planar:
        y = lax.dot_general(w_ref[:].T, taps, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (cout,R,CW)
        y = y + b_ref[0].T[:, :, None]
    else:
        y = lax.dot_general(taps, w_ref[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (R,CW,cout)
        y = y + b_ref[0]
    if act == "swish":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def stem_conv(x, weight, interpret=False):
    """Differentiable stem conv (3x3/s2, TF-SAME ((0,1),(0,1))): the fused
    kernel runs the FORWARD (identity BN, no activation — exactly the raw
    conv), while the backward is XLA's conv VJP (well-shaped: the cotangent
    has cout=32 channels, none of the 3-channel-layout pathology the forward
    suffers). Lets the TRAINING path use the fast stem; BN-train + swish stay
    outside in XLA. Caller must check `supported(H, W, cin)`."""
    return _stem_conv_raw(x, weight, interpret)


def _stem_conv_raw(x, weight, interpret):
    cout = weight.shape[-1]
    ones = jnp.ones(cout, jnp.float32)
    zeros = jnp.zeros(cout, jnp.float32)
    return stem_conv_bn_swish(x, weight, ones, zeros, zeros, ones,
                              eps=0.0, act=None, interpret=interpret)


def _stem_conv_fwd(x, weight, interpret):
    return _stem_conv_raw(x, weight, interpret), (x, weight)


def _stem_conv_bwd(interpret, res, g):
    from hyperseg_tpu.nn import functional as F
    x, weight = res
    # primal output unused -> XLA dead-code-eliminates the inner forward
    _, vjp = jax.vjp(
        lambda xx, ww: F.conv2d(xx, ww, stride=(2, 2),
                                padding=((0, 1), (0, 1))), x, weight)
    return vjp(g)


stem_conv.defvjp(_stem_conv_fwd, _stem_conv_bwd)


def stem_conv_bn_swish(x, weight, bn_scale, bn_bias, bn_mean, bn_var, *,
                       eps=1e-3, act="swish", band_rows=32, planar=False,
                       gather=None, chunk_cols=None, interpret=False):
    """x: (B, H, W, cin); weight: (3, 3, cin, cout) HWIO; TF-SAME stride-2
    padding ((0,1),(0,1)). Returns NHWC (B, H//2, W//2, cout), or channel-
    planar (B, cout, H//2, W//2) with planar=True (feeds the fused MBConv
    chain, ops/pallas/mbconv.py). Caller must check `supported(H, W, cin)`."""
    b, h, w, cin = x.shape
    kh, kw_, _, cout = weight.shape
    itemsize = np.dtype(x.dtype).itemsize
    assert kh == 3 and kw_ == 3 and supported(h, w, cin, band_rows, itemsize)
    if gather is None:
        gather = SEL_GATHER
    h2, w2 = h // 2, w // 2
    rows = band_rows
    while h2 % rows:
        rows //= 2
    # chunk_cols overrides the auto pick (A/B lever, tools/bench_stem.py):
    # the selection matmul's per-output-column MACs scale ~linearly with CW
    # (K and N both grow with it), so NARROWER chunks do less de-interleave
    # work per pixel — down to where grid/assembly overhead wins.
    cw = chunk_cols or _pick_cw(w2, cin, itemsize, gather=gather)
    assert cw and cw % 128 == 0 and w2 % cw == 0
    kwi = 2 * cin * cw

    # interleaved rows + bottom row pad (8-row halo blocks) + right col pad
    xr = x.reshape(b, h, w * cin)
    xr = jnp.pad(xr, ((0, 0), (0, 16), (0, 128)))

    if gather:
        sel = jnp.asarray(_gather_indices(cin, cw))          # (1, kwi+128) i32
        sel_spec = pl.BlockSpec((1, kwi + 128), lambda bi, i, c: (0, 0))
    else:
        sel = jnp.asarray(_selection_matrix(cin, cw), x.dtype)
        sel_spec = pl.BlockSpec((kwi + 128, 2 * cin * (cw + 8)),
                                lambda bi, i, c: (0, 0))
    wf = _fold_filter(weight, bn_scale, bn_var, eps).astype(x.dtype)
    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + eps)
    bias = (bn_bias.astype(jnp.float32)
            - bn_mean.astype(jnp.float32) * bn_scale.astype(jnp.float32) * inv)
    bias = bias[None, None, :]                               # (1, 1, cout)

    kern = functools.partial(_kernel, rows=rows, cin=cin, cout=cout, cw=cw,
                             act=act, planar=planar, gather=gather)
    out = pl.pallas_call(
        kern,
        grid=(b, h2 // rows, w2 // cw),
        in_specs=[
            # row-main x col-main: (2R, 2cin*CW) at (band, chunk)
            pl.BlockSpec((1, 2 * rows, kwi), lambda bi, i, c: (bi, i, c)),
            # row-halo x col-main: 8 rows below the band
            pl.BlockSpec((1, 8, kwi),
                         lambda bi, i, c: (bi, (i + 1) * 2 * rows // 8, c)),
            # row-main x col-halo: 128 lanes right of the chunk
            pl.BlockSpec((1, 2 * rows, 128),
                         lambda bi, i, c: (bi, i, (c + 1) * (kwi // 128))),
            # row-halo x col-halo corner
            pl.BlockSpec((1, 8, 128),
                         lambda bi, i, c: (bi, (i + 1) * 2 * rows // 8,
                                           (c + 1) * (kwi // 128))),
            sel_spec,
            pl.BlockSpec((12 * cin, cout), lambda bi, i, c: (0, 0)),
            pl.BlockSpec((1, 1, cout), lambda bi, i, c: (0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, cout, rows, cw),
                                lambda bi, i, c: (bi, 0, i, c)) if planar
                   else pl.BlockSpec((1, rows, cw, cout),
                                     lambda bi, i, c: (bi, i, c, 0))),
        out_shape=(jax.ShapeDtypeStruct((b, cout, h2, w2), x.dtype) if planar
                   else jax.ShapeDtypeStruct((b, h2, w2, cout), x.dtype)),
        interpret=interpret,
    )(xr, xr, xr, xr, sel, wf, bias)
    return out
