"""Fused planar MBConv kernels for the high-resolution EfficientNet blocks.

The first backbone blocks (b1: block0/1 — expand=1, k3, s1, SE) run at
256x512 with 16-32 channels: in NHWC their depthwise convs occupy 32/128
lanes and XLA's lowering costs ~0.15 ms per block. In channel-planar layout
(B, C, H, W) the depthwise 3x3 is full-lane VPU FMAs and the 1x1 project is
a natural MXU contraction.

Mosaic layout notes baked into this design (each was a measured compile
failure or VMEM OOM the straightforward way): a lane vector cannot be
reshaped to (C, 1, 1) for leading-dim broadcast, so per-channel BN/tap
constants arrive lane-pre-broadcast as (.., C, 1, W) arrays; per-channel 1D
reductions (SE pooling) are leading-dim vectors and also unsupported, so
pooling runs in XLA on the planar output; halo index maps must stay affine
(a jnp.maximum map exploded compile time), so the input is pre-padded a
full band on top; and 32-row bands overflow the 16 MB scoped VMEM, so the
default band is 16 rows.

Each block is a two-phase pipeline (SE's global pooling is a full-map
barrier):
  dw_phase      — zero-pad SAME depthwise 3x3 + folded BN + swish -> planar
                  hidden map;
  (XLA glue)    — planar mean + the tiny SE MLP on a (B, C) vector;
  project_phase — 1x1 project with SE and BN folded into the contraction
                  (SE scales weight columns; the bias rides an appended
                  ones-row) + optional residual, emitting either planar (to
                  chain another fused block) or NHWC directly (a
                  leading-dim contraction — no transpose op).

Reference block semantics: efficientnet.py MBConvBlock (our
models/backbones/efficientnet.py _block). Eval path only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(xm, xtop, xbot, w_ref, b_ref, h_ref, *, c, rows, w):
    ext = jnp.concatenate([xtop[0][:, 7:8, :], xm[0], xbot[0][:, :1, :]],
                          axis=1)                               # (C,R+2,Wp)
    acc = jnp.zeros((c, rows, w), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            # taps arrive lane-pre-broadcast as (9, C, 1, W): a (C, 1, W)
            # sublane-broadcast multiply (Mosaic cannot reshape lane
            # vectors to (C, 1, 1), so per-channel scalars are not usable)
            acc = acc + (ext[:, dy:dy + rows, dx:dx + w].astype(jnp.float32)
                         * w_ref[3 * dy + dx])
    y = acc + b_ref[0]                    # (C, 1, W) broadcast, scale folded
    y = y * jax.nn.sigmoid(y)             # swish
    h_ref[0] = y.astype(h_ref.dtype)


def dw_phase(x_planar, w_dw, bn_scale, bn_bias, bn_mean, bn_var, *,
             eps=1e-3, band_rows=16, interpret=False):
    """x_planar: (B, C, H, W) with W % 128 == 0. w_dw: (3, 3, 1, C) HWIO
    depthwise. Returns the hidden map (B, C, H, W); the SE pooling runs on
    it in XLA (an in-kernel per-channel 1D reduction is a leading-dim
    vector, another Mosaic-unsupported layout)."""
    b, c, h, w = x_planar.shape
    rows = band_rows
    while h % rows:
        rows //= 2
    assert rows % 8 == 0 and w % 128 == 0
    bands = h // rows

    # top pad by a full band so every halo index map stays affine (dynamic
    # jnp.maximum maps sent the Mosaic pipeliner into a compile explosion);
    # bottom pad 8 so the last band's halo block reads zeros
    xp = jnp.pad(x_planar, ((0, 0), (0, 0), (rows, 8), (1, 1)))
    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + eps)
    s = bn_scale.astype(jnp.float32) * inv
    bb = (bn_bias.astype(jnp.float32)
          - bn_mean.astype(jnp.float32) * s)
    wdw = jnp.transpose(w_dw[:, :, 0, :], (2, 0, 1)).reshape(c, 9)
    wdw = wdw.astype(jnp.float32) * s[:, None]                 # scale folded
    # lane-pre-broadcast (see _dw_kernel): (9, C, 1, W) taps, (1, C, 1, W) bias
    w9 = jnp.broadcast_to(wdw.T[:, :, None, None], (9, c, 1, w))
    b9 = jnp.broadcast_to(bb[None, :, None, None], (1, c, 1, w))

    kern = functools.partial(_dw_kernel, c=c, rows=rows, w=w)
    return pl.pallas_call(
        kern,
        grid=(b, bands),
        in_specs=[
            pl.BlockSpec((1, c, rows, w + 2), lambda bi, i: (bi, 0, i + 1, 0)),
            # top halo: the 8-row block ending at this band's first padded
            # row (the top band-pad supplies zeros for band 0)
            pl.BlockSpec((1, c, 8, w + 2),
                         lambda bi, i: (bi, 0, (i + 1) * rows // 8 - 1, 0)),
            # bottom halo: the 8-row block starting at the next band (the
            # array is bottom-padded so the last band reads zeros)
            pl.BlockSpec((1, c, 8, w + 2),
                         lambda bi, i: (bi, 0, (i + 2) * rows // 8, 0)),
            pl.BlockSpec((9, c, 1, w), lambda bi, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c, 1, w), lambda bi, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, rows, w), lambda bi, i: (bi, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), x_planar.dtype),
        interpret=interpret,
    )(xp, xp, xp, w9, b9)


def _proj_kernel(h_ref, res_ref, w_ref, o_ref, *, nhwc, residual, rows, w):
    ones = jnp.ones((1, rows, w), h_ref.dtype)
    hs = jnp.concatenate([h_ref[0], ones], axis=0)            # (C+1, R, W)
    y = lax.dot_general(w_ref[0], hs, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (CO, R, W)
    if residual:
        y = y + res_ref[0].astype(jnp.float32)
    if nhwc:
        # leading-dim contraction with I == planar -> NHWC, no transpose op
        eye = jnp.eye(y.shape[0], dtype=y.dtype)
        y = lax.dot_general(y, eye, (((0,), (0,)), ((), ())))  # (R, W, CO)
    o_ref[0] = y.astype(o_ref.dtype)


def project_phase(hidden, se, w_proj, bn_scale, bn_bias, bn_mean, bn_var, *,
                  residual=None, nhwc=False, eps=1e-3, band_rows=16,
                  interpret=False):
    """hidden: (B, C, H, W); se: (B, C) sigmoid-activated scales;
    w_proj: (1, 1, C, CO) HWIO. Returns (B, CO, H, W) planar or
    (B, H, W, CO) NHWC.

    SE and BN fold into the contraction: out = (W diag(se)) h + bias, with
    the bias riding an appended ones-row — no per-channel broadcasts in the
    kernel (Mosaic cannot reshape lane vectors to (C, 1, 1))."""
    b, c, h, w = hidden.shape
    co = w_proj.shape[-1]
    rows = band_rows
    while h % rows:
        rows //= 2
    assert rows % 8 == 0

    inv = jax.lax.rsqrt(bn_var.astype(jnp.float32) + eps)
    s = bn_scale.astype(jnp.float32) * inv
    bias = (bn_bias.astype(jnp.float32)
            - bn_mean.astype(jnp.float32) * s)                   # (CO,)
    wp = jnp.transpose(w_proj[0, 0], (1, 0)).astype(jnp.float32) * s[:, None]
    # per-batch: scale columns by se, append the bias column
    wp_b = wp[None, :, :] * se.astype(jnp.float32)[:, None, :]   # (B, CO, C)
    wp_b = jnp.concatenate(
        [wp_b, jnp.broadcast_to(bias[None, :, None], (b, co, 1))], axis=2)
    wp_b = wp_b.astype(hidden.dtype)                             # (B, CO, C+1)
    res = residual if residual is not None else hidden[:, :co]

    kern = functools.partial(_proj_kernel, nhwc=nhwc,
                             residual=residual is not None, rows=rows, w=w)
    out_spec = (pl.BlockSpec((1, rows, w, co), lambda bi, i: (bi, i, 0, 0))
                if nhwc else
                pl.BlockSpec((1, co, rows, w), lambda bi, i: (bi, 0, i, 0)))
    out_shape = (jax.ShapeDtypeStruct((b, h, w, co), hidden.dtype)
                 if nhwc else
                 jax.ShapeDtypeStruct((b, co, h, w), hidden.dtype))
    return pl.pallas_call(
        kern,
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, c, rows, w), lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((1, co, rows, w), lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((1, co, c + 1), lambda bi, i: (bi, 0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(hidden, res, wp_b)


def _exp_dw_kernel(xm, xth, xbh, w_e, w9, b9, selc, o_ref, acc_ref, *,
                   cin, cmid, rows, w, w_out, stride, h):
    """Expand 1x1 (+bn0+swish) -> depthwise 3x3 (+bn1+swish) for one band.

    stride 1: input band is R+2 rows (top/bottom 1-row halos from 8-row
    blocks); taps slice rows dy. stride 2: input band is 2R+2 rows (TF-SAME
    pads bottom/right only — no top halo); row parity comes from a
    leading-dim reshape, column parity from a one-hot (W, W_out) selection
    matmul on the MXU."""
    if stride == 1:
        xb = jnp.concatenate([xth[0][:, 7:8], xm[0], xbh[0][:, :1]],
                             axis=1)                           # (Cin,R+2,Wp)
    else:
        xb = jnp.concatenate([xm[0], xbh[0][:, :2]], axis=1)   # (Cin,2R+2,Wp)
    ones = jnp.ones((1,) + xb.shape[1:], xb.dtype)
    xe = lax.dot_general(w_e[:], jnp.concatenate([xb, ones], 0),
                         (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)    # (Cmid,?,Wp)
    xe = xe * jax.nn.sigmoid(xe)                                # swish
    # the depthwise SAME padding pads the EXPANDED map with zeros; the
    # expand of a zero-padded input is swish(bias), so mask the pad region
    i = pl.program_id(1)
    ri = lax.broadcasted_iota(jnp.int32, (1,) + xb.shape[1:], 1)
    ci = lax.broadcasted_iota(jnp.int32, (1,) + xb.shape[1:], 2)
    if stride == 1:
        gr = i * rows + ri - 1
        valid = (gr >= 0) & (gr < h) & (ci >= 1) & (ci < w + 1)
    else:
        gr = 2 * i * rows + ri
        valid = (gr < h) & (ci < w)
    xe = jnp.where(valid, xe, 0.0).astype(xb.dtype)
    # accumulate taps through a VMEM scratch ref: a pure-value chain keeps
    # all nine (Cmid, R, W) temporaries live and overflows scoped VMEM
    first = True
    for dy in range(3):
        if stride == 1:
            rsel = xe[:, dy:dy + rows]
        else:
            rsel = xe[:, dy:dy + 2 * rows].reshape(
                cmid, rows, 2, xe.shape[-1])[:, :, 0]           # rows 2r+dy
        for dx in range(3):
            t = (rsel[:, :, dx:dx + w].astype(jnp.float32) * w9[3 * dy + dx])
            acc_ref[:] = t if first else acc_ref[:] + t         # (Cmid,R,W)
            first = False
    acc = acc_ref[:]
    if stride == 2:
        acc = lax.dot_general(acc.astype(xb.dtype), selc[:],
                              (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    y = acc + b9[0]                                             # (Cmid,R,Wout)
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def expand_dw_phase(x_planar, w_expand, bn0, w_dw, bn1, *, stride=1,
                    eps=1e-3, band_rows=None, cchunk=None, interpret=False):
    """Expand-ratio MBConv front half: 1x1 expand + bn0 + swish + depthwise
    3x3 (stride 1 or 2, TF-SAME) + bn1 + swish, channel-planar.

    x_planar: (B, Cin, H, W); w_expand: (1, 1, Cin, Cmid) HWIO;
    w_dw: (3, 3, 1, Cmid); bn0/bn1: (scale, bias, mean, var) tuples.
    Returns (B, Cmid, H//stride, W//stride)."""
    b, cin, h, w = x_planar.shape
    cmid = w_expand.shape[-1]
    h_out, w_out = h // stride, w // stride
    rows = band_rows or (16 if stride == 1 else 8)
    while h_out % rows:
        rows //= 2
    assert rows % 8 == 0 and w % 128 == 0 and h % 2 == 0 and w % 2 == 0

    # folded expand: bn0 scale into columns, bias as an extra ones-row
    inv0 = jax.lax.rsqrt(bn0[3].astype(jnp.float32) + eps)
    s0 = bn0[0].astype(jnp.float32) * inv0
    bias0 = bn0[1].astype(jnp.float32) - bn0[2].astype(jnp.float32) * s0
    we = jnp.transpose(w_expand[0, 0], (1, 0)).astype(jnp.float32) * s0[:, None]
    we = jnp.concatenate([we, bias0[:, None]], axis=1)          # (Cmid,Cin+1)
    we = we.astype(x_planar.dtype)

    # folded dw taps (bn1 scale) + lane-broadcast bias at the output width
    inv1 = jax.lax.rsqrt(bn1[3].astype(jnp.float32) + eps)
    s1 = bn1[0].astype(jnp.float32) * inv1
    bias1 = bn1[1].astype(jnp.float32) - bn1[2].astype(jnp.float32) * s1
    wdw = jnp.transpose(w_dw[:, :, 0, :], (2, 0, 1)).reshape(cmid, 9)
    wdw = wdw.astype(jnp.float32) * s1[:, None]
    w9 = jnp.broadcast_to(wdw.T[:, :, None, None], (9, cmid, 1, w))
    b9 = jnp.broadcast_to(bias1[None, :, None, None], (1, cmid, 1, w_out))

    if stride == 1:
        # symmetric SAME pad; top pad a full band keeps halo maps affine.
        # Width pads to a 128 multiple: Mosaic cannot lower the rank-3
        # expand contraction when the lane dim is ragged (514 lanes fail,
        # 512/640 work)
        xp = jnp.pad(x_planar, ((0, 0), (0, 0), (rows, 8), (1, 127)))
        in_rows = rows
        main_idx = lambda bi, i: (bi, 0, i + 1, 0)
        top_idx = lambda bi, i: (bi, 0, (i + 1) * rows // 8 - 1, 0)
        halo_idx = lambda bi, i: (bi, 0, (i + 2) * rows // 8, 0)
        selc = jnp.zeros((1, 1), x_planar.dtype)  # unused
        sel_spec = pl.BlockSpec((1, 1), lambda bi, i, c: (0, 0))
    else:
        # TF-SAME for stride 2 on even dims pads bottom/right only (width
        # padded to a 128 multiple, see above)
        xp = jnp.pad(x_planar, ((0, 0), (0, 0), (0, 16), (0, 128)))
        in_rows = 2 * rows
        main_idx = lambda bi, i: (bi, 0, i, 0)
        top_idx = lambda bi, i: (bi, 0, 0, 0)  # unused dummy
        halo_idx = lambda bi, i: (bi, 0, (i + 1) * 2 * rows // 8, 0)
        sel = np.zeros((w, w_out), np.float32)
        sel[np.arange(w_out) * 2, np.arange(w_out)] = 1.0
        selc = jnp.asarray(sel, x_planar.dtype)
        sel_spec = pl.BlockSpec((w, w_out), lambda bi, i, c: (0, 0))

    wp = xp.shape[-1]
    # channel-chunk the expanded domain so the per-cell stack (expand
    # output + scratch accumulator + pipeline buffers) stays inside the
    # 16 MB scoped VMEM; cchunk overridable for measurement (bench_expand)
    if cchunk is None:
        cchunk = cmid
        while cchunk > 48 or cmid % cchunk:
            for d in range(cchunk - 1, 0, -1):
                if cmid % d == 0:
                    cchunk = d
                    break
    assert cmid % cchunk == 0
    kern = functools.partial(_exp_dw_kernel, cin=cin, cmid=cchunk, rows=rows,
                             w=w, w_out=w_out, stride=stride, h=h)
    return pl.pallas_call(
        kern,
        grid=(b, h_out // rows, cmid // cchunk),
        in_specs=[
            pl.BlockSpec((1, cin, in_rows, wp),
                         lambda bi, i, c: main_idx(bi, i)),
            pl.BlockSpec((1, cin, 8, wp), lambda bi, i, c: top_idx(bi, i)),
            pl.BlockSpec((1, cin, 8, wp), lambda bi, i, c: halo_idx(bi, i)),
            pl.BlockSpec((cchunk, cin + 1), lambda bi, i, c: (c, 0)),
            pl.BlockSpec((9, cchunk, 1, w), lambda bi, i, c: (0, c, 0, 0)),
            pl.BlockSpec((1, cchunk, 1, w_out),
                         lambda bi, i, c: (0, c, 0, 0)),
            sel_spec,
        ],
        out_specs=pl.BlockSpec((1, cchunk, rows, w_out),
                               lambda bi, i, c: (bi, c, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, cmid, h_out, w_out),
                                       x_planar.dtype),
        scratch_shapes=[pltpu.VMEM((cchunk, rows, w), jnp.float32)],
        interpret=interpret,
    )(xp, xp, xp, we, w9, b9, selc)
