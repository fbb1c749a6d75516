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
                  residual=None, nhwc=False, eps=1e-3, band_rows=32,
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
