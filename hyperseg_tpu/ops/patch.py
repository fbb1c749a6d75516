"""Patch-wise dynamic convolution ops (lax reference path).

The HyperSeg decoder computes a weight tensor on the stride-32 grid and applies
it patch-wise: the image is split into an (fh, fw) grid of (ph, pw) patches,
each convolved with its own generated filters. The reference reaches cuDNN
through unfold/grouped-conv/fold (hyperseg_v1_0.py:328-370, 486-498,
meta_patch.py:35-57). Here the natural TPU formulation is a patch-blocked
layout (B, fh, fw, ph, pw, C) with batched einsums — every 1x1 stage is a
(ph*pw, Cin) x (Cin, Cout) matmul per patch that XLA tiles onto the MXU, and
the depthwise 3x3 is a 9-tap shift-multiply on the VPU.

These functions are the numerical oracle; the fused Pallas kernels in
hyperseg_tpu/ops/pallas must match them exactly.

Weight layout convention: flat per-patch vectors w: (B, fh, fw, P), with P
unpacking C-ordered as (out_ch, in_ch // groups, kh, kw) — identical to the
reference (hyperseg_v1_0.py:350,357,364,492-493).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from hyperseg_tpu.nn import functional as F


# Route eligible per-patch 1x1 convs through fullmap_pointwise (below)
# instead of block_patches + patch_pointwise + unblock_patches. A/B lever —
# ON by measurement (tools/bench_pointwise.py, v5e): at b8 fullmap >= blocked
# everywhere (Lvoc_expand_l4 2.42 vs 4.05 ms, 1.67x; others 1.00-1.07x); at
# b1 it is within noise except Lvoc_expand (1.54x win) but FULLMAP_MIN_BATCH
# keeps b1 on the measured blocked sweep configuration.
FULLMAP_POINTWISE = True

# Batch gate for PatchConvUnit's full-map eval forms (pointwise + depthwise):
# their motivation is the batch >= 2 relayout tax (explicit transposes / 6D
# halo tensor materializing in HBM); at eval batch 1 XLA fuses the patch
# forms away and that configuration is what the recorded batch-1 sweep
# measured — so batch 1 keeps it until the fullmap forms are measured
# faster there too. Training always takes the full-map forms (the 6D
# backward is the known-bad case).
FULLMAP_MIN_BATCH = 2

# Route eligible InvResUnits (stride 1, odd kernel, dividing patch grid)
# through the full-map formulation — expand on the un-halo'd map + halo band
# einsums + interleaved blocked depthwise — instead of the 6D gather path.
# A/B lever (tools/bench_invres_train.py). Default OFF by measurement (v5e,
# fwd+bwd ms): b8 M_l3 gather 11.8 vs fullmap 13.5 (0.87x), M_l4 41.8 vs
# 51.8 (0.81x); b16 0.84x/0.80x — XLA fuses the gather path's 6D tensor out
# of the backward better than the band-einsum chain. Eval-side the fullmap
# form also loses to gather at every measured batch (tools/bench_invres.py:
# b1 M_l4 0.770 vs 0.718, b8 10.83 vs 9.47), and the Pallas kernel owns
# batch >= 2 on TPU anyway.
FULLMAP_INVRES = False
# Eval-mode batch gate: at batch 1 XLA fuses the gather path nearly for free
# (BENCHMARKS.md batch-scaling study), so the fullmap form only dispatches at
# batch >= this. Set to 1 to A/B the fullmap form at batch 1.
FULLMAP_INVRES_EVAL_MIN_BATCH = 2


def block_patches(x, fh, fw):
    """(B, H, W, C) -> (B, fh, fw, ph, pw, C)."""
    b, h, w, c = x.shape
    ph, pw = h // fh, w // fw
    x = x.reshape(b, fh, ph, fw, pw, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5))


def unblock_patches(xp):
    """(B, fh, fw, ph, pw, C) -> (B, fh*ph, fw*pw, C)."""
    b, fh, fw, ph, pw, c = xp.shape
    x = jnp.transpose(xp, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, fh * ph, fw * pw, c)


# Replace the halo gather's autodiff transpose — a scatter-add over the
# overlapping window reads — with an explicit overlap-add built purely from
# reshape/concat/slice (TPU scatter lowers to a serialized loop; the overlap
# structure here is static, so the transpose is expressible as two dense
# adds per axis). A/B lever for the TRAINING path; decided by measurement
# (tools/bench_bwd_unit.py) — OFF until the on-chip number is recorded.
HALO_SLICE_VJP = False


def _overlap_add(t, axis, stride, extra):
    """Inverse of a strided sliding-window split along (axis, axis+1).

    t's axes (axis, axis+1) hold n windows of length stride+extra read at
    `stride` spacing from a line of length n*stride + extra (consecutive
    windows overlap by `extra`); returns t with those two axes merged into
    the summed line. Requires extra <= stride. Pure reshape/concat/slice."""
    n = t.shape[axis]
    win = t.shape[axis + 1]
    assert win == stride + extra and 0 <= extra <= stride
    lead, trail = t.shape[:axis], t.shape[axis + 2:]
    head = jax.lax.slice_in_dim(t, 0, stride, axis=axis + 1)
    head = head.reshape(lead + (n * stride,) + trail)
    if extra == 0:
        return head
    # Window g's last `extra` entries land at line position (g+1)*stride —
    # i.e. the tails form their own stride-spaced pattern offset by one
    # block; zero-pad each tail to a full block, merge, shift, slice.
    tail = jax.lax.slice_in_dim(t, stride, win, axis=axis + 1)
    tail = jnp.concatenate(
        [tail, jnp.zeros(lead + (n, stride - extra) + trail, t.dtype)],
        axis=axis + 1).reshape(lead + (n * stride,) + trail)
    base = jnp.concatenate(
        [head, jnp.zeros(lead + (extra,) + trail, t.dtype)], axis=axis)
    add = jnp.concatenate(
        [jnp.zeros(lead + (stride,) + trail, t.dtype), tail], axis=axis)
    return base + jax.lax.slice_in_dim(add, 0, n * stride + extra, axis=axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _gather_halo_windows(xpad, fh, fw, pt, pl):
    """The pure gather stage of extract_patches_with_halo, reading from the
    already-padded map. custom_vjp: the transpose is the overlap-add above
    instead of XLA's scatter-add."""
    b, hp, wp, c = xpad.shape
    ph, pw = (hp - 2 * pt) // fh, (wp - 2 * pl) // fw
    row_idx = (np.arange(fh)[:, None] * ph + np.arange(ph + 2 * pt)[None, :])
    col_idx = (np.arange(fw)[:, None] * pw + np.arange(pw + 2 * pl)[None, :])
    xp = xpad[:, row_idx]                # (B, fh, ph+2pt, W+2pl, C)
    xp = xp[:, :, :, col_idx]            # (B, fh, ph+2pt, fw, pw+2pl, C)
    return jnp.transpose(xp, (0, 1, 3, 2, 4, 5))


def _ghw_fwd(xpad, fh, fw, pt, pl):
    return _gather_halo_windows(xpad, fh, fw, pt, pl), xpad.shape


def _ghw_bwd(fh, fw, pt, pl, shape, g):
    b, hp, wp, c = shape
    ph, pw = (hp - 2 * pt) // fh, (wp - 2 * pl) // fw
    g = jnp.transpose(g, (0, 1, 3, 2, 4, 5))   # (B, fh, ph+2pt, fw, pw+2pl, C)
    g = _overlap_add(g, 3, pw, 2 * pl)          # (B, fh, ph+2pt, W+2pl, C)
    g = _overlap_add(g, 1, ph, 2 * pt)          # (B, H+2pt, W+2pl, C)
    return (g,)


_gather_halo_windows.defvjp(_ghw_fwd, _ghw_bwd)


def extract_patches_with_halo(x, fh, fw, pad_hw, mode="reflect"):
    """(B, H, W, C) -> overlapping patches (B, fh, fw, ph+2*pt, pw+2*pl, C).

    Equivalent to the reference's reflect-pad + overlapping unfold
    (hyperseg_v1_0.py:336-342). Gather-based; each border row/col is read by
    two patches (the halo). pad2d keeps its native VJP (reflect-pad's
    transpose is flip-slice adds); the gather stage optionally takes the
    slice-based custom VJP above."""
    b, h, w, c = x.shape
    ph, pw = h // fh, w // fw
    pt, pl = pad_hw
    xpad = F.pad2d(x, ((pt, pt), (pl, pl)), mode=mode)
    if HALO_SLICE_VJP and 2 * pt <= ph and 2 * pl <= pw:
        return _gather_halo_windows(xpad, fh, fw, pt, pl)
    row_idx = (np.arange(fh)[:, None] * ph + np.arange(ph + 2 * pt)[None, :])
    col_idx = (np.arange(fw)[:, None] * pw + np.arange(pw + 2 * pl)[None, :])
    xp = xpad[:, row_idx]                # (B, fh, ph+2pt, W+2pl, C)
    xp = xp[:, :, :, col_idx]            # (B, fh, ph+2pt, fw, pw+2pl, C)
    return jnp.transpose(xp, (0, 1, 3, 2, 4, 5))


def patch_pointwise(xp, w, out_channels, groups=1):
    """Per-patch 1x1 conv. xp: (B, fh, fw, h, w, Cin); w: (B, fh, fw, P) with
    P = out_channels * Cin // groups. -> (B, fh, fw, h, w, out_channels)."""
    b, fh, fw, h, wd, cin = xp.shape
    if groups == 1:
        wk = w.reshape(b, fh, fw, out_channels, cin).astype(xp.dtype)
        return jnp.einsum("bfghwc,bfgoc->bfghwo", xp, wk)
    cpg = cin // groups
    opg = out_channels // groups
    wk = w.reshape(b, fh, fw, groups, opg, cpg).astype(xp.dtype)
    xg = xp.reshape(b, fh, fw, h, wd, groups, cpg)
    out = jnp.einsum("bfghwnc,bfgnoc->bfghwno", xg, wk)
    return out.reshape(b, fh, fw, h, wd, out_channels)


def fullmap_pointwise(x, w, fh, fw, out_channels, groups=1):
    """Per-patch 1x1 conv computed on the patch-blocked VIEW of the full map.

    Numerically the same contraction as block_patches + patch_pointwise +
    unblock_patches, but the operand keeps the (B, fh, ph, fw, pw, C) layout —
    both reshapes to/from the (B, H, W, C) map are free, so the two explicit
    (ph <-> fw) HBM transposes disappear and XLA is left to fold any needed
    relayout into the dot itself. At batch 1 XLA fuses either form; at
    batch >= 2 the explicit transposes materialize (the same relayout tax as
    the 6D halo tensor, see fullmap_depthwise). x: (B, H, W, Cin);
    w: (B, fh, fw, P), P = out_channels * Cin // groups. -> (B, H, W, out)."""
    b, h, wd, cin = x.shape
    ph, pw = h // fh, wd // fw
    xv = x.reshape(b, fh, ph, fw, pw, cin)
    if groups == 1:
        wk = w.reshape(b, fh, fw, out_channels, cin).astype(x.dtype)
        out = jnp.einsum("bfpgqc,bfgoc->bfpgqo", xv, wk)
    else:
        cpg = cin // groups
        opg = out_channels // groups
        wk = w.reshape(b, fh, fw, groups, opg, cpg).astype(x.dtype)
        xg = xv.reshape(b, fh, ph, fw, pw, groups, cpg)
        out = jnp.einsum("bfpgqnc,bfgnoc->bfpgqno", xg, wk)
        out = out.reshape(b, fh, ph, fw, pw, out_channels)
    return out.reshape(b, h, wd, out_channels)


def halo_bands_pointwise(x, w, fh, fw, pad, out_channels, mode="reflect"):
    """Per-patch 1x1 conv evaluated only on each patch's halo ring, with the
    CENTER patch's weights — the pieces of the halo'd expand tensor that a
    full-map 1x1 (fullmap_pointwise) cannot produce, because there the
    neighbouring pixels get the neighbour's weights.

    x: (B, H, W, Cin) unpadded map; w: (B, fh, fw, out*Cin) flat.
    Returns (top, bottom, left, right):
      top/bottom: (B, fh, pad, fw, pw+2*pad, out) — full window width, so the
                  four window corners live here;
      left/right: (B, fh, ph, fw, pad, out) — interior rows only.
    Band values are bit-identical to the corresponding halo ring of
    extract_patches_with_halo + patch_pointwise (same pad2d source, same
    contraction)."""
    b, h, wd, cin = x.shape
    ph, pw = h // fh, wd // fw
    xpad = F.pad2d(x, ((pad, pad), (pad, pad)), mode=mode)
    wk = w.reshape(b, fh, fw, out_channels, cin).astype(x.dtype)

    col_wide = (np.arange(fw)[:, None] * pw
                + np.arange(pw + 2 * pad)[None, :])         # window cols
    row_in = (np.arange(fh)[:, None] * ph
              + pad + np.arange(ph)[None, :])               # interior rows

    def row_band(row0):
        rows = np.arange(fh)[:, None] * ph + row0 + np.arange(pad)[None, :]
        t = xpad[:, rows]                  # (B, fh, pad, W+2pad, Cin)
        t = t[:, :, :, col_wide]           # (B, fh, pad, fw, pw+2pad, Cin)
        return jnp.einsum("bfrgwc,bfgoc->bfrgwo", t, wk)

    def col_band(col0):
        cols = np.arange(fw)[:, None] * pw + col0 + np.arange(pad)[None, :]
        t = xpad[:, row_in]                # (B, fh, ph, W+2pad, Cin)
        t = t[:, :, :, cols]               # (B, fh, ph, fw, pad, Cin)
        return jnp.einsum("bfpgqc,bfgoc->bfpgqo", t, wk)

    return (row_band(0), row_band(ph + pad),
            col_band(0), col_band(pw + pad))


def assemble_halo_blocked(center_blk, top, bottom, left, right):
    """Concat a blocked map (B, fh, ph, fw, pw, C) with its halo bands into
    the interleaved halo'd layout (B, fh, ph+2pad, fw, pw+2pad, C).

    Same elements as extract_patches_with_halo's (B, fh, fw, ph+2p, pw+2p, C)
    but keeps channels/pw on the (lane, sublane) dims — the gather layout
    tiles ~5x padded in HBM at batch >= 2, this one ~2x."""
    wide = jnp.concatenate([left, center_blk, right], axis=4)
    return jnp.concatenate([top, wide, bottom], axis=2)


def blocked_depthwise_valid(xb, w, kernel_size):
    """Depthwise kxk VALID conv on the interleaved blocked layout.

    xb: (B, fh, ph+kh-1, fw, pw+kw-1, C); w: (B, fh, fw, C*kh*kw) unpacking
    as (C, kh, kw). -> (B, fh, ph, fw, pw, C). Same tap order as
    patch_depthwise_valid."""
    b, fh, hh, fw, ww, c = xb.shape
    kh, kw = kernel_size
    oh, ow = hh - kh + 1, ww - kw + 1
    wk = w.reshape(b, fh, fw, c, kh, kw).astype(xb.dtype)
    out = None
    for di in range(kh):
        for dj in range(kw):
            tap = (xb[:, :, di:di + oh, :, dj:dj + ow, :]
                   * wk[:, :, None, :, None, :, di, dj])
            out = tap if out is None else out + tap
    return out


def patch_depthwise_valid(xp, w, kernel_size):
    """Per-patch depthwise kxk VALID conv.

    xp: (B, fh, fw, h, w, C); w: (B, fh, fw, C*kh*kw) unpacking as (C, kh, kw).
    -> (B, fh, fw, h-kh+1, w-kw+1, C). Computed as a kh*kw-tap shift-multiply
    (VPU work; XLA fuses the taps)."""
    b, fh, fw, h, wd, c = xp.shape
    kh, kw = kernel_size
    oh, ow = h - kh + 1, wd - kw + 1
    wk = w.reshape(b, fh, fw, c, kh, kw).astype(xp.dtype)
    out = None
    for di in range(kh):
        for dj in range(kw):
            tap = xp[:, :, :, di:di + oh, dj:dj + ow, :] * wk[:, :, :, None, None, :, di, dj]
            out = tap if out is None else out + tap
    return out


def fullmap_depthwise(x, w, fh, fw, kernel, mode="reflect"):
    """Per-patch depthwise kxk SAME conv computed on the FULL map.

    Exactly equivalent to extract_patches_with_halo + patch_depthwise_valid +
    unblock_patches whenever the unit's input is a reassembled full map (every
    PatchConvUnit: its halo pixels are literally the neighboring map pixels):
    each output pixel uses its own patch's weights and reads neighbors from
    the padded map. Same tap order, same values — bit-identical.

    Why it exists: at batch >= 2 XLA materializes the overlapping 6D halo
    tensor (B, fh, fw, ph+2p, pw+2p, C) in HBM with ~5x (sublane, lane) tiling
    pad, doubling the per-image cost of the patch path. The full-map form is
    kh*kw fused shift-multiplies on a plain NHWC tensor — nothing 6D ever
    exists. x: (B, H, W, C); w: (B, fh, fw, C*kh*kw) unpacking as (C, kh, kw).
    """
    b, h, wd, c = x.shape
    ph, pw = h // fh, wd // fw
    pad = kernel // 2
    xpad = F.pad2d(x, ((pad, pad), (pad, pad)), mode=mode)
    wk = w.reshape(b, fh, fw, c, kernel, kernel).astype(x.dtype)
    out = None
    for di in range(kernel):
        for dj in range(kernel):
            wt = jnp.broadcast_to(wk[:, :, None, :, None, :, di, dj],
                                  (b, fh, ph, fw, pw, c)).reshape(b, h, wd, c)
            tap = xpad[:, di:di + h, dj:dj + wd, :] * wt
            out = tap if out is None else out + tap
    return out


def patch_conv_valid(xp, w, out_channels, kernel_size, groups=1, stride=(1, 1)):
    """Per-patch dense/grouped kxk VALID conv via im2col einsum.

    xp: (B, fh, fw, h, w, Cin); w: (B, fh, fw, P), P = out*(Cin//g)*kh*kw.
    -> (B, fh, fw, oh, ow, out_channels)."""
    b, fh, fw, h, wd, cin = xp.shape
    kh, kw = kernel_size
    sh, sw = stride
    oh = (h - kh) // sh + 1
    ow = (wd - kw) // sw + 1
    if groups == cin and out_channels == cin and (sh, sw) == (1, 1):
        return patch_depthwise_valid(xp, w, kernel_size)
    if (kh, kw) == (1, 1) and (sh, sw) == (1, 1):
        return patch_pointwise(xp, w, out_channels, groups)
    # im2col: windows (B, fh, fw, oh, ow, kh, kw, Cin)
    cols = jnp.stack([
        jnp.stack([xp[:, :, :, di:di + oh * sh:sh, dj:dj + ow * sw:sw, :]
                   for dj in range(kw)], axis=-2)
        for di in range(kh)], axis=-3)
    cpg = cin // groups
    opg = out_channels // groups
    wk = w.reshape(b, fh, fw, groups, opg, cpg, kh, kw).astype(xp.dtype)
    cg = cols.reshape(b, fh, fw, oh, ow, kh, kw, groups, cpg)
    out = jnp.einsum("bfghwklnc,bfgnockl->bfghwno", cg, wk)
    return out.reshape(b, fh, fw, oh, ow, out_channels)


def patch_batch_norm(xp, scale, bias, mean, var, *, eps=1e-5, training=False,
                     momentum=0.1):
    """BatchNorm over the patch batch — the reference normalizes the reshaped
    (b*fh*fw, C, h, w) tensor (hyperseg_v1_0.py:352,360,366), i.e. stats over
    batch, patch-grid, and within-patch spatial axes. In the patch-blocked
    layout that is axes (0,1,2,3,4); eval mode is a plain running-stats affine.
    """
    if not training:
        return F.batch_norm(xp, scale, bias, mean, var, eps=eps), mean, var
    y, new_mean, new_var, _, _ = F.batch_norm_train(
        xp, scale, bias, mean, var, eps=eps, momentum=momentum,
        reduce_axes=(0, 1, 2, 3, 4))
    return y, new_mean, new_var
