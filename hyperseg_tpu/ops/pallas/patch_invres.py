"""Fused patch-wise inverted-residual Pallas TPU kernel.

The HyperSeg decoder's k=3 levels (HyperPatchInvertedResidual,
hyperseg_v1_0.py:281-376) run three dynamic convolutions per patch:
1x1 expand -> 3x3 depthwise -> 1x1 project, with eval-mode BN + ReLU6 between
stages. The XLA fallback (ops/patch.py) materializes the halo-patch tensor
(B, fh, fw, ph+2, pw+2, C) and the expanded hidden tensor in HBM — with
(sublane, lane) tiling that layout pads ~5x (18 sublanes -> 24, 34/68 lanes
-> 128), the dominant HBM traffic of the whole network at batch > 1.

This kernel reads the reflect-padded *full map* directly: each grid cell
receives its band through four overlapping views of the same array (main
rows/cols plus 8-row / 8-col tail blocks and a corner block — BlockSpec
index maps can only step in whole blocks, so the 2-pixel halo rides an
8-aligned tail read; same trick as ops/pallas/mbconv.py dw_phase), assembles
the per-patch halo windows in VMEM, and runs the three stages as fw-batched
MXU matmuls and VPU taps. Neither the 6D patch tensor nor the expanded
hidden tensor ever exists in HBM: traffic is x (~1.5x read) + weights + out.

Interface contract matches the lax oracle exactly (tests/test_pallas.py):
inputs are the *unpadded* feature map and the flat per-patch weight vectors;
BN is eval-mode (running stats), folded to scale/bias in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl


# Stage-1/3 matmuls as rank-4 batched dots over the unmerged (fw, kh, kw, c)
# windows instead of merged (fw, kh*kw, c) operands — skips four in-VMEM
# sublane relayouts per cell if Mosaic lowers the extra leading dim as a loop.
# OFF by measurement (tools/bench_invres.py, v5e): loses at every shape that
# compiles (b8 M_l3 1.84 vs 1.76 ms; b1 M_l3 0.34 vs 0.30) and the Mosaic
# compile intermittently 500s at level-4 shapes.
RANK4_DOT = False

# Write the output through a rank-6 (B, fh, ph, fw, pw, C) out_spec so the
# kernel stores (ph, chunk, pw, C) directly — skipping the in-VMEM
# (fw, pw) lane-merge reshape of the rank-5 form. The HBM bytes/layout are
# identical (the final XLA reshape to (B, H, W, C) is free either way).
# A/B lever (tools/bench_invres.py). OFF by measurement (v5e): ties the
# rank-5 store at level 4 (b8 M_l4 5.644 vs 5.647 ms) but loses 25% at
# level 3 (b8 M_l3 2.20 vs 1.76 ms) — the narrow pw lane store fragments.
OUT6D = False

# Generate the per-patch weights INSIDE the kernel from the routed signal
# slice and the (VMEM-resident) signal2weights matrix — one small matmul per
# grid cell — instead of reading the pre-generated (B, fh, fw, ~5k) weight
# tensor from HBM. Eliminates the generated-weight HBM round-trip
# (hyperseg_v1_0.py:321-326 generation feeding :328-370 consumption) AND the
# XLA-side w1/w2/w3 relayout transposes. ON by measurement (v5e, full-model
# img/s fused vs plain: M b8 392.8/391.2, S-camvid b8 369.4/373.5, L-camvid
# b1 139.7/140.5, b8 144.0/142.9 — a tie within ±1.1%): at equal speed the
# fused form is preferred because the (B, fh, fw, P) generated-weight tensor
# (~10 MB/img at M level 4) never exists in HBM.
S2W_FUSED = True

# V01-exact fused kernel (expand with row-neighbor halo weights + dw + proj
# in one cell; see _kernel_v01). Dispatched by V01InvResUnit under the same
# batch policy as the v1_0 kernel. OFF by measurement (v5e, 2026-08-19,
# tools/bench_all.py l_voc with/without): with the kernel admitted, the
# whole-model compile fails on the real chip (Mosaic remote_compile HTTP 500,
# tpu_compile_helper exit 1 — same lowering failure family as the stem's
# SEL_GATHER variant) at BOTH b1 and b8; the fallback (gather/fullmap mix)
# delivers b1 301.0 / b8 212.9 img/s. Interpret-mode parity still passes
# (tests/test_pallas.py) so the kernel stays maintained as a formulation
# reference until a Mosaic release lowers it.
V01_KERNEL = False

# Lane-packing (round-3 item 10): pack g patches onto the 128-lane axis
# (block-diagonal stage-1/3 weights built XLA-side, lane-dense depthwise
# taps, group-major store un-interleaved XLA-side). ON, g=4, by measurement
# (v5e, 2026-08-19): isolated (tools/bench_invres.py), pack4 beats the base
# fused kernel at EVERY decoder shape, b1 and b8 — b1 M_l4 0.492 vs 0.662 ms,
# L_l5 2.010 vs 3.437; b8 M_l4 4.255 vs 5.573, L_l4 6.373 vs 8.286 — and
# beats the XLA gather at b1 on 6/7 shapes. In-graph (tools/bench_pack.py,
# b1 img/s default->packed): L-camvid 142.4 -> 177.1-185.2, S-city 161.3 ->
# 214.7 with the b1 pixel-gate extension; M/S-camvid/L-voc within noise.
# The two 5D in-kernel transposes of the first formulation were the Mosaic
# remote-compile blocker; the shipped kernel only swaps LEADING dims.
# Values: 1 = off, int g = pack g (pads absorb lane misalignment; the
# wrapper lowers g to the largest divisor of the chunk), True/0 = one whole
# lane tile (128/hidden) when hidden divides 128.
LANE_PACK = 4

# Lane packing INSIDE the s2w-fused kernel (in-kernel block-diagonal
# assembly of the VMEM-generated weights, _kernel_s2w_packed). OFF by
# measurement (v5e, 2026-08-19, tools/bench_pack.py): the whole-model
# compile Mosaic-500s at most production shapes (M/S-camvid/L-camvid,
# hidden 42-68) though it compiles and wins at S-city's (hidden 28/52,
# b1 161.4 -> 203.4 img/s). Interpret parity passes everywhere
# (tests/test_pallas.py), so the kernel stays maintained; big-map units
# instead reach the packed NON-s2w kernel via the s2w dispatch deferral
# (decoder._s2w_fused_ok), which captures the same win with an XLA-side
# generation matmul.
S2W_LANE_PACK = 1


def _lane_pad(n, lane=128):
    """Round n up to a whole number of 128-lane tiles (Mosaic only lowers
    in-VMEM lane-split reshapes whose minor size is tile-aligned)."""
    return ((n + lane - 1) // lane) * lane


def _pick_s2w_chunk(fw, kh, kw, cin, hidden, budget):
    """Largest patch-chunk for the fused-s2w kernel: must divide fw, be a
    multiple of 8 (the signal block's sublane dim) or fw itself, and keep the
    per-cell working set under budget. None when no chunk qualifies."""
    cands = [fw] + [c for c in range(8 * (fw // 8), 0, -8) if fw % c == 0]
    for c in cands:
        if c * kh * kw * max(cin, hidden) * 4 <= budget:
            return c
    return None


def _fold_bn(scale, bias, mean, var, eps):
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    s = scale.astype(jnp.float32) * inv
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return s, b


def _kernel(xm, xrt, xct, xcn, w1_ref, w2_ref, w3_ref, bn_ref, out_ref, *,
            ph, pw, fw, cin, hidden, out_ch, k, residual, act_max,
            rank4=False, out6d=False):
    """Grid cell = one (batch, patch-row, patch-chunk) band of `fw` patches:
    the band is assembled from the four overlapping full-map views, then the
    three stages run as fw-batched dot_generals (MXU) and row-wide depthwise
    taps (VPU) — no serial per-patch loop."""
    pad = k // 2
    kh = ph + 2 * pad
    kw = pw + 2 * pad
    s1 = bn_ref[0, :hidden]
    b1 = bn_ref[1, :hidden]
    s2 = bn_ref[2, :hidden]
    b2 = bn_ref[3, :hidden]
    s3 = bn_ref[4, :out_ch]
    b3 = bn_ref[5, :out_ch]

    # assemble the halo'd band (kh, fw*pw + 2*pad, cin) from the main block
    # plus the 8-aligned tail/corner reads (only their first 2*pad rows/cols
    # are real halo; the rest is over-read by alignment)
    right = jnp.concatenate([xct[0], xcn[0][:2 * pad]], axis=0)  # (kh, 8, c)
    band = jnp.concatenate(
        [jnp.concatenate([xm[0], xrt[0][:2 * pad]], axis=0),     # (kh, cw, c)
         right[:, :2 * pad]], axis=1)               # (kh, fw*pw + 2*pad, cin)

    # per-patch halo windows, fw-stacked: (fw, kh, kw, cin). Built from two
    # free reshapes + one concat + a leading-dim transpose (cheaper than fw
    # separate overlapping-slice copies): window g = band cols
    # [g*pw, g*pw + pw + 2*pad) = its own pw-block plus the next block's
    # first 2*pad cols, so the halo appends in column order.
    cwid = fw * pw
    main = band[:, :cwid].reshape(kh, fw, pw, cin)
    halo = jnp.pad(band[:, pw:], ((0, 0), (0, pw - 2 * pad), (0, 0)))
    halo = halo[:, :cwid].reshape(kh, fw, pw, cin)[:, :, :2 * pad]
    xp = jnp.transpose(jnp.concatenate([main, halo], axis=2), (1, 0, 2, 3))

    # stage 1: fw-batched (kh*kw, cin) @ (cin, hidden). rank4 keeps the
    # operand as (fw, kh, kw, cin) and contracts axis 3 directly — the
    # (kh, kw) merge/split reshapes change the sublane dim, so skipping them
    # saves two in-VMEM relayouts per stage if Mosaic lowers the rank-4 dot
    # natively (A/B: tools/bench_invres.py).
    if rank4:
        h = lax.dot_general(
            xp.astype(jnp.bfloat16), w1_ref[0, 0].astype(jnp.bfloat16),
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (fw, kh, kw, hid)
        h = jnp.clip(h * s1 + b1, 0.0, act_max).astype(jnp.bfloat16)
    else:
        h = lax.dot_general(
            xp.reshape(fw, kh * kw, cin).astype(jnp.bfloat16),
            w1_ref[0, 0].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (fw, kh*kw, hid)
        h = jnp.clip(h * s1 + b1, 0.0, act_max)
        h = h.reshape(fw, kh, kw, hidden).astype(jnp.bfloat16)
    # stage 2: k x k depthwise VALID, all patches at once (f32 accumulate:
    # measured FASTER than bf16 taps — the VPU pack/unpack outweighs the
    # halved element count)
    w2 = w2_ref[0, 0]                                      # (fw, k, k, hidden)
    acc = jnp.zeros((fw, ph, pw, hidden), jnp.float32)
    for di in range(k):
        for dj in range(k):
            tap_w = w2[:, di, dj, :].astype(jnp.float32)[:, None, None, :]
            acc = acc + (h[:, di:di + ph, dj:dj + pw, :].astype(jnp.float32)
                         * tap_w)
    d = jnp.clip(acc * s2 + b2, 0.0, act_max).astype(jnp.bfloat16)
    # stage 3: fw-batched (ph*pw, hidden) @ (hidden, out)
    if rank4:
        o = lax.dot_general(
            d, w3_ref[0, 0].astype(jnp.bfloat16),
            dimension_numbers=(((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (fw, ph, pw, out)
        o = o * s3 + b3
        if residual:
            o = o + xp[:, pad:pad + ph, pad:pad + pw, :].astype(jnp.float32)
        o = o.astype(out_ref.dtype)
    else:
        o = lax.dot_general(
            d.reshape(fw, ph * pw, hidden),
            w3_ref[0, 0].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # (fw, ph*pw, out)
        o = o * s3 + b3
        if residual:
            ctr = xp[:, pad:pad + ph, pad:pad + pw, :]
            o = o + ctr.reshape(fw, ph * pw, cin).astype(jnp.float32)
        o = o.reshape(fw, ph, pw, out_ch).astype(out_ref.dtype)
    if out6d:
        # (fw, ph, pw, out) -> (ph, fw, pw, out): no lane-merge reshape
        out_ref[0, 0] = jnp.swapaxes(o, 0, 1)
    else:
        # (fw, ph, pw, out) -> (ph, fw*pw, out)
        out_ref[0, 0] = jnp.swapaxes(o, 0, 1).reshape(ph, fw * pw, out_ch)


def _kernel_packed(xm, xrt, xct, xcn, w1_ref, w2p_ref, w3_ref, bn_ref,
                   out_ref, *, ph, pw, fw, cin, hidden, out_ch, k, residual,
                   act_max, g):
    """Lane-packing experiment (round-3 item 10): groups of `g` patches ride
    the 128-lane axis together (g*hidden = whole lane tiles), so the nine
    depthwise tap FMAs run lane-DENSE (hidden=32 alone occupies 32/128 of
    every VPU register and VMEM tile) and the stage-1/3 contractions issue
    g-fold fewer MXU dispatches via block-diagonal weights (K: g*cin, N:
    g*hidden — filling the systolic array's contraction depth that a
    16-channel K leaves 8x idle). ALL packed operands arrive PRE-PACKED from
    the wrapper (w1/w3 block-diagonal, w2 lane-concatenated, bn g-tiled) so
    Mosaic only lowers dots, taps, and layout moves — the pad/stack
    block-diagonal construction lives in XLA where it is a free relayout."""
    pad = k // 2
    kh = ph + 2 * pad
    kw = pw + 2 * pad
    gc = fw // g
    gh = g * hidden
    go = g * out_ch
    s1 = bn_ref[0, :gh]
    b1 = bn_ref[1, :gh]
    s2 = bn_ref[2, :gh]
    b2 = bn_ref[3, :gh]
    s3 = bn_ref[4, :go]
    b3 = bn_ref[5, :go]

    # halo band + per-patch windows — identical assembly to _kernel
    right = jnp.concatenate([xct[0], xcn[0][:2 * pad]], axis=0)
    band = jnp.concatenate(
        [jnp.concatenate([xm[0], xrt[0][:2 * pad]], axis=0),
         right[:, :2 * pad]], axis=1)
    cwid = fw * pw
    main = band[:, :cwid].reshape(kh, fw, pw, cin)
    halo = jnp.pad(band[:, pw:], ((0, 0), (0, pw - 2 * pad), (0, 0)))
    halo = halo[:, :cwid].reshape(kh, fw, pw, cin)[:, :, :2 * pad]
    win = jnp.concatenate([main, halo], axis=2)            # (kh, fw, kw, cin)
    # packed operand: group member j's channels at lanes [j*cin, (j+1)*cin)
    # — built by per-member slice + lane concat and a LEADING-dim swap only
    # (Mosaic lowers leading-dim permutes as loop reindexing; a transpose
    # that crosses into the minor two dims does not lower on this toolchain)
    wing = win.reshape(kh, gc, g, kw, cin)
    xpk = jnp.concatenate([wing[:, :, j] for j in range(g)],
                          axis=-1)                         # (kh, gc, kw, g*c)
    xpk = jnp.swapaxes(xpk, 0, 1)                          # (gc, kh, kw, g*c)

    # stage 1: block-diagonal contraction (K: g*cin, N: g*hidden). Mosaic's
    # tpu.matmul only lowers a SINGLE contracting dim, so the (g, cin) pair
    # is merged into one g*cin axis on both operands.
    h = lax.dot_general(
        xpk.reshape(gc, kh * kw, g * cin).astype(jnp.bfloat16),
        w1_ref[0, 0].astype(jnp.bfloat16),                 # (gc, g*cin, g*h)
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (gc, kh*kw, g*h)
    h = jnp.clip(h * s1 + b1, 0.0, act_max)
    h = h.reshape(gc, kh, kw, gh).astype(jnp.bfloat16)

    # stage 2: lane-dense taps (g patches' hidden channels in each vector)
    w2 = w2p_ref[0, 0]                                     # (gc, k, k, g*h)
    acc = jnp.zeros((gc, ph, pw, gh), jnp.float32)
    for di in range(k):
        for dj in range(k):
            tap_w = w2[:, di, dj, :].astype(jnp.float32)[:, None, None, :]
            acc = acc + (h[:, di:di + ph, dj:dj + pw, :].astype(jnp.float32)
                         * tap_w)
    d = jnp.clip(acc * s2 + b2, 0.0, act_max).astype(jnp.bfloat16)

    # stage 3: block-diagonal (g*hidden, g*out) — contraction stays on the
    # already-merged lane dim, no lane splits
    o = lax.dot_general(
        d.reshape(gc, ph * pw, gh),
        w3_ref[0, 0].astype(jnp.bfloat16),                 # (gc, g*h, g*out)
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (gc, ph*pw, g*o)
    o = o * s3 + b3
    if residual:
        ctr = xpk[:, pad:pad + ph, pad:pad + pw]           # (gc, ph, pw, g*c)
        o = o + ctr.reshape(gc, ph * pw, g * cin).astype(jnp.float32)
    # store GROUP-MAJOR (gc, ph, pw, g*out) — no in-kernel unpack transpose;
    # the wrapper un-interleaves in XLA where the relayout is free
    out_ref[0, 0] = o.reshape(gc, ph, pw, g * out_ch).astype(out_ref.dtype)


def _kernel_s2w(xm, xrt, xct, xcn, s_ref, d1_ref, d2_ref, d3_ref, bn_ref,
                out_ref, *, ph, pw, fw, cin, hidden, out_ch, k, residual,
                act_max, out6d=False):
    """Like _kernel, but the per-patch weights are GENERATED in VMEM from the
    routed signal slice: gen = s_cell @ dN (one small matmul per stage; the
    depthwise taps generate per-tap to avoid strided lane extracts). The
    (B, fh, fw, P) weight tensor never exists — HBM sees only x, s (tiny),
    and the signal2weights matrices (VMEM-resident, constant index map).
    Matches hyperseg_v1_0.py:321-326 (generation) feeding :328-370."""
    pad = k // 2
    kh = ph + 2 * pad
    kw = pw + 2 * pad
    s1 = bn_ref[0, :hidden]
    b1 = bn_ref[1, :hidden]
    s2 = bn_ref[2, :hidden]
    b2 = bn_ref[3, :hidden]
    s3 = bn_ref[4, :out_ch]
    b3 = bn_ref[5, :out_ch]

    # halo band assembly — identical to _kernel
    right = jnp.concatenate([xct[0], xcn[0][:2 * pad]], axis=0)
    band = jnp.concatenate(
        [jnp.concatenate([xm[0], xrt[0][:2 * pad]], axis=0),
         right[:, :2 * pad]], axis=1)
    cwid = fw * pw
    main = band[:, :cwid].reshape(kh, fw, pw, cin)
    halo = jnp.pad(band[:, pw:], ((0, 0), (0, pw - 2 * pad), (0, 0)))
    halo = halo[:, :cwid].reshape(kh, fw, pw, cin)[:, :, :2 * pad]
    xp = jnp.transpose(jnp.concatenate([main, halo], axis=2), (1, 0, 2, 3))

    s_cell = s_ref[0, 0].astype(jnp.bfloat16)               # (fw, sig)
    hp = _lane_pad(hidden)  # generation lane width (Mosaic in-VMEM reshapes
    # that split the lane dim only lower when the minor size is a whole
    # number of 128-lane tiles — measured 2026-08-18: hidden=128 compiles,
    # 32/42/68 all fail remote_compile)

    # stage 1: generate w1 = s @ d1 -> (fw, cin*hp) -> (fw, cin, hp)[:hidden]
    g1 = lax.dot_general(s_cell, d1_ref[...].astype(jnp.bfloat16),
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    w1 = g1.reshape(fw, cin, hp)[:, :, :hidden].astype(jnp.bfloat16)
    h = lax.dot_general(
        xp.reshape(fw, kh * kw, cin).astype(jnp.bfloat16), w1,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (fw, kh*kw, hid)
    h = jnp.clip(h * s1 + b1, 0.0, act_max)
    h = h.reshape(fw, kh, kw, hidden).astype(jnp.bfloat16)

    # stage 2: k*k depthwise taps, each tap's weights generated on the spot:
    # tap(t) = s @ d2[t] -> (fw, hidden); no strided extract from a flat gen
    acc = jnp.zeros((fw, ph, pw, hidden), jnp.float32)
    for di in range(k):
        for dj in range(k):
            tap = lax.dot_general(
                s_cell, d2_ref[di * k + dj].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (fw, hidden)
            acc = acc + (h[:, di:di + ph, dj:dj + pw, :].astype(jnp.float32)
                         * tap[:, None, None, :])
    d = jnp.clip(acc * s2 + b2, 0.0, act_max).astype(jnp.bfloat16)

    # stage 3: generate TRANSPOSED, w3t = s @ d3t -> (fw, out*hp) ->
    # (fw, out, hp)[:hidden]; the dot then contracts hidden on the lane dim
    # of both operands (A @ B^T, the MXU-native form) — transposed generation
    # pads out*hp instead of hidden*out_pad, the cheaper padding since
    # out <= hidden at every decoder level
    g3 = lax.dot_general(s_cell, d3_ref[...].astype(jnp.bfloat16),
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    w3t = g3.reshape(fw, out_ch, hp)[:, :, :hidden].astype(jnp.bfloat16)
    o = lax.dot_general(
        d.reshape(fw, ph * pw, hidden), w3t,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # (fw, ph*pw, out)
    o = o * s3 + b3
    if residual:
        ctr = xp[:, pad:pad + ph, pad:pad + pw, :]
        o = o + ctr.reshape(fw, ph * pw, cin).astype(jnp.float32)
    o = o.reshape(fw, ph, pw, out_ch).astype(out_ref.dtype)
    if out6d:
        out_ref[0, 0] = jnp.swapaxes(o, 0, 1)
    else:
        out_ref[0, 0] = jnp.swapaxes(o, 0, 1).reshape(ph, fw * pw, out_ch)


def _kernel_s2w_packed(xm, xrt, xct, xcn, s_ref, d1_ref, d2_ref, d3_ref,
                       bn_ref, out_ref, *, ph, pw, fw, cin, hidden, out_ch,
                       k, residual, act_max, g):
    """Lane-packed + s2w-fused: weights are GENERATED in VMEM (as in
    _kernel_s2w — the (B, fh, fw, P) tensor never exists) and then assembled
    into the packed block-diagonal forms IN-KERNEL. The assembly uses only
    lane-axis pads/concats and leading-dim reshapes — the constructs the
    compiled packed kernel already proves Mosaic lowers (its xpk concat sits
    at the same unaligned lane offsets); the 5D transposes that killed the
    first packed formulation stay banished. bn rows arrive g-tiled."""
    pad = k // 2
    kh = ph + 2 * pad
    kw = pw + 2 * pad
    gc = fw // g
    gh = g * hidden
    go = g * out_ch
    s1 = bn_ref[0, :gh]
    b1 = bn_ref[1, :gh]
    s2 = bn_ref[2, :gh]
    b2 = bn_ref[3, :gh]
    s3 = bn_ref[4, :go]
    b3 = bn_ref[5, :go]

    # halo band + packed window — identical to _kernel_packed
    right = jnp.concatenate([xct[0], xcn[0][:2 * pad]], axis=0)
    band = jnp.concatenate(
        [jnp.concatenate([xm[0], xrt[0][:2 * pad]], axis=0),
         right[:, :2 * pad]], axis=1)
    cwid = fw * pw
    main = band[:, :cwid].reshape(kh, fw, pw, cin)
    halo = jnp.pad(band[:, pw:], ((0, 0), (0, pw - 2 * pad), (0, 0)))
    halo = halo[:, :cwid].reshape(kh, fw, pw, cin)[:, :, :2 * pad]
    win = jnp.concatenate([main, halo], axis=2)            # (kh, fw, kw, cin)
    wing = win.reshape(kh, gc, g, kw, cin)
    xpk = jnp.concatenate([wing[:, :, j] for j in range(g)],
                          axis=-1)                         # (kh, gc, kw, g*c)
    xpk = jnp.swapaxes(xpk, 0, 1)                          # (gc, kh, kw, g*c)

    s_cell = s_ref[0, 0].astype(jnp.bfloat16)              # (fw, sig)
    hp = _lane_pad(hidden)

    # stage 1: generate w1 (as _kernel_s2w), then in-kernel block-diagonal
    g1 = lax.dot_general(s_cell, d1_ref[...].astype(jnp.bfloat16),
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    w1 = g1.reshape(fw, cin, hp)[:, :, :hidden].astype(jnp.bfloat16)
    w1g = w1.reshape(gc, g, cin, hidden)
    w1bd = jnp.concatenate(
        [jnp.pad(w1g[:, j], ((0, 0), (0, 0),
                             (j * hidden, (g - 1 - j) * hidden)))
         for j in range(g)], axis=1)                       # (gc, g*cin, g*h)
    h = lax.dot_general(
        xpk.reshape(gc, kh * kw, g * cin).astype(jnp.bfloat16), w1bd,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (gc, kh*kw, g*h)
    h = jnp.clip(h * s1 + b1, 0.0, act_max)
    h = h.reshape(gc, kh, kw, gh).astype(jnp.bfloat16)

    # stage 2: per-tap generation, lane-concatenated per group
    acc = jnp.zeros((gc, ph, pw, gh), jnp.float32)
    for di in range(k):
        for dj in range(k):
            tap = lax.dot_general(
                s_cell, d2_ref[di * k + dj].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (fw, hidden)
            tapg = tap.reshape(gc, g, hidden)
            tapp = jnp.concatenate([tapg[:, j] for j in range(g)],
                                   axis=-1)                 # (gc, g*hidden)
            acc = acc + (h[:, di:di + ph, dj:dj + pw, :].astype(jnp.float32)
                         * tapp[:, None, None, :])
    d = jnp.clip(acc * s2 + b2, 0.0, act_max).astype(jnp.bfloat16)

    # stage 3: transposed generation (as _kernel_s2w), block-diagonal of the
    # TRANSPOSED form — the dot contracts g*hidden on the lane dim of both
    # operands (A @ B^T, MXU-native)
    g3 = lax.dot_general(s_cell, d3_ref[...].astype(jnp.bfloat16),
                         dimension_numbers=(((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    w3t = g3.reshape(fw, out_ch, hp)[:, :, :hidden].astype(jnp.bfloat16)
    w3tg = w3t.reshape(gc, g, out_ch, hidden)
    w3tbd = jnp.concatenate(
        [jnp.pad(w3tg[:, j], ((0, 0), (0, 0),
                              (j * hidden, (g - 1 - j) * hidden)))
         for j in range(g)], axis=1)                       # (gc, g*out, g*h)
    o = lax.dot_general(
        d.reshape(gc, ph * pw, gh), w3tbd,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (gc, ph*pw, g*o)
    o = o * s3 + b3
    if residual:
        ctr = xpk[:, pad:pad + ph, pad:pad + pw]
        o = o + ctr.reshape(gc, ph * pw, g * cin).astype(jnp.float32)
    out_ref[0, 0] = o.reshape(gc, ph, pw, go).astype(out_ref.dtype)


def patch_inverted_residual_s2w_fused(x, s, dense, *, hidden, out_ch, kernel=3,
                                      bn1, bn2, bn3, eps=1e-5, act_max=6.0,
                                      padding_mode="reflect", chunk=None,
                                      out6d=None, lane_pack=None,
                                      interpret=False):
    """Fully fused form: x (B, H, W, Cin); s (B, fh, fw, sig) — the unit's
    ROUTED signal slice; dense (sig, >=P) — the signal2weights matrix in its
    dense (block-diagonal for groups > 1) form, columns [:P] live. Generated
    filters never round-trip HBM (BASELINE north star). Returns
    (B, H, W, out_ch); bit-comparable to patch_inverted_residual_fused(x,
    apply_signal2weights(...)) up to matmul association."""
    b, hgt, wid, cin = x.shape
    _, fh, fw, sig = s.shape
    ph, pw = hgt // fh, wid // fw
    k = kernel
    pad = k // 2
    residual = (cin == out_ch)
    assert ph % 8 == 0 and pw % 8 == 0 and 2 * pad <= 8

    r1 = cin * hidden
    r2 = r1 + hidden * k * k
    P = r2 + hidden * out_ch
    dense = dense[:, :P]
    hp = _lane_pad(hidden)
    # per-stage matrix layouts chosen so the kernel's post-matmul reshapes
    # only SPLIT the lane dim into whole 128-lane tiles — Mosaic rejects
    # lane splits with unaligned minors (reference flat layout is
    # stage-major, hidden-major within stage, hyperseg_v1_0.py:301-309):
    #   d1:  (sig, cin*hp)   -> gen reshapes to (fw, cin, hp)[..., :hidden]
    #   d2:  (k*k, sig, hid) -> per-tap generation, no reshape
    #   d3t: (sig, out*hp)   -> gen reshapes to (fw, out, hp)[..., :hidden]
    #                           (transposed: the stage-3 dot contracts hidden
    #                           on the lane dim of both operands)
    pad_h = ((0, 0), (0, 0), (0, hp - hidden))
    d1 = dense[:, :r1].reshape(sig, hidden, cin)
    d1 = jnp.pad(jnp.swapaxes(d1, 1, 2), pad_h).reshape(sig, cin * hp)
    d2 = dense[:, r1:r2].reshape(sig, hidden, k * k)
    d2 = jnp.moveaxis(d2, 2, 0)                              # (k*k, sig, hid)
    d3 = dense[:, r2:].reshape(sig, out_ch, hidden)
    d3 = jnp.pad(d3, pad_h).reshape(sig, out_ch * hp)

    s1, b1 = _fold_bn(*bn1, eps)
    s2, b2 = _fold_bn(*bn2, eps)
    s3, b3 = _fold_bn(*bn3, eps)
    maxc = max(hidden, out_ch)

    def padv(v):
        return jnp.pad(v, (0, maxc - v.shape[0]))

    bn_pack = jnp.stack([padv(s1), padv(b1), padv(s2), padv(b2),
                         padv(s3), padv(b3)])

    from hyperseg_tpu.nn import functional as F
    xpad = F.pad2d(x, ((pad, pad), (pad, pad)), mode=padding_mode)
    xpad = jnp.pad(xpad, ((0, 0), (0, 8 - 2 * pad), (0, 8 - 2 * pad), (0, 0)))

    kh, kw = ph + 2 * pad, pw + 2 * pad
    itemsize = np.dtype(x.dtype).itemsize
    # the resident dN matrices are live for the whole kernel — subtract them
    # in full from the per-cell working budget
    dense_bytes = (d1.size + d2.size + d3.size) * itemsize
    budget = (2_500_000 if itemsize <= 2 else 1_500_000) - dense_bytes
    if interpret:
        budget = float("inf")  # no VMEM on the interpreter
    if chunk is None:
        chunk = _pick_s2w_chunk(fw, kh, kw, cin, hidden, budget)
    assert chunk is not None and fw % chunk == 0
    nchunks = fw // chunk
    cw = chunk * pw

    if out6d is None:
        out6d = OUT6D
    if lane_pack is None:
        lane_pack = S2W_LANE_PACK
    g = ((128 // hidden if 128 % hidden == 0 else 1)
         if lane_pack is True or lane_pack == 0 else int(lane_pack))
    while g > 1 and chunk % g:
        g -= 1
    if g > 1 and not out6d:
        gmax = g * maxc

        def tilev(v):
            return jnp.pad(jnp.tile(v, g), (0, gmax - g * v.shape[0]))

        bn_pack_g = jnp.stack([tilev(s1), tilev(b1), tilev(s2), tilev(b2),
                               tilev(s3), tilev(b3)])
        kern = functools.partial(
            _kernel_s2w_packed, ph=ph, pw=pw, fw=chunk, cin=cin,
            hidden=hidden, out_ch=out_ch, k=k, residual=residual,
            act_max=act_max, g=g)
        out = pl.pallas_call(
            kern,
            grid=(b, fh, nchunks),
            in_specs=[
                pl.BlockSpec((1, ph, cw, cin), lambda bi, f, c: (bi, f, c, 0)),
                pl.BlockSpec((1, 8, cw, cin),
                             lambda bi, f, c: (bi, (f + 1) * ph // 8, c, 0)),
                pl.BlockSpec((1, ph, 8, cin),
                             lambda bi, f, c: (bi, f, (c + 1) * cw // 8, 0)),
                pl.BlockSpec((1, 8, 8, cin),
                             lambda bi, f, c: (bi, (f + 1) * ph // 8,
                                               (c + 1) * cw // 8, 0)),
                pl.BlockSpec((1, 1, chunk, sig),
                             lambda bi, f, c: (bi, f, c, 0)),
                pl.BlockSpec((sig, cin * hp), lambda bi, f, c: (0, 0)),
                pl.BlockSpec((k * k, sig, hidden), lambda bi, f, c: (0, 0, 0)),
                pl.BlockSpec((sig, out_ch * hp), lambda bi, f, c: (0, 0)),
                pl.BlockSpec((6, gmax), lambda bi, f, c: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, chunk // g, ph, pw, g * out_ch),
                                   lambda bi, f, c: (bi, f, c, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (b, fh, fw // g, ph, pw, g * out_ch), x.dtype),
            interpret=interpret,
        )(xpad, xpad, xpad, xpad, s.astype(x.dtype), d1.astype(x.dtype),
          d2.astype(x.dtype), d3.astype(x.dtype), bn_pack_g)
        out = out.reshape(b, fh, fw // g, ph, pw, g, out_ch)
        out = jnp.transpose(out, (0, 1, 3, 2, 5, 4, 6))
        return out.reshape(b, hgt, wid, out_ch)
    kern = functools.partial(
        _kernel_s2w, ph=ph, pw=pw, fw=chunk, cin=cin, hidden=hidden,
        out_ch=out_ch, k=k, residual=residual, act_max=act_max, out6d=out6d)

    out = pl.pallas_call(
        kern,
        grid=(b, fh, nchunks),
        in_specs=[
            pl.BlockSpec((1, ph, cw, cin), lambda bi, f, c: (bi, f, c, 0)),
            pl.BlockSpec((1, 8, cw, cin),
                         lambda bi, f, c: (bi, (f + 1) * ph // 8, c, 0)),
            pl.BlockSpec((1, ph, 8, cin),
                         lambda bi, f, c: (bi, f, (c + 1) * cw // 8, 0)),
            pl.BlockSpec((1, 8, 8, cin),
                         lambda bi, f, c: (bi, (f + 1) * ph // 8,
                                           (c + 1) * cw // 8, 0)),
            pl.BlockSpec((1, 1, chunk, sig), lambda bi, f, c: (bi, f, c, 0)),
            pl.BlockSpec((sig, cin * hp), lambda bi, f, c: (0, 0)),
            pl.BlockSpec((k * k, sig, hidden), lambda bi, f, c: (0, 0, 0)),
            pl.BlockSpec((sig, out_ch * hp), lambda bi, f, c: (0, 0)),
            pl.BlockSpec((6, maxc), lambda bi, f, c: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, 1, ph, chunk, pw, out_ch),
                                lambda bi, f, c: (bi, f, 0, c, 0, 0)) if out6d
                   else pl.BlockSpec((1, 1, ph, cw, out_ch),
                                     lambda bi, f, c: (bi, f, 0, c, 0))),
        out_shape=(jax.ShapeDtypeStruct((b, fh, ph, fw, pw, out_ch), x.dtype)
                   if out6d
                   else jax.ShapeDtypeStruct((b, fh, ph, wid, out_ch),
                                             x.dtype)),
        interpret=interpret,
    )(xpad, xpad, xpad, xpad, s.astype(x.dtype), d1.astype(x.dtype),
      d2.astype(x.dtype), d3.astype(x.dtype), bn_pack)

    return out.reshape(b, hgt, wid, out_ch)


def s2w_supported(x_shape, s_shape, hyper_params, hidden, out_ch, kernel,
                  itemsize=2):
    """Feasibility gate for the fully fused s2w form: the plain kernel's
    shape gate, plus an 8-aligned (or full-width) patch chunk must exist
    once the VMEM-resident dense matrices are paid for."""
    b, hgt, wid, cin = x_shape
    _, fh, fw, sig = s_shape
    if not supported(x_shape, (b, fh, fw, hyper_params), kernel):
        return False
    ph, pw = hgt // fh, wid // fw
    pad = kernel // 2
    kh, kw = ph + 2 * pad, pw + 2 * pad
    hp = _lane_pad(hidden)
    dense_bytes = (sig * cin * hp + kernel * kernel * sig * hidden
                   + sig * out_ch * hp) * itemsize
    budget = (2_500_000 if itemsize <= 2 else 1_500_000) - dense_bytes
    return _pick_s2w_chunk(fw, kh, kw, cin, hidden, budget) is not None


def supported(x_shape, w_shape, kernel):
    """Shape gate for the fused kernel: the 2*pad halo must ride 8-aligned
    tail blocks, so patch dims must be multiples of 8 (true at the shipped
    configs; pyramid-TTA scales can violate it and fall back to XLA)."""
    _, hgt, wid, _ = x_shape
    _, fh, fw, _ = w_shape
    ph, pw = hgt // fh, wid // fw
    return (hgt % fh == 0 and wid % fw == 0 and ph % 8 == 0 and pw % 8 == 0
            and 2 * (kernel // 2) <= 8)


def _kernel_v01(xm, xrt, xct, xcn, w1_ref, w1u_ref, w1d_ref, w2_ref, w3_ref,
                bn_ref, out_ref, *, ph, pw, fw, cin, hidden, out_ch, k,
                residual, act_max):
    """V01 (hyperseg_v0_1.py:205-237) semantics: the three convs fold back to
    the FULL map between stages, so the depthwise halo pixels are the expand
    outputs of the NEIGHBORING patches (their weights), not the center
    patch's — unlike v1_0's patch-space pipeline (_kernel). One grid cell is
    a FULL patch row: the 1-px top/bottom halo rows of the hidden map are
    generated with the row-above/row-below patches' w1 (w1u/w1d), and the
    left/right halo columns are in-band reflect mirrors (full-width cell =>
    chunk edges are map edges). Semantically exact vs fullmap_pointwise +
    fullmap_depthwise + fullmap pointwise-project with eval-mode BN, at bf16
    MXU precision (inputs/weights are cast to bf16 for the dots; the XLA
    fullmap path computes in the input dtype, so parity tests use
    atol/rtol ~5e-2, not bit equality)."""
    pad = k // 2
    kh = ph + 2 * pad
    cwid = fw * pw
    s1 = bn_ref[0, :hidden]
    b1 = bn_ref[1, :hidden]
    s2 = bn_ref[2, :hidden]
    b2 = bn_ref[3, :hidden]
    s3 = bn_ref[4, :out_ch]
    b3 = bn_ref[5, :out_ch]

    # halo'd input band (kh, cwid + 2*pad, cin) — same assembly as _kernel
    right = jnp.concatenate([xct[0], xcn[0][:2 * pad]], axis=0)
    band = jnp.concatenate(
        [jnp.concatenate([xm[0], xrt[0][:2 * pad]], axis=0),
         right[:, :2 * pad]], axis=1)
    intr = band[:, pad:pad + cwid]                    # (kh, cwid, cin) interior

    def expand(rows, wref, n):
        # rows: (n, cwid, cin) of the map; wref: (fw, cin, hidden) per patch
        xp_ = jnp.transpose(rows.reshape(n, fw, pw, cin), (1, 0, 2, 3))
        hh = lax.dot_general(
            xp_.reshape(fw, n * pw, cin).astype(jnp.bfloat16),
            wref.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # (fw, n*pw, hidden)
        hh = jnp.clip(hh * s1 + b1, 0.0, act_max).astype(jnp.bfloat16)
        # back to band-row layout (n, cwid, hidden)
        return jnp.transpose(hh.reshape(fw, n, pw, hidden),
                             (1, 0, 2, 3)).reshape(n, cwid, hidden)

    hm = expand(intr[pad:pad + ph], w1_ref[0, 0], ph)     # own weights
    ht = expand(intr[:pad], w1u_ref[0, 0], pad)           # row f-1 weights
    hb = expand(intr[pad + ph:kh], w1d_ref[0, 0], pad)    # row f+1 weights
    hband = jnp.concatenate([ht, hm, hb], axis=0)         # (kh, cwid, hidden)
    # left/right halo cols: reflect mirrors of the hidden map (the cell spans
    # the full width, so both edges are map edges; np-style reflect => col -1
    # is col 1, col W is col W-2). pad == 1 only (k == 3 gate in supported).
    hbp = jnp.concatenate(
        [hband[:, 1:2], hband, hband[:, cwid - 2:cwid - 1]], axis=1)

    # per-patch overlapping windows (fw, kh, pw + 2*pad, hidden) — same
    # two-reshape trick as _kernel's input assembly
    hmain = hbp[:, :cwid].reshape(kh, fw, pw, hidden)
    hhalo = jnp.pad(hbp[:, pw:], ((0, 0), (0, pw - 2 * pad), (0, 0)))
    hhalo = hhalo[:, :cwid].reshape(kh, fw, pw, hidden)[:, :, :2 * pad]
    hwin = jnp.transpose(jnp.concatenate([hmain, hhalo], axis=2),
                         (1, 0, 2, 3))                 # (fw, kh, pw+2p, hid)

    w2 = w2_ref[0, 0]                                  # (fw, k, k, hidden)
    acc = jnp.zeros((fw, ph, pw, hidden), jnp.float32)
    for di in range(k):
        for dj in range(k):
            tap_w = w2[:, di, dj, :].astype(jnp.float32)[:, None, None, :]
            acc = acc + (hwin[:, di:di + ph, dj:dj + pw, :]
                         .astype(jnp.float32) * tap_w)
    d = jnp.clip(acc * s2 + b2, 0.0, act_max).astype(jnp.bfloat16)

    o = lax.dot_general(
        d.reshape(fw, ph * pw, hidden),
        w3_ref[0, 0].astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (fw, ph*pw, out)
    o = o * s3 + b3
    if residual:
        ctr = jnp.transpose(intr[pad:pad + ph].reshape(ph, fw, pw, cin),
                            (1, 0, 2, 3))
        o = o + ctr.reshape(fw, ph * pw, cin).astype(jnp.float32)
    o = o.reshape(fw, ph, pw, out_ch).astype(out_ref.dtype)
    out_ref[0, 0] = jnp.swapaxes(o, 0, 1).reshape(ph, fw * pw, out_ch)


def v01_supported(x_shape, w_shape, kernel, hidden=None, itemsize=2):
    """Shape gate for the V01 fused kernel: the plain kernel's alignment
    rules, pad == 1 (k == 3: the halo-mirror slices are written for 1 px),
    and a FULL patch row must fit the VMEM working set (the row-neighbor
    weight exchange needs chunk == fw; no column chunking). VMEM model
    calibrated against the compiler: Mosaic keeps all nine unrolled
    depthwise tap products live (each an f32 (fw, ph, pw, hidden) block), so
    the dominant term is ~10x that block plus the bf16 input/hidden bands —
    L-voc level 5 (fw=16, 32x32 patches, hidden=22) measures 19.2 MB against
    the 16 MB scoped limit and must fall back to XLA."""
    b, hgt, wid, cin = x_shape
    _, fh, fw, _ = w_shape
    if hgt % fh or wid % fw:
        return False
    ph, pw = hgt // fh, wid // fw
    if ph % 8 or pw % 8 or kernel != 3:
        return False
    hid = 2 * cin if hidden is None else hidden
    kh, cwid = ph + 2, fw * pw
    block = fw * ph * pw * hid * 4          # one f32 (fw, ph, pw, hidden)
    bands = kh * (cwid + 2) * (cin + 2 * hid) * itemsize
    return 10 * block + 2 * bands <= 14_000_000


def patch_inverted_residual_v01(x, w, *, hidden, out_ch, kernel=3,
                                bn1, bn2, bn3, eps=1e-5, act_max=6.0,
                                padding_mode="reflect", interpret=False):
    """V01-exact fused inverted residual: x (B, H, W, Cin); w (B, fh, fw, P)
    with the [out*in | C*k*k | out*hidden] per-subunit layout V01InvResUnit
    slices (identical to the v1_0 flat layout). Full-map-BN semantics: halo
    hidden pixels are generated with the NEIGHBOR row's w1 (see _kernel_v01).
    Returns (B, H, W, out_ch); bit-comparable to the three PatchConvUnits'
    fullmap forms (hyperseg_v0_1.py:205-237)."""
    b, hgt, wid, cin = x.shape
    _, fh, fw, P = w.shape
    ph, pw = hgt // fh, wid // fw
    k = kernel
    pad = k // 2
    residual = (cin == out_ch)
    # Validate with the TRUE hidden width and dtype itemsize (the dispatch
    # gate does the same) — the defaults (hidden=2*cin, itemsize=2) mis-size
    # the VMEM model whenever expand_ratio != 2 or inputs are f32.
    assert v01_supported(x.shape, w.shape, k, hidden=hidden,
                         itemsize=x.dtype.itemsize)
    assert padding_mode == "reflect"

    r1 = cin * hidden
    r2 = r1 + hidden * k * k
    w1 = w[..., :r1].reshape(b, fh, fw, hidden, cin)
    w1 = jnp.swapaxes(w1, -1, -2)                         # (.., cin, hidden)
    # row-neighbor w1 (edge rows clamp: the reflect halo row belongs to the
    # edge patch row itself)
    w1u = jnp.concatenate([w1[:, :1], w1[:, :-1]], axis=1)
    w1d = jnp.concatenate([w1[:, 1:], w1[:, -1:]], axis=1)
    w2 = w[..., r1:r2].reshape(b, fh, fw, hidden, k, k)
    w2 = jnp.moveaxis(w2, -3, -1)                         # (.., k, k, hidden)
    w3 = w[..., r2:].reshape(b, fh, fw, out_ch, hidden)
    w3 = jnp.swapaxes(w3, -1, -2)                         # (.., hidden, out)

    s1, b1 = _fold_bn(*bn1, eps)
    s2, b2 = _fold_bn(*bn2, eps)
    s3, b3 = _fold_bn(*bn3, eps)
    maxc = max(hidden, out_ch)

    def padv(v):
        return jnp.pad(v, (0, maxc - v.shape[0]))

    bn_pack = jnp.stack([padv(s1), padv(b1), padv(s2), padv(b2),
                         padv(s3), padv(b3)])

    from hyperseg_tpu.nn import functional as F
    xpad = F.pad2d(x, ((pad, pad), (pad, pad)), mode=padding_mode)
    xpad = jnp.pad(xpad, ((0, 0), (0, 8 - 2 * pad), (0, 8 - 2 * pad), (0, 0)))

    cw = fw * pw
    kern = functools.partial(
        _kernel_v01, ph=ph, pw=pw, fw=fw, cin=cin, hidden=hidden,
        out_ch=out_ch, k=k, residual=residual, act_max=act_max)

    out = pl.pallas_call(
        kern,
        grid=(b, fh),
        in_specs=[
            pl.BlockSpec((1, ph, cw, cin), lambda bi, f: (bi, f, 0, 0)),
            pl.BlockSpec((1, 8, cw, cin),
                         lambda bi, f: (bi, (f + 1) * ph // 8, 0, 0)),
            pl.BlockSpec((1, ph, 8, cin), lambda bi, f: (bi, f, cw // 8, 0)),
            pl.BlockSpec((1, 8, 8, cin),
                         lambda bi, f: (bi, (f + 1) * ph // 8, cw // 8, 0)),
            pl.BlockSpec((1, 1, fw, cin, hidden),
                         lambda bi, f: (bi, f, 0, 0, 0)),
            pl.BlockSpec((1, 1, fw, cin, hidden),
                         lambda bi, f: (bi, f, 0, 0, 0)),
            pl.BlockSpec((1, 1, fw, cin, hidden),
                         lambda bi, f: (bi, f, 0, 0, 0)),
            pl.BlockSpec((1, 1, fw, k, k, hidden),
                         lambda bi, f: (bi, f, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, fw, hidden, out_ch),
                         lambda bi, f: (bi, f, 0, 0, 0)),
            pl.BlockSpec((6, maxc), lambda bi, f: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ph, cw, out_ch),
                               lambda bi, f: (bi, f, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, fh, ph, wid, out_ch), x.dtype),
        interpret=interpret,
    )(xpad, xpad, xpad, xpad, w1, w1u, w1d, w2, w3, bn_pack)

    return out.reshape(b, hgt, wid, out_ch)


def patch_inverted_residual_fused(x, w, *, hidden, out_ch, kernel=3,
                                  bn1, bn2, bn3, eps=1e-5, act_max=6.0,
                                  padding_mode="reflect", chunk=None,
                                  rank4=None, out6d=None, lane_pack=None,
                                  interpret=False):
    """x: (B, H, W, Cin); w: (B, fh, fw, P) flat per-patch weights with the
    reference layout (in*hidden | hidden*k*k | hidden*out). bn*: tuples of
    (scale, bias, mean, var). Returns (B, H, W, out_ch)."""
    b, hgt, wid, cin = x.shape
    _, fh, fw, P = w.shape
    ph, pw = hgt // fh, wid // fw
    k = kernel
    pad = k // 2
    residual = (cin == out_ch)
    assert ph % 8 == 0 and pw % 8 == 0 and 2 * pad <= 8, (
        "halo rides 8-aligned tail blocks")

    r1 = cin * hidden
    r2 = r1 + hidden * k * k
    w1 = w[..., :r1].reshape(b, fh, fw, hidden, cin)
    w1 = jnp.swapaxes(w1, -1, -2)                         # (.., cin, hidden)
    w2 = w[..., r1:r2].reshape(b, fh, fw, hidden, k, k)
    w2 = jnp.moveaxis(w2, -3, -1)                         # (.., k, k, hidden)
    w3 = w[..., r2:].reshape(b, fh, fw, out_ch, hidden)
    w3 = jnp.swapaxes(w3, -1, -2)                         # (.., hidden, out)

    s1, b1 = _fold_bn(*bn1, eps)
    s2, b2 = _fold_bn(*bn2, eps)
    s3, b3 = _fold_bn(*bn3, eps)
    maxc = max(hidden, out_ch)

    def padv(v):
        return jnp.pad(v, (0, maxc - v.shape[0]))

    bn_pack = jnp.stack([padv(s1), padv(b1), padv(s2), padv(b2),
                         padv(s3), padv(b3)])              # (6, maxc) fp32

    # reflect-padded full map, then zero-pad bottom/right to keep the
    # 8-aligned tail reads in range (the zeros are over-read, never used)
    from hyperseg_tpu.nn import functional as F
    xpad = F.pad2d(x, ((pad, pad), (pad, pad)), mode=padding_mode)
    xpad = jnp.pad(xpad, ((0, 0), (0, 8 - 2 * pad), (0, 8 - 2 * pad), (0, 0)))
    # rows now hgt + 8, cols wid + 8

    # chunk the patch row so per-cell VMEM stays bounded (~2 MB of halo
    # patches per chunk incl. fp32 intermediates)
    kh, kw = ph + 2 * pad, pw + 2 * pad
    # budget shrinks for f32 inputs: the four full-map views and the output
    # block scale with itemsize (an f32 run of the b=8 CamVid-L4 shape
    # overflowed the 16 MB scoped VMEM by ~1 MB at the bf16 budget)
    budget = 2_500_000 if np.dtype(x.dtype).itemsize <= 2 else 1_500_000
    if chunk is None:
        chunk = fw
        while chunk > 1 and (chunk * kh * kw * max(cin, hidden) * 4 > budget
                             or fw % chunk != 0):
            chunk -= 1
    assert fw % chunk == 0
    nchunks = fw // chunk
    cw = chunk * pw

    if rank4 is None:
        rank4 = RANK4_DOT
    if out6d is None:
        out6d = OUT6D
    if lane_pack is None:
        lane_pack = LANE_PACK
        # in-graph pixel gate (v5e, 2026-08-19, tools/bench_pack.py +
        # single-flag A/B): on SMALL maps the XLA-side pack/unpack relayouts
        # eat the kernel gain — M b8 396.3 base vs 375.8 packed (its level 4,
        # 131k px, is not s2w-eligible and dispatches here) — while big maps
        # win large (L-camvid l4/l5, S-city l4: +26..31%). The isolated sweep
        # says pack4 wins at EVERY shape; in-graph relayout context decides,
        # same lesson as the stem. Threshold shared with the dispatch gates.
        if isinstance(lane_pack, int) and lane_pack > 1:
            from hyperseg_tpu.ops import pallas as pallas_cfg
            if hgt * wid < pallas_cfg.INVRES_PACK_MIN_PIXELS:
                lane_pack = 1
    # auto mode (True/0) only packs to exactly one lane tile; an explicit
    # integer g is honored at any alignment (pads absorb the remainder) but
    # lowered to the largest divisor of the chunk (pack2 still beats the
    # base kernel at every measured shape)
    g = ((128 // hidden if 128 % hidden == 0 else 1)
         if lane_pack is True or lane_pack == 0 else int(lane_pack))
    while g > 1 and chunk % g:
        g -= 1
    if g > 1 and not rank4 and not out6d:
        # ALL packed operands are built XLA-side (free relayouts) so the
        # kernel body is only dots + taps + layout moves:
        # depthwise taps: (.., chunk, k, k, hidden) -> (.., chunk//g, k, k,
        # g*hidden) — lane-concatenated per group
        w2p = w2.reshape(b, fh, fw // g, g, k, k, hidden)
        w2p = jnp.moveaxis(w2p, 3, 5).reshape(b, fh, fw // g, k, k,
                                              g * hidden)
        # stage-1/3 block-diagonals: group member j's (cin, hidden) block
        # sits at rows [j*cin, (j+1)*cin), cols [j*hidden, (j+1)*hidden)
        w1g = w1.reshape(b, fh, fw // g, g, cin, hidden)
        w1bd = jnp.concatenate(
            [jnp.pad(w1g[:, :, :, j],
                     ((0, 0),) * 3 + ((0, 0),
                                      (j * hidden, (g - 1 - j) * hidden)))
             for j in range(g)], axis=-2)     # (b, fh, fw//g, g*cin, g*h)
        w3g = w3.reshape(b, fh, fw // g, g, hidden, out_ch)
        w3bd = jnp.concatenate(
            [jnp.pad(w3g[:, :, :, j],
                     ((0, 0),) * 3 + ((0, 0),
                                      (j * out_ch, (g - 1 - j) * out_ch)))
             for j in range(g)], axis=-2)     # (b, fh, fw//g, g*h, g*out)
        # bn rows g-tiled to match the packed lane layout
        gmax = g * maxc

        def tilev(v):
            return jnp.pad(jnp.tile(v, g), (0, gmax - g * v.shape[0]))

        bn_pack_g = jnp.stack([tilev(s1), tilev(b1), tilev(s2), tilev(b2),
                               tilev(s3), tilev(b3)])       # (6, g*maxc)
        kern = functools.partial(
            _kernel_packed, ph=ph, pw=pw, fw=chunk, cin=cin, hidden=hidden,
            out_ch=out_ch, k=k, residual=residual, act_max=act_max, g=g)
        out = pl.pallas_call(
            kern,
            grid=(b, fh, nchunks),
            in_specs=[
                pl.BlockSpec((1, ph, cw, cin), lambda bi, f, c: (bi, f, c, 0)),
                pl.BlockSpec((1, 8, cw, cin),
                             lambda bi, f, c: (bi, (f + 1) * ph // 8, c, 0)),
                pl.BlockSpec((1, ph, 8, cin),
                             lambda bi, f, c: (bi, f, (c + 1) * cw // 8, 0)),
                pl.BlockSpec((1, 8, 8, cin),
                             lambda bi, f, c: (bi, (f + 1) * ph // 8,
                                               (c + 1) * cw // 8, 0)),
                pl.BlockSpec((1, 1, chunk // g, g * cin, g * hidden),
                             lambda bi, f, c: (bi, f, c, 0, 0)),
                pl.BlockSpec((1, 1, chunk // g, k, k, g * hidden),
                             lambda bi, f, c: (bi, f, c, 0, 0, 0)),
                pl.BlockSpec((1, 1, chunk // g, g * hidden, g * out_ch),
                             lambda bi, f, c: (bi, f, c, 0, 0)),
                pl.BlockSpec((6, gmax), lambda bi, f, c: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, chunk // g, ph, pw, g * out_ch),
                                   lambda bi, f, c: (bi, f, c, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (b, fh, fw // g, ph, pw, g * out_ch), x.dtype),
            interpret=interpret,
        )(xpad, xpad, xpad, xpad, w1bd, w2p, w3bd, bn_pack_g)
        # un-interleave the group-major store in XLA: fw index = gi*g + j
        out = out.reshape(b, fh, fw // g, ph, pw, g, out_ch)
        out = jnp.transpose(out, (0, 1, 3, 2, 5, 4, 6))
        return out.reshape(b, hgt, wid, out_ch)
    kern = functools.partial(
        _kernel, ph=ph, pw=pw, fw=chunk, cin=cin, hidden=hidden, out_ch=out_ch,
        k=k, residual=residual, act_max=act_max, rank4=rank4, out6d=out6d)

    out = pl.pallas_call(
        kern,
        grid=(b, fh, nchunks),
        in_specs=[
            # main rows/cols: [f*ph, f*ph+ph) x [c*cw, c*cw+cw)
            pl.BlockSpec((1, ph, cw, cin), lambda bi, f, c: (bi, f, c, 0)),
            # row tail: 8 rows starting at (f+1)*ph (first 2*pad are halo)
            pl.BlockSpec((1, 8, cw, cin),
                         lambda bi, f, c: (bi, (f + 1) * ph // 8, c, 0)),
            # col tail: 8 cols starting at (c+1)*cw
            pl.BlockSpec((1, ph, 8, cin),
                         lambda bi, f, c: (bi, f, (c + 1) * cw // 8, 0)),
            # corner: 8x8 at ((f+1)*ph, (c+1)*cw)
            pl.BlockSpec((1, 8, 8, cin),
                         lambda bi, f, c: (bi, (f + 1) * ph // 8,
                                           (c + 1) * cw // 8, 0)),
            pl.BlockSpec((1, 1, chunk, cin, hidden),
                         lambda bi, f, c: (bi, f, c, 0, 0)),
            pl.BlockSpec((1, 1, chunk, k, k, hidden),
                         lambda bi, f, c: (bi, f, c, 0, 0, 0)),
            pl.BlockSpec((1, 1, chunk, hidden, out_ch),
                         lambda bi, f, c: (bi, f, c, 0, 0)),
            pl.BlockSpec((6, maxc), lambda bi, f, c: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, 1, ph, chunk, pw, out_ch),
                                lambda bi, f, c: (bi, f, 0, c, 0, 0)) if out6d
                   else pl.BlockSpec((1, 1, ph, cw, out_ch),
                                     lambda bi, f, c: (bi, f, 0, c, 0))),
        out_shape=(jax.ShapeDtypeStruct((b, fh, ph, fw, pw, out_ch), x.dtype)
                   if out6d
                   else jax.ShapeDtypeStruct((b, fh, ph, wid, out_ch),
                                             x.dtype)),
        interpret=interpret,
    )(xpad, xpad, xpad, xpad, w1, w2, w3, bn_pack)

    return out.reshape(b, hgt, wid, out_ch)
