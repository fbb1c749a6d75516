"""Fused patch-wise inverted-residual Pallas TPU kernel.

The HyperSeg decoder's k=3 levels (HyperPatchInvertedResidual,
hyperseg_v1_0.py:281-376) run three dynamic convolutions per patch:
1x1 expand -> 3x3 depthwise -> 1x1 project, with eval-mode BN + ReLU6 between
stages. The XLA fallback (ops/patch.py) materializes the expanded halo-patch
tensor (B, fh, fw, ph+2, pw+2, hidden) in HBM and re-reads it per depthwise
tap — the dominant HBM traffic of the whole network. This kernel keeps the
expanded chain in VMEM: halo patches are pre-extracted once (27% duplication
at k=3, ph=16), each grid cell processes a chunk of one patch row with
fw-batched MXU matmuls and VPU taps, and only the final (ph, pw, out) tiles
are written back.

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


def _fold_bn(scale, bias, mean, var, eps):
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    s = scale.astype(jnp.float32) * inv
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return s, b


def _kernel(bands_ref, w1_ref, w2_ref, w3_ref, bn_ref, out_ref, *,
            ph, pw, fw, cin, hidden, out_ch, k, residual, act_max):
    """Grid cell = one (batch, patch-row) band, vectorized across the fw
    patches: the three stages run as fw-batched dot_generals (MXU) and
    row-wide depthwise taps (VPU) — no serial per-patch loop."""
    pad = k // 2
    kh = ph + 2 * pad
    kw = pw + 2 * pad
    s1 = bn_ref[0, :hidden]
    b1 = bn_ref[1, :hidden]
    s2 = bn_ref[2, :hidden]
    b2 = bn_ref[3, :hidden]
    s3 = bn_ref[4, :out_ch]
    b3 = bn_ref[5, :out_ch]

    xp = bands_ref[0, 0]                                   # (fw, kh, kw, cin)
    # stage 1: fw-batched (kh*kw, cin) @ (cin, hidden)
    h = lax.dot_general(
        xp.reshape(fw, kh * kw, cin).astype(jnp.bfloat16),
        w1_ref[0, 0].astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (fw, kh*kw, hidden)
    h = jnp.clip(h * s1 + b1, 0.0, act_max)
    h = h.reshape(fw, kh, kw, hidden).astype(jnp.bfloat16)
    # stage 2: k x k depthwise VALID, all patches at once
    w2 = w2_ref[0, 0]                                      # (fw, k, k, hidden)
    acc = jnp.zeros((fw, ph, pw, hidden), jnp.float32)
    for di in range(k):
        for dj in range(k):
            tap_w = w2[:, di, dj, :].astype(jnp.float32)[:, None, None, :]
            acc = acc + (h[:, di:di + ph, dj:dj + pw, :].astype(jnp.float32)
                         * tap_w)
    d = jnp.clip(acc * s2 + b2, 0.0, act_max).astype(jnp.bfloat16)
    # stage 3: fw-batched (ph*pw, hidden) @ (hidden, out)
    o = lax.dot_general(
        d.reshape(fw, ph * pw, hidden),
        w3_ref[0, 0].astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (fw, ph*pw, out)
    o = o * s3 + b3
    if residual:
        ctr = xp[:, pad:pad + ph, pad:pad + pw, :]
        o = o + ctr.reshape(fw, ph * pw, cin).astype(jnp.float32)
    o = o.reshape(fw, ph, pw, out_ch).astype(out_ref.dtype)
    # (fw, ph, pw, out) -> (ph, fw*pw, out)
    out_ref[0, 0] = jnp.swapaxes(o, 0, 1).reshape(ph, fw * pw, out_ch)


def patch_inverted_residual_fused(x, w, *, hidden, out_ch, kernel=3,
                                  bn1, bn2, bn3, eps=1e-5, act_max=6.0,
                                  padding_mode="reflect", interpret=False):
    """x: (B, H, W, Cin); w: (B, fh, fw, P) flat per-patch weights with the
    reference layout (in*hidden | hidden*k*k | hidden*out). bn*: tuples of
    (scale, bias, mean, var). Returns (B, H, W, out_ch)."""
    b, hgt, wid, cin = x.shape
    _, fh, fw, P = w.shape
    ph, pw = hgt // fh, wid // fw
    k = kernel
    pad = k // 2
    residual = (cin == out_ch)

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

    # pre-extracted overlapping halo patches (the XLA gather; ~27% duplicated
    # bytes at k=3, ph=16 — the expanded hidden tensor never touches HBM)
    from hyperseg_tpu.ops.patch import extract_patches_with_halo
    patches = extract_patches_with_halo(x, fh, fw, (pad, pad), mode=padding_mode)

    # chunk the patch row so per-cell VMEM stays bounded (~2 MB of halo
    # patches per chunk incl. fp32 intermediates)
    kh, kw = ph + 2 * pad, pw + 2 * pad
    itemsize = np.dtype(x.dtype).itemsize
    chunk = fw
    while chunk > 1 and (chunk * kh * kw * max(cin, hidden) * 4 > 2_500_000
                         or fw % chunk != 0):
        chunk -= 1
    nchunks = fw // chunk

    kern = functools.partial(
        _kernel, ph=ph, pw=pw, fw=chunk, cin=cin, hidden=hidden, out_ch=out_ch,
        k=k, residual=residual, act_max=act_max)

    out = pl.pallas_call(
        kern,
        grid=(b, fh, nchunks),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, kh, kw, cin),
                         lambda bi, i, c: (bi, i, c, 0, 0, 0)),
            pl.BlockSpec((1, 1, chunk, cin, hidden),
                         lambda bi, i, c: (bi, i, c, 0, 0)),
            pl.BlockSpec((1, 1, chunk, k, k, hidden),
                         lambda bi, i, c: (bi, i, c, 0, 0, 0)),
            pl.BlockSpec((1, 1, chunk, hidden, out_ch),
                         lambda bi, i, c: (bi, i, c, 0, 0)),
            pl.BlockSpec((6, maxc), lambda bi, i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, ph, chunk * pw, out_ch),
                               lambda bi, i, c: (bi, i, 0, c, 0)),
        out_shape=jax.ShapeDtypeStruct((b, fh, ph, wid, out_ch), x.dtype),
        interpret=interpret,
    )(patches, w1, w2, w3, bn_pack)

    return out.reshape(b, hgt, wid, out_ch)
