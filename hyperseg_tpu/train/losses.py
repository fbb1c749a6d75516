"""Segmentation losses.

BootstrappedCrossEntropy mirrors losses/bootstrapped_ce_loss.py:8-40: per
image, keep only the hardest pixels — all pixels with loss > thresh if the
k-th largest exceeds thresh, else exactly the top-k — and average; batch mean
over images. jit-friendly: the data-dependent branch becomes a mask select
(top-k always computed via jax.lax.top_k on static shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Compute the per-pixel CE in class-major layout. NHWC logits with a small
# class count put C on the TPU lane dimension, so every elementwise pass over
# the (..., C) tensor pays a 128/C tiling-pad tax (6.7x for C=19) in both
# VMEM and HBM traffic — and the minor-dim take_along_axis gather is worse.
# Transposing once to (B, C, H, W) makes every subsequent pass lane-dense
# (lanes = W). Measured on v5e (tools/bench_loss.py, b16 Cityscapes-M shape,
# full bootstrapped CE fwd+bwd): select 135.7 -> 3.37 ms (40x), sort
# 146.1 -> 14.3 ms. Flag (not kwarg) so the training step and tests share
# one switch.
CE_CLASS_MAJOR = True


def softmax_cross_entropy(logits, labels, *, ignore_index=255, weight=None):
    """Per-pixel CE. logits: (..., C); labels: (...) int. Ignored pixels get 0
    loss (and a 0 mask you can reuse for normalization)."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    if CE_CLASS_MAJOR and logits.ndim == 4:
        # (B, H, W, C) -> (B, C, H, W); all reductions run over axis 1 on
        # lane-dense slices, and the label pick is a select+sum over the
        # class axis instead of a minor-dim gather.
        lt = jnp.transpose(logits.astype(jnp.float32), (0, 3, 1, 2))
        m = jnp.max(lt, axis=1)
        lse = m + jnp.log(jnp.sum(jnp.exp(lt - m[:, None]), axis=1))
        cls = jnp.arange(num_classes, dtype=safe.dtype)[None, :, None, None]
        pick = jnp.sum(jnp.where(safe[:, None] == cls, lt, 0.0), axis=1)
        nll = lse - pick
    else:
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if weight is not None:
        nll = nll * weight[safe]
    return jnp.where(valid, nll, 0.0), valid


def _kth_largest(rows, kk):
    """Per-row k-th largest of non-negative float32 rows, WITHOUT sorting.

    Non-negative IEEE-754 floats order identically to their bit patterns
    read as int32, so the order statistic is found by 31-step bisection on
    the bit value: each step is one fused compare+count pass over the rows
    (31 x O(n) VPU work and HBM traffic) instead of a bitonic sort's
    ~log^2(n) interleaved passes. rows: (B, N) f32, values >= 0.
    Returns (B,) f32: the kk-th largest value of each row (1-indexed).
    """
    bits = jax.lax.bitcast_convert_type(rows, jnp.int32)

    def step(_, bounds):
        lo, hi = bounds  # invariant: count(bits >= lo) >= kk > count(bits > hi)
        mid = lo + (hi - lo + 1) // 2
        cnt = jnp.sum(bits >= mid[:, None], axis=1)
        ok = cnt >= kk
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    zero = jnp.zeros(rows.shape[0], jnp.int32)
    top = jnp.full(rows.shape[0], 0x7f800000, jnp.int32)  # +inf
    lo, _ = jax.lax.fori_loop(0, 31, step, (zero, top))
    return jax.lax.bitcast_convert_type(lo, jnp.float32)


def bootstrapped_cross_entropy(logits, labels, *, k=4096, thresh=0.3,
                               ignore_index=255, weight=None, method="select"):
    """logits: (B, H, W, C); labels: (B, H, W) int32. Returns scalar loss.

    method="select": the top-k mean is computed from the k-th largest loss
    value (bit-bisection, `_kth_largest`) and masked reductions — no sort
    (~31 compare+count passes vs the bitonic sort's ~190), and the backward
    pass is an elementwise mask instead of the sort VJP's permutation.
    Tied pixels at the threshold share the residual top-k weight evenly
    (the reference's arbitrary among-ties choice, bootstrapped_ce_loss.py:
    27-31, has measure zero for continuous losses). Pinned against the sort
    formulation (value + grad) by tests/test_train.py; "select" is the
    shipping default by measurement (tools/bench_loss.py, v5e, fwd+bwd
    ms/step: b8 67.1 vs sort 72.8, b16 135.2 vs sort 146.2).

    (History: jax.lax.top_k(k+1) at this shape takes 145 ms on v5e — never
    use it.)
    """
    b = logits.shape[0]
    loss, _ = softmax_cross_entropy(logits, labels, ignore_index=ignore_index,
                                    weight=weight)
    flat = loss.reshape(b, -1)
    n = flat.shape[1]
    kk = max(1, min(k, n - 1))

    if method == "select" and k >= n:
        # top-k of the whole row degenerates to the plain mean; the branch
        # test still compares the (kk+1)-th largest against thresh.
        method_kn_full = True
    else:
        method_kn_full = False

    if method == "select":
        # srt[kk] (the (kk+1)-th largest, reference branch test) and the
        # k-th largest t_k in one pass pair; all means are masked sums.
        t_k = _kth_largest(flat, kk)                     # == srt[kk-1]
        cnt_ge = jnp.sum(flat >= t_k[:, None], axis=1)
        # (kk+1)-th largest: t_k again if ties extend past kk, else the
        # largest strictly-below-t_k value.
        below_max = jnp.max(jnp.where(flat < t_k[:, None], flat, 0.0), axis=1)
        nxt = jnp.where(cnt_ge >= kk + 1, t_k, below_max)
        take_all = nxt > thresh

        above = flat > thresh
        mean_above = (jnp.sum(jnp.where(above, flat, 0.0), axis=1)
                      / jnp.maximum(jnp.sum(above, axis=1), 1))

        if method_kn_full:
            mean_topk = jnp.mean(flat, axis=1)
        else:
            tk = jax.lax.stop_gradient(t_k)[:, None]
            strict = flat > tk
            n_strict = jnp.sum(strict, axis=1)
            tied = flat == tk
            n_tied = jnp.maximum(jnp.sum(tied, axis=1), 1)
            tie_w = ((kk - n_strict) / n_tied)[:, None]
            w = jnp.where(strict, 1.0, jnp.where(tied, tie_w, 0.0))
            mean_topk = jnp.sum(w * flat, axis=1) / kk
        return jnp.mean(jnp.where(take_all, mean_above, mean_topk))

    def per_image(row):
        # Full descending sort: measured on TPU v5e at the Cityscapes-M
        # training shape, far faster than lax.top_k but ~log^2(n) passes.
        # The reference tests sorted[k] (the (k+1)-th largest,
        # bootstrapped_ce_loss.py:27-31).
        srt = -jax.lax.sort(-row)
        take_all = srt[kk] > thresh
        # mean over {loss > thresh} vs mean over top-k
        above = srt > thresh
        mean_above = jnp.sum(jnp.where(above, srt, 0.0)) / jnp.maximum(
            jnp.sum(above), 1)
        mean_topk = jnp.mean(srt[:k] if k <= n else srt)
        return jnp.where(take_all, mean_above, mean_topk)

    return jnp.mean(jax.vmap(per_image)(flat))


class BootstrappedCrossEntropyLoss:
    """Callable config object mirroring the reference class signature."""

    def __init__(self, k=4096, thresh=0.3, weight=None, ignore_index=-100,
                 reduction="mean", method="select"):
        self.k = k
        self.thresh = thresh
        self.weight = None if weight is None else jnp.asarray(weight)
        self.ignore_index = ignore_index
        self.method = method

    def __call__(self, logits, labels):
        return bootstrapped_cross_entropy(
            logits, labels, k=self.k, thresh=self.thresh,
            ignore_index=self.ignore_index, weight=self.weight,
            method=self.method)


def cross_entropy_loss(logits, labels, *, ignore_index=255, weight=None):
    """Plain masked-mean CE (torch F.cross_entropy reduction='mean' semantics:
    normalized by the number of valid pixels)."""
    loss, valid = softmax_cross_entropy(logits, labels,
                                        ignore_index=ignore_index, weight=weight)
    denom = jnp.maximum(jnp.sum(valid), 1)
    if weight is not None:
        safe = jnp.where(valid, labels, 0)
        denom = jnp.maximum(jnp.sum(jnp.where(valid, weight[safe], 0.0)), 1e-8)
    return jnp.sum(loss) / denom
