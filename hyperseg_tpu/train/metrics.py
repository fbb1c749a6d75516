"""Segmentation metrics, device-native.

Confusion-matrix accumulation runs on-device (one bincount per batch) instead
of the reference's per-step host sync (numpy runningScore, train.py:294-338 —
a deliberate CPU sync point there; here it's a small on-device reduction and
the host only pulls scalars when logging). Cross-device reduction is a psum of
the matrix, replacing the reference's dormant
ConfusionMatrix.reduce_from_all_processes (seg_utils.py:38-44).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(labels, preds, num_classes: int, ignore_index=255,
                     method="matmul", chunk=1 << 17):
    """Batched confusion matrix. labels/preds: int arrays of equal shape.
    Rows = ground truth, cols = prediction (matches both reference
    accumulators, train.py:299-304 and seg_utils.py:22-36).

    method="matmul" (default): hist = onehot(labels)^T @ onehot(preds) on the
    MXU — one-hot bf16 operands (0/1 exact) with f32 accumulation. Pixels are
    processed in `chunk`-sized scan steps: XLA cannot fuse the compare into
    the dot's operand read, so an unchunked one-hot at the batch-16 training
    shape (8.4M pixels) would materialize two ~2 GB lane-padded (N, 128)
    tiles in HBM; chunking caps the transient at ~2*chunk*256 bytes (~67 MB)
    while the (C, C) f32 accumulator rides the scan carry. Counts stay exact:
    per-call pixel count < 2^24. method="bincount" keeps the scatter-add
    formulation — XLA lowers it through TPU scatter, a known slow path at
    megapixel sizes (A/B: tools/bench_metrics.py)."""
    valid = (labels >= 0) & (labels < num_classes)
    if ignore_index is not None:
        valid &= labels != ignore_index
    if method == "matmul":
        classes = jnp.arange(num_classes, dtype=jnp.int32)
        lflat = labels.reshape(-1).astype(jnp.int32)
        pflat = preds.reshape(-1).astype(jnp.int32)
        vflat = valid.reshape(-1)
        n = lflat.shape[0]

        def hist_of(l, p, v):
            oh_l = ((l[:, None] == classes) & v[:, None]).astype(jnp.bfloat16)
            oh_p = (p[:, None] == classes).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh_l, oh_p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        if n <= chunk:
            return hist_of(lflat, pflat, vflat).astype(jnp.int32)
        nch = -(-n // chunk)
        pad = nch * chunk - n
        lflat = jnp.pad(lflat, (0, pad))
        pflat = jnp.pad(pflat, (0, pad))
        vflat = jnp.pad(vflat, (0, pad))        # padded pixels: valid=False

        def body(acc, args):
            return acc + hist_of(*args), None

        hist, _ = jax.lax.scan(
            body, jnp.zeros((num_classes, num_classes), jnp.float32),
            (lflat.reshape(nch, chunk), pflat.reshape(nch, chunk),
             vflat.reshape(nch, chunk)))
        return hist.astype(jnp.int32)
    idx = jnp.where(valid, labels * num_classes + preds, num_classes * num_classes)
    hist = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes + 1)
    return hist[:-1].reshape(num_classes, num_classes)


def scores_from_confmat(hist):
    """Metrics bundle from an accumulated confusion matrix (numpy, host side).
    Returns the reference runningScore quantities (train.py:311-334):
    overall acc, mean class acc, freq-weighted acc, mean IoU, per-class IoU."""
    hist = np.asarray(hist, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.diag(hist) / hist.sum(axis=1)
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
        freq = hist.sum(axis=1) / hist.sum()
    mean_acc = np.nanmean(acc_cls)
    mean_iu = np.nanmean(iu)
    fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    return {
        "overall_acc": float(acc),
        "mean_acc": float(mean_acc),
        "fwavacc": float(fwavacc),
        "mean_iou": float(mean_iu),
        "class_iou": iu,
    }


def eval_scores_from_confmat(hist, eps=1e-6):
    """test.py-style metrics with epsilon guards (seg_utils.py:22-36):
    global acc, per-class acc, per-class IoU."""
    hist = np.asarray(hist, dtype=np.float64)
    diag = np.diag(hist)
    global_acc = diag.sum() / (hist.sum() + eps)
    class_acc = diag / (hist.sum(axis=1) + eps)
    class_iou = diag / (hist.sum(axis=1) + hist.sum(axis=0) - diag + eps)
    return global_acc, class_acc, class_iou


def per_image_jaccard(labels, preds, num_classes: int, ignore_index=0,
                      eps=1e-6):
    """Per-image mean IoU used to rank best/worst eval images — exact
    reference semantics (test.py:210-227): the confusion matrix only counts
    pixels whose *label* is a valid class (0 <= l < num_classes and
    l != ignore_index), so predictions at void/255 pixels never enter any
    class union; the ignore_index union is zeroed; classes with empty union
    are dropped from the mean."""
    labels = np.asarray(labels).ravel()
    preds = np.asarray(preds).ravel()
    mask = (labels >= 0) & (labels < num_classes)
    if ignore_index is not None and 0 <= ignore_index < num_classes:
        mask &= labels != ignore_index
    inds = num_classes * labels[mask].astype(np.int64) + preds[mask]
    confmat = np.bincount(inds, minlength=num_classes ** 2).reshape(
        num_classes, num_classes)
    inter = np.diag(confmat)
    union = confmat.sum(1) + confmat.sum(0) - inter
    if ignore_index is not None and 0 <= ignore_index < num_classes:
        union = union.copy()
        union[ignore_index] = 0
    score = inter / (union + eps)
    sel = score[union > 0]
    # all-empty unions: reference torch.mean of an empty tensor is nan;
    # return 0.0 so scores.npz stays finite
    return float(sel.mean()) if sel.size else 0.0
