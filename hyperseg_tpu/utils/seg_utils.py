"""Segmentation metric accumulators (class API, device-native).

Mirrors hyperseg/utils/seg_utils.py: ConfusionMatrix with eps-guarded
acc/IoU (:5-56) and the IOUBenchmark wrapper (:59-79). The accumulator is a
device array; `reduce_across_devices` psums it over a mesh axis — the working
replacement for the reference's dormant torch.distributed all_reduce (:38-44).
Visualization helpers live in hyperseg_tpu.utils.img_utils (blend_seg)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hyperseg_tpu.train import metrics as M


class ConfusionMatrix:
    def __init__(self, num_classes: int, ignore_index=None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.mat = jnp.zeros((num_classes, num_classes), jnp.int64)

    def update(self, target, pred):
        self.mat = self.mat + M.confusion_matrix(
            jnp.asarray(target), jnp.asarray(pred), self.num_classes,
            ignore_index=self.ignore_index)

    def reset(self):
        self.mat = jnp.zeros_like(self.mat)

    def compute(self, eps=1e-6):
        """(global_acc, class_acc, class_iou) with epsilon guards
        (seg_utils.py:22-36)."""
        return M.eval_scores_from_confmat(np.asarray(self.mat), eps=eps)

    @staticmethod
    def reduce_across_devices(mat, axis_name="data"):
        """psum inside a pmapped/shard_mapped step (replaces
        reduce_from_all_processes, seg_utils.py:38-44)."""
        return jax.lax.psum(mat, axis_name)


class IOUBenchmark:
    """mIoU-from-confusion-matrix benchmark object (seg_utils.py:59-79)."""

    def __init__(self, num_classes: int):
        self.confmat = ConfusionMatrix(num_classes)

    def __call__(self, pred, target):
        self.confmat.update(target, pred)
        _, _, class_iou = self.confmat.compute()
        return {"iou": float(np.mean(class_iou))}

    def reset(self):
        self.confmat.reset()
