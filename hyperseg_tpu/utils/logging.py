"""Training observability: averaged meters + TensorBoard logging.

Mirrors hyperseg/utils/tensorboard_logger.py: categorized scalar dict with
per-batch 'val' and running 'avg' scalars, image logging, and a progress-bar
string representation. Backed by tensorboardX when available; degrades to a
JSONL file logger otherwise (still machine-readable observability)."""

from __future__ import annotations

import json
import os
import time
from collections import OrderedDict
from typing import Dict, Optional

import numpy as np


class AverageMeter:
    """Running average (tensorboard_logger.py:8-23)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class TensorBoardLogger:
    def __init__(self, log_dir: Optional[str] = None):
        self.log_dir = log_dir
        self.meters: "OrderedDict[str, AverageMeter]" = OrderedDict()
        self.prefix = ""
        self.writer = None
        self._jsonl = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(log_dir)
            except Exception:
                self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def reset(self, prefix: str = ""):
        self.prefix = prefix
        self.meters.clear()

    def update(self, category: str, **kwargs):
        for k, v in kwargs.items():
            name = f"{category}/{k}"
            self.meters.setdefault(name, AverageMeter()).update(v)

    def log_scalars_val(self, main_tag: str, global_step: int):
        self._write({k: m.val for k, m in self.meters.items()
                     if k.startswith(main_tag)}, global_step, suffix="val")

    def log_scalars_avg(self, main_tag: str, global_step: int):
        self._write({k: m.avg for k, m in self.meters.items()
                     if k.startswith(main_tag)}, global_step, suffix="avg")

    def log_image(self, tag: str, img_hwc: np.ndarray, global_step: int):
        if self.writer is not None:
            self.writer.add_image(tag, np.asarray(img_hwc).transpose(2, 0, 1),
                                  global_step)

    def log_heatmap(self, tag: str, matrix: np.ndarray, global_step: int,
                    labels=None):
        """Confusion-matrix heatmap (the reference's seaborn heatmaps,
        tensorboard_logger.py:70-86), rendered with matplotlib when present."""
        if self.writer is None:
            return
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        m = np.asarray(matrix, np.float64)
        norm = m / np.maximum(m.sum(axis=1, keepdims=True), 1)
        fig, ax = plt.subplots(figsize=(6, 5), dpi=100)
        im = ax.imshow(norm, cmap="viridis", vmin=0, vmax=1)
        fig.colorbar(im, ax=ax)
        if labels is not None:
            ax.set_xticks(range(len(labels)))
            ax.set_yticks(range(len(labels)))
            ax.set_xticklabels(labels, rotation=90, fontsize=6)
            ax.set_yticklabels(labels, fontsize=6)
        ax.set_xlabel("prediction")
        ax.set_ylabel("ground truth")
        fig.tight_layout()
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        plt.close(fig)
        self.writer.add_image(tag, buf.transpose(2, 0, 1), global_step)

    def _write(self, scalars: Dict[str, float], step: int, suffix: str):
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(f"{k}/{suffix}", v, step)
        elif self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"step": step, "suffix": suffix, "time": time.time(), **scalars}) + "\n")
            self._jsonl.flush()

    def __str__(self):
        parts = [self.prefix] if self.prefix else []
        parts += [f"{k.split('/')[-1]}: {m.val:.4g} ({m.avg:.4g})"
                  for k, m in self.meters.items()]
        return "; ".join(parts)
