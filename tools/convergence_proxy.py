"""Synthetic convergence proxy of the full training recipe (VERDICT r4 #5).

Runs the REAL cli/train.py machinery — per-batch PolyLR decay over >= 2k
steps, val-every-epoch, latest/best checkpoint flow, and a forced mid-run
resume — on a learnable synthetic CamVid-style dataset (64 fixed images whose
pixels are class-color + noise, so near-100% mIoU is reachable), with the
flagship HyperSeg-M architecture at a reduced resolution. This de-risks the
only recipe axis untestable without the real datasets: schedule decay across
thousands of steps, metric trajectories, and checkpoint-best logic over many
epochs (reference hot loop train.py:79-274).

Usage: python tools/convergence_proxy.py [out_dir]   (default /tmp/conv_proxy)
Writes <out_dir>/exp/* (checkpoints, TB logs) and prints a per-epoch log;
the committed summary lives in docs/convergence_proxy.md.
"""

import json
import os
import shutil
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, __file__.rsplit("/", 2)[0])

RES = (128, 256)          # H, W — divisible by 32; 1/8 the flagship pixels
N_TRAIN, N_VAL = 64, 8
BATCH = 8
EPOCHS = 250              # 64/8 = 8 steps/epoch -> 2000 PolyLR steps
RESUME_AT = 120           # first leg stops here; second leg resumes

ARCH = ("hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet("
        "'efficientnet-b1', levels=2, out_feat_scale=[1.0,0.25,0.25,0.25,0.25],"
        "kernel_sizes=[1,1,1,3,3], level_channels=[64,32,16,16,16],"
        "expand_ratio=2, weight_groups=[32,16,8,16,4])")


def make_dataset(root):
    """CamVid-format synthetic data: label = smooth random class regions,
    image = class color + 5% noise. The color->class mapping is learnable to
    ~100% IoU; region boundaries exercise the patch-wise decoder."""
    from hyperseg_tpu.data.camvid import CLASS_COLOR
    rng = np.random.RandomState(7)
    n_classes = len(CLASS_COLOR) - 1  # skip Void
    for split, n in [("train", N_TRAIN), ("val", N_VAL)]:
        os.makedirs(os.path.join(root, split), exist_ok=True)
        os.makedirs(os.path.join(root, f"{split}_labels"), exist_ok=True)
        for i in range(n):
            # smooth class field: argmax of blurred per-class noise
            field = rng.rand(n_classes, RES[0] // 16, RES[1] // 16)
            field = np.kron(field, np.ones((1, 16, 16)))
            lab_idx = field.argmax(0).astype(np.uint8)
            colors = np.asarray(CLASS_COLOR[:n_classes], np.float32)
            img = colors[lab_idx] + rng.randn(*RES, 3) * 12.0
            img = np.clip(img, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, split, f"s{i}.png"))
            Image.fromarray(colors.astype(np.uint8)[lab_idx]).save(
                os.path.join(root, f"{split}_labels", f"s{i}_L.png"))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/conv_proxy"
    shutil.rmtree(out, ignore_errors=True)
    data = os.path.join(out, "camvid")
    exp = os.path.join(out, "exp")
    os.makedirs(exp)
    make_dataset(data)

    from hyperseg_tpu.cli import train as train_cli
    ds = f"hyperseg_tpu.data.camvid.CamVidDataset({data!r}, 'train')"
    vs = f"hyperseg_tpu.data.camvid.CamVidDataset({data!r}, 'val')"
    kw = dict(model=ARCH, train_dataset=ds, val_dataset=vs,
              batch_size=BATCH, workers=2, optimizer={"lr": 1e-3},
              scheduler={"max_epoch": EPOCHS * (N_TRAIN // BATCH)},
              compute_dtype="bfloat16", log_every=4, seed=0)

    # Leg 1: epochs [0, RESUME_AT)
    best1 = train_cli.main(exp, epochs=RESUME_AT, **kw)
    print(f"=== leg 1 done: best val mIoU {best1:.4f} at epoch {RESUME_AT}")
    assert os.path.isfile(os.path.join(exp, "model_latest.npz"))
    assert os.path.isfile(os.path.join(exp, "model_best.npz"))

    # Leg 2: resume from model_latest (exercises epoch/step/opt-state resume
    # mid-PolyLR-decay, train.py:210-233 equivalent) and run to EPOCHS
    best2 = train_cli.main(exp, epochs=EPOCHS, resume=exp, **kw)
    print(f"=== leg 2 done: best val mIoU {best2:.4f} at epoch {EPOCHS}")

    summary = {"res": RES, "n_train": N_TRAIN, "batch": BATCH,
               "epochs": EPOCHS, "steps": EPOCHS * (N_TRAIN // BATCH),
               "resume_at": RESUME_AT,
               "best_miou_leg1": round(best1, 4),
               "best_miou_final": round(best2, 4)}
    print(json.dumps(summary))
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f)


if __name__ == "__main__":
    main()
