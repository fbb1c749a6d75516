"""HyperSeg-L on PASCAL VOC + SBD (512x512) — training config (mirrors the reference config of the same name,
transform-for-transform; image-only transforms keep labels at native
resolution exactly as the reference's torchvision transforms do).

`build_kwargs` returns the full kwargs dict for cli.train.main so tests can
rehearse the exact shipped recipe with overrides (tests/test_recipes.py)."""

import os
import sys

from hyperseg_tpu.cli.train import main
from hyperseg_tpu.core.registry import Spec

T = "hyperseg_tpu.data.seg_transforms."


def build_kwargs(data_dir="data/vocsbd"):
    return dict(
        model=Spec("hyperseg_tpu.models.hyperseg_v0_1.hyperseg_efficientnet", ("efficientnet-b3",),
                   dict(pretrained=True, levels=3, kernel_sizes=(1, 1, 3, 3, 3, 3),
                        expand_ratio=2, inference_hflip=True, with_out_fc=False,
                        decoder_dropout=None, weight_groups=16)),
        train_dataset=Spec("hyperseg_tpu.data.voc_sbd.VOCSBDDataset", (data_dir, "train_aug")),
        val_dataset=Spec("hyperseg_tpu.data.voc_sbd.VOCSBDDataset", (data_dir, "val")),
        train_img_transforms=[
            Spec(T + "RandomHorizontalFlip"),
            Spec(T + "ColorJitter", (0.5, 0.5, 0.5, 0.5)),
            Spec(T + "RandomResize", kwargs={"scale_range": (0.25, 0.9)}),
            Spec(T + "RandomRotation", (30.0,)),
            Spec(T + "ConstantPad", (512,), {"lbl_fill": 255}),
        ],
        val_img_transforms=[Spec(T + "ConstantPad", (512,), {"lbl_fill": 255})],
        tensor_transforms=[
            Spec(T + "ToArray"),
            Spec(T + "Normalize",
                 kwargs={"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}),
        ],
        epochs=160, train_iterations=20000, batch_size=32, workers=16,
        optimizer={"lr": 1e-4, "betas": (0.5, 0.999)},
        scheduler={"power": 3.0, "max_epoch": 160},
        criterion=Spec("hyperseg_tpu.train.losses.BootstrappedCrossEntropyLoss",
                       kwargs={"ignore_index": 255}),
        batch_scheduler=False)


if __name__ == "__main__":
    exp_name = os.path.splitext(os.path.basename(__file__))[0]
    exp_dir = os.path.join("checkpoints", "vocsbd", exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    main(exp_dir, **build_kwargs(sys.argv[1] if len(sys.argv) > 1 else "data/vocsbd"))
