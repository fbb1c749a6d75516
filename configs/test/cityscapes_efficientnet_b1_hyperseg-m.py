"""HyperSeg-M Cityscapes val eval — evaluation config (mirrors the reference test config; image-only
resize keeps labels at native resolution as in the reference)."""

import os
import sys

from hyperseg_tpu.cli.test import main
from hyperseg_tpu.core.registry import Spec

T = "hyperseg_tpu.data.seg_transforms."

EXP_NAME = 'cityscapes_efficientnet_b1_hyperseg-m'


def build_kwargs(data_dir=None, model=None):
    """Kwargs for hyperseg_tpu.cli.test.main — shared by __main__ and
    tools/verify_release.py so the release drill runs the exact shipped
    recipe."""
    data_dir = data_dir or 'data/cityscapes'
    if model is None:
        # native .npz checkpoint or a reference .pth (converted on load)
        model = os.path.join("weights", EXP_NAME + ".npz")
        if not os.path.isfile(model):
            model = os.path.join("weights", EXP_NAME + ".pth")
    test_dataset = Spec("hyperseg_tpu.data.cityscapes.CityscapesDataset", (data_dir, "val", "fine", "semantic"))
    img_transforms = [Spec(T + "ImageResize", ([512, 1024],))]
    return dict(model=model, test_dataset=test_dataset,
                img_transforms=img_transforms, forced=True)


if __name__ == "__main__":
    exp_dir = os.path.join("tests_out", EXP_NAME)
    os.makedirs(exp_dir, exist_ok=True)
    main(exp_dir, **build_kwargs(sys.argv[1] if len(sys.argv) > 1 else None))
