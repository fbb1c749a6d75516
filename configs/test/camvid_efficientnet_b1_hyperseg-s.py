"""HyperSeg-S CamVid test eval — evaluation config (mirrors the reference test config; image-only
resize keeps labels at native resolution as in the reference)."""

import os
import sys

from hyperseg_tpu.cli.test import main
from hyperseg_tpu.core.registry import Spec

T = "hyperseg_tpu.data.seg_transforms."

if __name__ == "__main__":
    exp_name = os.path.splitext(os.path.basename(__file__))[0]
    exp_dir = os.path.join("tests_out", exp_name)
    # native .npz checkpoint or a reference .pth (converted on load)
    model = os.path.join("weights", exp_name + ".npz")
    if not os.path.isfile(model):
        model = os.path.join("weights", exp_name + ".pth")
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "data/camvid"

    test_dataset = Spec("hyperseg_tpu.data.camvid.CamVidDataset", (data_dir, "test"))
    img_transforms = [Spec(T + "ImageResize", ([576, 768],))]
    

    os.makedirs(exp_dir, exist_ok=True)
    main(exp_dir, model=model, test_dataset=test_dataset,
         img_transforms=img_transforms, forced=True)
