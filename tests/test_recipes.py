"""Shipped-recipe rehearsal: the configs/train/* files themselves.

test_all_train_configs_build loads every shipped config's build_kwargs and
instantiates its transforms, criterion and model factory (pretrained=False —
ImageNet resolution is covered by tests/test_pretrained.py). The slow
rehearsal runs the CamVid-S recipe end-to-end at reduced resolution on
synthetic data: transforms -> loader -> train -> val -> best checkpoint ->
test CLI -> fps CLI (the full reference workflow, train.py:79-274)."""

import glob
import importlib.util
import os

import numpy as np
import pytest

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "train")


def load_config(path):
    name = os.path.splitext(os.path.basename(path))[0].replace("-", "_")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(CONFIG_DIR, "*.py"))),
                         ids=lambda p: os.path.basename(p))
def test_all_train_configs_build(path):
    from hyperseg_tpu.core import registry
    kw = load_config(path).build_kwargs()
    # reference recipes all request ImageNet init (ADVICE round-1)
    assert kw["model"].kwargs["pretrained"] is True
    for t in (kw["train_img_transforms"] + kw["val_img_transforms"]
              + kw["tensor_transforms"] + [kw["criterion"]]):
        assert registry.build(t) is not None
    model = registry.build(kw["model"].with_overrides(pretrained=False))
    assert model.decoder.hyper_params > 0
    assert kw["epochs"] > 0 and kw["batch_size"] > 0


@pytest.mark.slow
def test_camvid_s_recipe_rehearsal(tmp_path):
    """The real HyperSeg-S CamVid recipe (shipped transforms, criterion,
    optimizer, PolyLR power, hflip-TTA eval) at reduced resolution for a few
    iterations, then eval + fps on the produced experiment directory."""
    from PIL import Image
    from hyperseg_tpu.cli import test as test_cli
    from hyperseg_tpu.cli import test_fps as fps_cli
    from hyperseg_tpu.cli.train import main as train_main
    from hyperseg_tpu.core.registry import Spec
    from hyperseg_tpu.data.camvid import CLASS_COLOR

    # synthetic CamVid tree at 128x192 (stride-64 weight-mapper grid: 2x3)
    data_dir = tmp_path / "camvid"
    rng = np.random.RandomState(0)
    for split in ["train", "val", "test"]:
        os.makedirs(data_dir / split)
        os.makedirs(data_dir / f"{split}_labels")
        for i in range(4):
            img = rng.randint(0, 255, (128, 192, 3), np.uint8)
            Image.fromarray(img).save(data_dir / split / f"f{i}.png")
            lab = np.zeros((128, 192, 3), np.uint8)
            lab[:64] = CLASS_COLOR[0]
            lab[64:] = CLASS_COLOR[3]
            Image.fromarray(lab).save(data_dir / f"{split}_labels" / f"f{i}_L.png")

    cfg = load_config(os.path.join(CONFIG_DIR, "camvid_efficientnet_b1_hyperseg-s.py"))
    kw = cfg.build_kwargs(str(data_dir))
    T = "hyperseg_tpu.data.seg_transforms."
    kw.update(
        model=kw["model"].with_overrides(pretrained=False,
                                         coords_res=[(128, 128), (128, 192)]),
        train_img_transforms=[
            Spec(T + "RandomResize", kwargs={"scale_range": (0.75, 1.0)}),
            Spec(T + "RandomCrop", ([128, 128],), {"pad_if_needed": True, "lbl_fill": 255}),
            Spec(T + "RandomHorizontalFlip"),
        ],
        val_img_transforms=[Spec(T + "LargerEdgeResize", ([128, 192],))],
        epochs=1, train_iterations=4, batch_size=2, workers=2, log_every=1,
        scheduler={"power": kw["scheduler"]["power"], "max_epoch": 4})

    exp_dir = tmp_path / "exp"
    os.makedirs(exp_dir)
    best = train_main(str(exp_dir), **kw)
    assert 0.0 <= best <= 1.0
    assert os.path.isfile(exp_dir / "model_best.npz")

    val_spec = f"hyperseg_tpu.data.camvid.CamVidDataset({str(data_dir)!r}, 'test')"
    miou = test_cli.main(
        str(exp_dir), test_dataset=val_spec, batch_size=2, forced=True,
        img_transforms=[f"{T}LargerEdgeResize([128, 192])"])
    assert 0.0 <= miou <= 1.0
    assert os.path.isfile(exp_dir / "test" / "scores.npz")

    fps = fps_cli.main(str(exp_dir), model="model_best.npz",
                       test_dataset=val_spec, batch_size=2,
                       img_transforms=[f"{T}LargerEdgeResize([128, 192])"],
                       compute_dtype="float32", num_classes=12)
    assert fps > 0
