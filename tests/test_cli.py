"""End-to-end CLI integration: tiny train run -> checkpoint -> eval -> fps."""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image



TINY_ARCH = ("hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet("
             "'efficientnet-b0', levels=2, kernel_sizes=[1, 3], "
             "level_channels=[16, 16], expand_ratio=2, weight_groups=[8, 8])")


def make_camvid(tmp_path, n=4, size=(64, 96)):
    from hyperseg_tpu.data.camvid import CLASS_COLOR
    rng = np.random.RandomState(0)
    for split in ["train", "val"]:
        os.makedirs(tmp_path / split, exist_ok=True)
        os.makedirs(tmp_path / f"{split}_labels", exist_ok=True)
        for i in range(n):
            img = rng.randint(0, 255, (*size, 3), np.uint8)
            Image.fromarray(img).save(tmp_path / split / f"f{i}.png")
            lab = np.zeros((*size, 3), np.uint8)
            lab[: size[0] // 2] = CLASS_COLOR[0]
            lab[size[0] // 2:] = CLASS_COLOR[3]
            Image.fromarray(lab).save(tmp_path / f"{split}_labels" / f"f{i}_L.png")


@pytest.mark.slow
def test_train_eval_fps_roundtrip(tmp_path):
    from hyperseg_tpu.cli import train as train_cli
    from hyperseg_tpu.cli import test as test_cli
    from hyperseg_tpu.cli import test_fps as fps_cli

    data_dir = tmp_path / "camvid"
    exp_dir = tmp_path / "exp"
    os.makedirs(exp_dir)
    make_camvid(data_dir)

    ds_spec = f"hyperseg_tpu.data.camvid.CamVidDataset({str(data_dir)!r}, 'train')"
    val_spec = f"hyperseg_tpu.data.camvid.CamVidDataset({str(data_dir)!r}, 'val')"

    best = train_cli.main(
        str(exp_dir), model=TINY_ARCH, train_dataset=ds_spec,
        val_dataset=val_spec, epochs=2, train_iterations=4, batch_size=2,
        workers=2, optimizer={"lr": 1e-3}, log_every=1)
    assert os.path.isfile(exp_dir / "model_latest.npz")
    assert os.path.isfile(exp_dir / "model_best.npz")
    assert os.path.isfile(exp_dir / "model_latest.opt.npz")  # optimizer state
    assert 0.0 <= best <= 1.0

    # resume should pick up at epoch 2 and do nothing more
    train_cli.main(str(exp_dir), model=TINY_ARCH, train_dataset=ds_spec,
                   epochs=2, train_iterations=4, batch_size=2, workers=2)

    # bf16 compute path: one extra epoch trains without NaNs
    best_bf16 = train_cli.main(
        str(exp_dir), model=TINY_ARCH, train_dataset=ds_spec,
        val_dataset=val_spec, epochs=3, train_iterations=4, batch_size=2,
        workers=2, compute_dtype="bfloat16", log_every=1)
    assert 0.0 <= best_bf16 <= 1.0

    miou = test_cli.main(str(exp_dir), test_dataset=val_spec, batch_size=2,
                         forced=True, display_worst=1)
    assert os.path.isfile(exp_dir / "test" / "scores.npz")
    assert os.path.isfile(exp_dir / "test" / "worst.png")
    assert 0.0 <= miou <= 1.0
    # cached rerun takes the fast path
    miou2 = test_cli.main(str(exp_dir), test_dataset=val_spec, batch_size=2)
    assert miou2 == pytest.approx(miou)

    # num_classes intentionally left at its 19-class default: the dataset's
    # 12 classes must override it BEFORE the eval step is jitted (regression:
    # round 3 jitted with the CLI default, then reassigned num_classes)
    fps = fps_cli.main(str(exp_dir), model="model_best.npz",
                       test_dataset=val_spec, batch_size=2,
                       compute_dtype="float32")
    assert fps > 0
    assert os.path.isfile(exp_dir / "test_fps" / "scores.npz")
    with np.load(exp_dir / "test_fps" / "scores.npz") as z:
        assert z["class_iou"].shape == (12,)

    # pyramid TTA eval path (pyramid transform -> forward_pyramid); the up
    # pyramid keeps every scale divisible by the stride-32 patch grid
    miou_tta = test_cli.main(
        str(exp_dir), test_dataset=val_spec, batch_size=2, forced=True,
        img_transforms=["hyperseg_tpu.data.seg_transforms.UpDownPyramids(1, 1)"])
    assert 0.0 <= miou_tta <= 1.0


@pytest.mark.slow
def test_train_with_image_only_val_resize(tmp_path):
    """Reference eval protocol in the trainer: val images resized, labels at
    native resolution, logits upsampled before metrics. (Images must stay
    >= 64px high: the weight mapper's stride-64 level needs >= 1 row.)"""
    from PIL import Image
    from hyperseg_tpu.cli import train as train_cli

    data_dir = tmp_path / "cs"
    img_dir = data_dir / "leftImg8bit" / "val" / "cityA"
    tgt_dir = data_dir / "gtFine" / "val" / "cityA"
    os.makedirs(img_dir), os.makedirs(tgt_dir)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (128, 256, 3), np.uint8)).save(
            img_dir / f"cityA_{i:06d}_leftImg8bit.png")
        lab = np.zeros((128, 256), np.uint8)
        lab[:64] = 7
        lab[64:] = 26
        Image.fromarray(lab).save(tgt_dir / f"cityA_{i:06d}_gtFine_labelIds.png")
    exp_dir = tmp_path / "exp"
    os.makedirs(exp_dir)

    ds = f"hyperseg_tpu.data.cityscapes.CityscapesDataset({str(data_dir)!r}, 'val')"
    best = train_cli.main(
        str(exp_dir), model=TINY_ARCH, train_dataset=ds, val_dataset=ds,
        train_img_transforms=[
            "hyperseg_tpu.data.seg_transforms.Resize([64, 128])"],
        val_img_transforms=[
            "hyperseg_tpu.data.seg_transforms.ImageResize([64, 128])"],
        epochs=1, train_iterations=2, batch_size=2, workers=2, log_every=1)
    assert 0.0 <= best <= 1.0


@pytest.mark.slow
def test_reference_scores_cache_and_display_sources(tmp_path):
    """Eval CLI consumes a reference-written scores.npz verbatim (same keys/
    dtypes as test.py:176-188, incl. 0-d global_acc) and renders
    display_sources columns (test.py:260-285)."""
    import jax
    from hyperseg_tpu.cli import test as test_cli
    from hyperseg_tpu.core import checkpoint as C
    from hyperseg_tpu.core import registry

    data_dir = tmp_path / "camvid"
    exp_dir = tmp_path / "exp"
    os.makedirs(exp_dir / "test")
    make_camvid(data_dir)
    val_spec = f"hyperseg_tpu.data.camvid.CamVidDataset({str(data_dir)!r}, 'val')"

    # checkpoint from a fresh init (no training needed for the cache path)
    arch = TINY_ARCH[:-1] + ", num_classes=12)"
    model = registry.build(arch)
    params = model.init(jax.random.PRNGKey(0))
    C.save_checkpoint(str(exp_dir), "model", params,
                      meta={"arch": arch}, is_best=True)

    # a scores.npz exactly as the torch reference writes it
    ref_ious = np.random.RandomState(1).rand(4)
    ref_iou = np.linspace(0.1, 0.9, 12)
    np.savez(exp_dir / "test" / "scores.npz", ious=ref_ious,
             global_acc=0.5, class_acc=np.full(12, 0.5), class_iou=ref_iou)

    # display sources: one label-index png per dataset item, half-size to
    # exercise the pad-to-input path
    src_dir = tmp_path / "othermodel"
    os.makedirs(src_dir)
    for i in range(4):
        Image.fromarray(np.full((32, 48), 3, np.uint8)).save(src_dir / f"f{i}.png")

    miou = test_cli.main(str(exp_dir), test_dataset=val_spec, batch_size=2,
                         display_best=1, display_worst=1,
                         display_sources=[str(src_dir)])
    assert miou == pytest.approx(float(np.mean(ref_iou)))  # cache was used
    for tag in ("best", "worst"):
        g = np.array(Image.open(exp_dir / "test" / f"{tag}.png"))
        # input + source + pred + gt columns (plus inter-column padding)
        assert 96 * 4 <= g.shape[1] < 96 * 5


def test_remove_bn_elides_bn_compute(tmp_path):
    """remove_bn must benchmark a genuinely cheaper BN-free model (reference
    test_fps.py:319-332 replaces BN modules with Unit), not an identity
    affine that still executes: outputs differ from the BN model, and the
    trace-time flag is restored afterwards."""
    import jax
    from hyperseg_tpu.core import registry
    from hyperseg_tpu.cli import test_fps as fps_cli
    from hyperseg_tpu.nn import functional as F

    model = registry.build(TINY_ARCH, num_classes=12)
    params = model.init(jax.random.PRNGKey(0))
    # fresh init is degenerate for this check: the zero-initialized output
    # head makes every logit exactly 0, and BN stats are already identity.
    # Perturb all params (noise) + running stats so BN genuinely acts.
    rs = np.random.RandomState(1)
    params = {k: (jnp.asarray(rs.rand(*v.shape) + 0.5, v.dtype)
                  if k.endswith(".running_var")
                  else v + jnp.asarray(rs.randn(*v.shape) * 0.05, v.dtype))
              for k, v in params.items()}
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 96, 3), jnp.float32)

    y_bn = model(params, x)
    assert F.BN_IDENTITY is False
    try:
        F.BN_IDENTITY = True
        y_unit = model(fps_cli.remove_bn(params), x)
    finally:
        F.BN_IDENTITY = False
    # BN-free model is a different (cheaper) network — outputs must differ
    assert not np.allclose(np.asarray(y_bn), np.asarray(y_unit))

    # end-to-end: the CLI runs the BN-free protocol and restores the flag
    fps = fps_cli.main(str(tmp_path), arch=TINY_ARCH, batch_size=1,
                       iterations=2, res=(64, 96), num_classes=12,
                       compute_dtype="float32", with_remove_bn=True)
    assert fps > 0 and F.BN_IDENTITY is False


@pytest.mark.slow
def test_verify_release_drill(tmp_path):
    """tools/verify_release.py end-to-end on synthetic stand-ins: a tiny-arch
    checkpoint named like a released config + a tiny CamVid dir -> the drill
    converts/loads, runs the shipped eval recipe, and reports the table."""
    import json
    import jax
    import importlib.util
    from hyperseg_tpu.core import registry

    spec = importlib.util.spec_from_file_location(
        "verify_release", os.path.join(os.path.dirname(__file__), "..",
                                       "tools", "verify_release.py"))
    vr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vr)

    data_dir = tmp_path / "camvid"
    make_camvid(data_dir)
    os.rename(data_dir / "val", data_dir / "test")
    os.rename(data_dir / "val_labels", data_dir / "test_labels")

    arch = TINY_ARCH[:-1] + ", num_classes=12)"
    model = registry.build(arch)
    params = model.init(jax.random.PRNGKey(0))
    wdir = tmp_path / "weights"
    os.makedirs(wdir)
    name = "camvid_efficientnet_b1_hyperseg-s"
    np.savez(wdir / f"{name}.npz", **{k: np.asarray(v)
                                      for k, v in params.items()})
    with open(wdir / f"{name}.json", "w") as f:
        json.dump({"arch": arch}, f)

    rows = vr.main(["--weights", str(wdir), "--camvid", str(data_dir),
                    "--out", str(tmp_path / "out"), "--only", name,
                    "--tolerance", "100"])
    evaluated = {n: (m, s) for n, m, _t, s in rows}
    assert evaluated[name][1] == "ok"
    assert 0.0 <= evaluated[name][0] <= 100.0
    assert os.path.isfile(tmp_path / "out" / name / "test" / "scores.npz")

    # missing weights/datasets -> clean skip rows, exit 0
    rows2 = vr.main(["--weights", str(tmp_path / "empty"),
                     "--out", str(tmp_path / "out2")])
    assert all("skipped" in s for _n, _m, _t, s in rows2)
