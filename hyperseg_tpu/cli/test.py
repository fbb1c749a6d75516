"""Evaluation entry point — the equivalent of hyperseg/test.py.

Loads a self-describing checkpoint (native .npz or reference .pth), rebuilds
the model from its arch string, runs the eval loop (logits bilinearly resized
to label resolution before argmax, test.py:165-175), accumulates the
confusion matrix on device plus per-image jaccard scores, caches results in
<exp_dir>/test/scores.npz (test.py:122-125,176-182), prints
global/class/IoU metrics, and optionally saves best/worst prediction grids.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from hyperseg_tpu.core import checkpoint as C
from hyperseg_tpu.core import registry
from hyperseg_tpu.data.loader import DataLoader
from hyperseg_tpu.data.seg_transforms import Compose
from hyperseg_tpu.nn import functional as F
from hyperseg_tpu.train import metrics as M
from hyperseg_tpu.train.step import make_eval_step
from hyperseg_tpu.utils.img_utils import blend_seg, denormalize, make_grid

DEFAULT_TENSOR_TRANSFORMS = (
    "hyperseg_tpu.data.seg_transforms.ToArray()",
    "hyperseg_tpu.data.seg_transforms.Normalize()",
)


def _build_list(specs):
    if specs is None:
        return []
    return [registry.build(s) if isinstance(s, str)
            else s.build() if isinstance(s, registry.Spec) else s
            for s in specs]


def main(exp_dir, *, model=None, arch=None, test_dataset=None,
         img_transforms=None, tensor_transforms=DEFAULT_TENSOR_TRANSFORMS,
         batch_size=4, workers=4, forced=False, compute_dtype="float32",
         display_worst=0, display_best=0, display_alpha=0.5,
         display_background_index=0, display_sources=None, out_dir=None,
         devices=None):
    assert os.path.isdir(exp_dir), f'exp_dir "{exp_dir}" must be a directory'
    if model is None:
        for cand in ("model_best.npz", "model_best.pth"):
            if os.path.isfile(os.path.join(exp_dir, cand)):
                model = cand
                break
        assert model is not None, f"no checkpoint found in {exp_dir}"
    model_path = model if os.path.isfile(model) else os.path.join(exp_dir, model)
    assert os.path.isfile(model_path), f'model path "{model_path}" does not exist'

    cache_dir = os.path.join(exp_dir, "test")
    os.makedirs(cache_dir, exist_ok=True)
    scores_path = os.path.join(cache_dir, "scores.npz")

    # dataset. pad_last fills the trailing partial batch with ignore-labeled
    # copies: static batch shapes for the jit and mesh divisibility, while
    # the confusion matrix stays exact (padded labels are all 255)
    tf = Compose(_build_list(img_transforms) + _build_list(tensor_transforms))
    test_ds = registry.build(test_dataset, transforms=tf)
    loader = DataLoader(test_ds, batch_size=batch_size, workers=workers,
                        pad_last=True)
    num_classes = len(test_ds.classes)

    # model from checkpoint arch
    model_obj, params, meta = C.load_model(model_path, arch=arch,
                                           num_classes=num_classes)
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    # local-mesh data parallelism: params replicated, batch sharded on 'data'
    # (the reference's DataParallel eval, test.py:136-137; the confmat
    # reduction XLA inserts over ICI replaces the dormant
    # reduce_from_all_processes all_reduce, seg_utils.py:38-44)
    from hyperseg_tpu.parallel import (data_sharded, make_mesh_for_batch,
                                       replicate_params)
    mesh = make_mesh_for_batch(batch_size, devices=devices)
    params = replicate_params(mesh, params)
    batch_sharding = data_sharded(mesh)
    if mesh.devices.size > 1:
        # the eval decoder batch scan iterates the GLOBAL batch; under a
        # sharded batch each lax.map step would touch one shard's image and
        # serialize across devices — data parallelism already provides the
        # per-image amortization the scan exists for
        from hyperseg_tpu.ops import pallas as pallas_cfg
        pallas_cfg.DECODER_SCAN_MIN_BATCH = 0
    eval_step = jax.jit(make_eval_step(model_obj, num_classes=num_classes,
                                       compute_dtype=dtype))

    @jax.jit
    def eval_step_pyramid(params, batch):
        # pyramid TTA: Pyramids/UpDownPyramids transforms yield list inputs
        # routed through forward_pyramid (HyperGen.forward list path)
        logits = model_obj.forward_pyramid(
            params, [p.astype(dtype) for p in batch["image"]])
        label = batch["label"]
        logits = F.resize_bilinear(logits, label.shape[1:3])
        preds = jnp.argmax(logits, axis=-1)
        confmat = M.confusion_matrix(label, preds, num_classes, ignore_index=255)
        return {"confmat": confmat, "preds": preds}

    if forced or not os.path.isfile(scores_path):
        confmat = jnp.zeros((num_classes, num_classes), jnp.int32)
        ious = []
        # tqdm-parity meter (reference test.py:156 wraps the loader in tqdm)
        from hyperseg_tpu.utils.logging import ProgressMeter
        pbar = ProgressMeter(len(loader), unit="batches")
        for i, batch in enumerate(loader):
            if isinstance(batch["image"], (list, tuple)):
                b = {"image": [jax.device_put(jnp.asarray(p), batch_sharding)
                               for p in batch["image"]],
                     "label": jax.device_put(
                         jnp.asarray(batch["label"], jnp.int32),
                         batch_sharding)}
                out = eval_step_pyramid(params, b)
            else:
                b = {"image": jax.device_put(jnp.asarray(batch["image"]),
                                             batch_sharding),
                     "label": jax.device_put(
                         jnp.asarray(batch["label"], jnp.int32),
                         batch_sharding)}
                out = eval_step(params, b)
            confmat = confmat + out["confmat"]
            preds = np.asarray(out["preds"])
            labels = np.asarray(batch["label"])
            for j in range(labels.shape[0]):
                if len(ious) >= len(test_ds):
                    break  # pad_last filler images carry no jaccard entry
                ious.append(M.per_image_jaccard(
                    labels[j], preds[j], num_classes,
                    ignore_index=display_background_index))
            pbar.update()
        pbar.close()
        ious = np.array(ious)
        global_acc, class_acc, class_iou = M.eval_scores_from_confmat(
            np.asarray(confmat))
        np.savez(scores_path, ious=ious, global_acc=global_acc,
                 class_acc=class_acc, class_iou=class_iou)
    else:
        z = np.load(scores_path)
        ious, global_acc = z["ious"], z["global_acc"]
        class_acc, class_iou = z["class_acc"], z["class_iou"]

    print(f"global_acc={global_acc}")
    print(f"class_acc={class_acc}")
    print(f"class_iou={class_iou}")
    print(f"mIoU={np.mean(class_iou)}")

    # best/worst visualizations, saved as PNG grids (test.py:197-207)
    if display_worst or display_best:
        order = np.argsort(ious)
        out_dir = out_dir or cache_dir
        subsets = []
        if display_worst:
            subsets.append(("worst", order[:display_worst]))
        if display_best:
            subsets.append(("best", order[-display_best:]))
        from glob import glob
        from PIL import Image
        # display_sources: directories of label-index PNGs (e.g. another
        # model's saved predictions), one per dataset item; each becomes an
        # extra blended column between the input and the prediction
        # (test.py:260-285)
        source_paths = []
        ds_stems = [os.path.splitext(os.path.basename(p))[0]
                    for p in getattr(test_ds, "images", [])]
        for d in display_sources or []:
            paths = sorted(glob(os.path.join(d, "*.png")))
            assert len(paths) == len(test_ds), (
                "all display sources must be directories with the same "
                "number of images as the dataset")
            if ds_stems:
                # match by basename stem, not sort order: a zero-padding or
                # naming difference would otherwise silently blend the wrong
                # source under each input
                by_stem = {os.path.splitext(os.path.basename(p))[0]: p
                           for p in paths}
                missing = [s for s in ds_stems if s not in by_stem]
                assert not missing, (
                    f"display source {d} has no image for dataset items "
                    f"{missing[:5]}{'...' if len(missing) > 5 else ''}")
                paths = [by_stem[s] for s in ds_stems]
            source_paths.append(np.array(paths))
        for tag, idxs in subsets:
            rows = []
            for idx in idxs:
                img, lbl = test_ds[int(idx)]
                if isinstance(img, (list, tuple)):
                    img = img[0]  # pyramid transforms: visualize base scale
                out = eval_step(params, {
                    "image": jnp.asarray(img)[None],
                    "label": jnp.asarray(lbl, jnp.int32)[None]})
                pred = np.asarray(out["preds"])[0]
                base = denormalize(np.asarray(img))
                src_cols = []
                for paths in source_paths:
                    src = np.array(Image.open(paths[int(idx)]))
                    pad_h = max(0, base.shape[0] - src.shape[0])
                    pad_w = max(0, base.shape[1] - src.shape[1])
                    if pad_h or pad_w:  # pad right/bottom like the reference
                        src = np.pad(src, ((0, pad_h), (0, pad_w)))
                    src = src[:base.shape[0], :base.shape[1]]
                    src_cols.append(blend_seg(
                        base, src, test_ds.color_map, display_alpha,
                        ignore_index=display_background_index))
                rows.append(make_grid(
                    base, *src_cols,
                    blend_seg(base, pred, test_ds.color_map, display_alpha,
                              ignore_index=display_background_index),
                    blend_seg(base, lbl, test_ds.color_map, display_alpha,
                              ignore_index=255)))
            grid = np.concatenate(rows, axis=0)
            path = os.path.join(out_dir, f"{tag}.png")
            Image.fromarray((grid * 255).astype(np.uint8)).save(path)
            print(f"saved {tag} predictions grid to {path}")

    return float(np.mean(class_iou))


def cli():
    import argparse
    p = argparse.ArgumentParser("hyperseg_tpu test")
    p.add_argument("exp_dir")
    p.add_argument("-m", "--model", help="checkpoint (.npz or .pth)")
    p.add_argument("-a", "--arch", help="override arch string")
    p.add_argument("-td", "--test_dataset", required=True)
    p.add_argument("-it", "--img_transforms", nargs="+")
    p.add_argument("-tt", "--tensor_transforms", nargs="+",
                   default=list(DEFAULT_TENSOR_TRANSFORMS))
    p.add_argument("-b", "--batch_size", type=int, default=4)
    p.add_argument("-w", "--workers", type=int, default=4)
    p.add_argument("-f", "--forced", action="store_true")
    p.add_argument("-dw", "--display_worst", type=int, default=0)
    p.add_argument("-db", "--display_best", type=int, default=0)
    p.add_argument("-ds", "--display_sources", nargs="+",
                   help="directories of label-index PNGs to blend as extra "
                        "comparison columns (one image per dataset item)")
    p.add_argument("--compute_dtype", default="float32")
    a = p.parse_args()
    main(a.exp_dir, model=a.model, arch=a.arch, test_dataset=a.test_dataset,
         img_transforms=a.img_transforms, tensor_transforms=a.tensor_transforms,
         batch_size=a.batch_size, workers=a.workers, forced=a.forced,
         display_worst=a.display_worst, display_best=a.display_best,
         display_sources=a.display_sources, compute_dtype=a.compute_dtype)


if __name__ == "__main__":
    cli()
