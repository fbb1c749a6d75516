"""Training entry point — the equivalent of hyperseg/train.py.

Epoch-based train/val loop with on-device metrics, SPMD data parallelism over
all local devices, Adam + per-batch PolyLR, bootstrapped CE, TensorBoard
logging, and self-describing latest/best checkpoints with resume.

Config interface mirrors the reference's executable-config style
(configs/train/*.py): a Python file imports this `main` and calls it with
dataset/transform/model Specs. Differences from the reference: specs are
declarative (registry.Spec / strings, no eval); optimizer/scheduler are
dicts ({'lr', 'betas'} / {'power', 'max_epoch'}) rather than torch partials.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from hyperseg_tpu.core import checkpoint as C
from hyperseg_tpu.core import registry
from hyperseg_tpu.data.loader import DataLoader, RandomSampler
from hyperseg_tpu.data.seg_transforms import Compose
from hyperseg_tpu.parallel import make_mesh_for_batch, replicate_params, data_sharded
from hyperseg_tpu.train import losses as L
from hyperseg_tpu.train import metrics as M
from hyperseg_tpu.train import schedule as S
from hyperseg_tpu.train import step as T
from hyperseg_tpu.utils.logging import ProgressMeter, TensorBoardLogger

DEFAULT_TENSOR_TRANSFORMS = (
    "hyperseg_tpu.data.seg_transforms.ToArray()",
    "hyperseg_tpu.data.seg_transforms.Normalize()",
)


def _build_list(specs):
    if specs is None:
        return []
    return [registry.build(s) if isinstance(s, str) else
            (s if not isinstance(s, registry.Spec) else s.build())
            for s in specs]


def main(exp_dir, *, model, train_dataset, val_dataset=None,
         train_img_transforms=None, val_img_transforms=None,
         tensor_transforms=DEFAULT_TENSOR_TRANSFORMS,
         epochs=100, train_iterations=None, batch_size=16, workers=4,
         optimizer=None, scheduler=None, criterion=None, pretrained=False,
         pretrained_weights=None, batch_scheduler=True, resume=None, seed=0,
         compute_dtype="float32", log_every=50, devices=None):
    logger = TensorBoardLogger(exp_dir)
    rng = jax.random.PRNGKey(seed)
    np.random.seed(seed)

    # datasets (train.py:184-197)
    t_tf = _build_list(tensor_transforms)
    train_tf = Compose(_build_list(train_img_transforms) + t_tf)
    train_ds = registry.build(train_dataset, transforms=train_tf)
    val_ds = None
    if val_dataset is not None:
        val_tf = Compose(_build_list(val_img_transforms) + t_tf)
        val_ds = registry.build(val_dataset, transforms=val_tf)

    mesh = make_mesh_for_batch(batch_size, devices=devices)
    put = lambda b: {k: jax.device_put(v, data_sharded(mesh)) for k, v in b.items()}
    sampler = (RandomSampler(train_ds, train_iterations, seed=seed)
               if train_iterations is not None else None)
    train_loader = DataLoader(train_ds, batch_size=batch_size, sampler=sampler,
                              shuffle=sampler is None, drop_last=True,
                              workers=workers, device_put=put)
    val_loader = (DataLoader(val_ds, batch_size=batch_size, workers=workers,
                             pad_last=True, device_put=put)
                  if val_ds is not None else None)

    # model (train.py:203-204): arch string stored for checkpoint rebuild
    num_classes = len(train_ds.classes)
    arch = C.arch_string(model, num_classes=num_classes)
    build_kw = dict(num_classes=num_classes)
    if pretrained:
        # ImageNet backbone init (resolves a local .pth or downloads;
        # raises when unsatisfiable — see backbones/pretrained.py)
        build_kw["pretrained"] = pretrained
    model_obj = registry.build(model, **build_kw)
    params = model_obj.init(rng)
    if pretrained_weights:
        loaded, _ = C.load_params(pretrained_weights)
        matched = {k: v for k, v in loaded.items()
                   if k in params and params[k].shape == v.shape}
        params.update(matched)
        print(f"=> loaded {len(matched)}/{len(params)} tensors from "
              f"{pretrained_weights}")

    # optimizer + scheduler (Adam beta1=0.5 + per-batch PolyLR in all
    # reference configs)
    opt_cfg = dict(optimizer or {})
    lr = opt_cfg.get("lr", 1e-3)
    betas = opt_cfg.get("betas", (0.5, 0.999))
    sch_cfg = dict(scheduler or {})
    steps_per_epoch = len(train_loader)
    max_steps = sch_cfg.get("max_epoch",
                            epochs * (steps_per_epoch if batch_scheduler else 1))
    schedule = S.poly_lr(lr, max_steps, power=sch_cfg.get("power", 0.9))
    optimizer_t = T.make_optimizer(schedule, beta1=betas[0], beta2=betas[1])

    criterion_obj = (registry.build(criterion) if criterion is not None
                     else L.BootstrappedCrossEntropyLoss(ignore_index=255))

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    # donate the previous step's state buffers: params/opt-state update in
    # place on device, halving the peak optimizer-state footprint
    train_step = jax.jit(T.make_train_step(
        model_obj, criterion_obj, optimizer_t, num_classes=num_classes,
        compute_dtype=dtype), donate_argnums=(0,))
    eval_step = jax.jit(T.make_eval_step(model_obj, num_classes=num_classes,
                                         compute_dtype=dtype))

    state = T.init_train_state(replicate_params(mesh, params), optimizer_t)

    # resume (train.py:210-233)
    start_epoch, best_iou = 0, 0.0
    ckpt_path = None
    if resume is not None:
        ckpt_path = (os.path.join(resume, "model_latest.npz")
                     if os.path.isdir(resume) else resume)
    elif os.path.isfile(os.path.join(exp_dir, "model_latest.npz")):
        ckpt_path = os.path.join(exp_dir, "model_latest.npz")
    if ckpt_path and os.path.isfile(ckpt_path):
        print(f"=> resuming from '{ckpt_path}'")
        loaded, meta = C.load_params(ckpt_path)
        state["params"] = replicate_params(mesh, loaded)
        start_epoch = int(meta.get("epoch", 0))
        best_iou = float(meta.get("best_iou", 0.0))
        state["step"] = jnp.asarray(
            int(meta.get("step", start_epoch * steps_per_epoch)), jnp.int32)
        opt_path = ckpt_path[:-4] + ".opt.npz"
        if os.path.isfile(opt_path):
            state["opt_state"] = C.load_opt_state(opt_path, state["opt_state"])

    def process_epoch(loader, train: bool, epoch: int):
        nonlocal state
        phase = "TRAINING" if train else "VALIDATION"
        logger.reset(prefix=f"{phase}: Epoch: {epoch + 1} / {epochs};")
        # tqdm-parity live meter (reference train.py:97): counter/rate tick
        # every batch with no device sync; the description (str(logger))
        # refreshes only at the log_every sync points
        pbar = ProgressMeter(len(loader), unit="batches")
        confmat = jnp.zeros((num_classes, num_classes), jnp.int32)
        loss_sum, steps = 0.0, 0
        for i, batch in enumerate(loader):
            batch = {"image": jnp.asarray(batch["image"]),
                     "label": jnp.asarray(batch["label"], jnp.int32)}
            if train:
                step_rng = jax.random.fold_in(rng, epoch * 100003 + i)
                state, metrics = train_step(state, batch, step_rng)
                confmat = confmat + metrics["confmat"]
                if (i + 1) % log_every == 0:
                    loss = float(metrics["loss"])
                    scores = M.scores_from_confmat(confmat)
                    logger.update("losses", total=loss)
                    logger.update("bench", iou=scores["mean_iou"])
                    # reference train.py:146: per-batch scalars under 'batch'
                    # at total-sample step
                    logger.log_scalars_val(
                        "batch", (epoch * steps_per_epoch + i) * batch_size)
                    pbar.set_description(str(logger))
                    loss_sum += loss
                    steps += 1
            else:
                out = eval_step(state["params"], batch)
                confmat = confmat + out["confmat"]
                if i == 0 and hasattr(train_ds, "color_map"):
                    from hyperseg_tpu.utils.img_utils import (blend_seg,
                                                              denormalize,
                                                              make_grid)
                    img = denormalize(np.asarray(batch["image"][0]))
                    pred = np.asarray(out["preds"][0])
                    lbl = np.asarray(batch["label"][0])
                    if img.shape[:2] != pred.shape[:2]:
                        # image-only val resize: upscale the image for display
                        from PIL import Image as PILImage
                        pil = PILImage.fromarray((img * 255).astype(np.uint8))
                        pil = pil.resize(pred.shape[:2][::-1])
                        img = np.asarray(pil, np.float32) / 255.0
                    grid = make_grid(
                        img, blend_seg(img, pred, train_ds.color_map),
                        blend_seg(img, lbl, train_ds.color_map))
                    logger.log_image("val/pred", grid, epoch)
            pbar.update()
        scores = M.scores_from_confmat(confmat)
        if not train:
            logger.update("bench", iou=scores["mean_iou"])
            pbar.set_description(str(logger))
            names = [getattr(c, "name", str(c)) for c in train_ds.classes]
            logger.log_heatmap("val/confusion", np.asarray(confmat), epoch,
                               labels=names)
        pbar.close()
        # reference train.py:150-151: epoch-averaged losses + current bench
        logger.log_scalars_avg(f"epoch/{'train' if train else 'val'}", epoch,
                               category="losses")
        logger.log_scalars_val(f"epoch/{'train' if train else 'val'}", epoch,
                               category="bench")
        return (loss_sum / max(steps, 1)), scores["mean_iou"]

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        epoch_loss, epoch_iou = process_epoch(train_loader, True, epoch)
        if val_loader is not None:
            epoch_loss, epoch_iou = process_epoch(val_loader, False, epoch)
        is_best = epoch_iou >= best_iou
        best_iou = max(epoch_iou, best_iou)
        print(f"epoch {epoch}: mIoU={epoch_iou:.4f} best={best_iou:.4f} "
              f"({time.time() - t0:.1f}s)")
        C.save_checkpoint(exp_dir, "model", C.jnp_to_np(state["params"]),
                          meta={"epoch": epoch + 1, "best_iou": best_iou,
                                "arch": arch, "step": int(state["step"])},
                          opt_state=state["opt_state"], is_best=is_best)
    return best_iou


def cli():
    import argparse
    p = argparse.ArgumentParser("hyperseg_tpu train")
    p.add_argument("exp_dir")
    p.add_argument("-m", "--model", required=True, help="model spec string")
    p.add_argument("-td", "--train_dataset", required=True)
    p.add_argument("-vd", "--val_dataset")
    p.add_argument("-tit", "--train_img_transforms", nargs="+")
    p.add_argument("-vit", "--val_img_transforms", nargs="+")
    p.add_argument("-tt", "--tensor_transforms", nargs="+",
                   default=list(DEFAULT_TENSOR_TRANSFORMS))
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-ti", "--train_iterations", type=int)
    p.add_argument("-b", "--batch_size", type=int, default=16)
    p.add_argument("-w", "--workers", type=int, default=4)
    p.add_argument("-lr", type=float, default=1e-3)
    p.add_argument("-r", "--resume")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", default="float32")
    a = p.parse_args()
    main(a.exp_dir, model=a.model, train_dataset=a.train_dataset,
         val_dataset=a.val_dataset, train_img_transforms=a.train_img_transforms,
         val_img_transforms=a.val_img_transforms,
         tensor_transforms=a.tensor_transforms, epochs=a.epochs,
         train_iterations=a.train_iterations, batch_size=a.batch_size,
         workers=a.workers, optimizer={"lr": a.lr}, resume=a.resume,
         seed=a.seed, compute_dtype=a.compute_dtype)


if __name__ == "__main__":
    cli()
