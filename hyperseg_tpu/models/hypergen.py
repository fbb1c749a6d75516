"""HyperGen: backbone -> weight mapper (context head) -> dynamic decoder.

Shared top-level module for all HyperSeg variants (reference:
hyperseg_v1_0.py:12-91, hyperseg_v0_1.py:11-88, hyperseg_v1_0_unify.py:12-93 —
their HyperGen classes are structurally identical; only the decoder/mapper
differ). Pure-functional: the class is a static plan; `__call__` is the
jit-traceable forward.

Test-time augmentation (pyramid + hflip gather, hyperseg_v1_0.py:62-91) is
exposed via `forward_pyramid`; note the reference quirk that plain tensor
inputs bypass TTA entirely (quirk #5) — `__call__` is that plain path.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from hyperseg_tpu.nn import functional as F


class HyperGen:
    def __init__(self, backbone, decoder, weight_mapper, *,
                 inference_hflip=False, inference_gather="mean"):
        self.backbone = backbone
        self.decoder = decoder
        self.weight_mapper = weight_mapper
        self.inference_hflip = inference_hflip
        self.inference_gather = inference_gather

    @property
    def hyper_params(self):
        return self.decoder.hyper_params

    def init(self, rng):
        params = {}
        kb, kw, kd = jax.random.split(rng, 3)
        bp = self.backbone.init(kb)
        params.update({f"backbone.{k}": v for k, v in bp.items()})
        self.weight_mapper.init(kw, params)
        self.decoder.init(kd, params)
        # factories built with pretrained=True stage ImageNet backbone
        # weights here; the load is strict (reference load_pretrained_weights
        # asserts only _fc.* may be missing, efficientnet_utils.py:669-674)
        backbone_pre = getattr(self, "_pretrained_backbone", None)
        if backbone_pre:
            bad = [k for k, v in backbone_pre.items()
                   if k not in params or params[k].shape != v.shape]
            if bad:
                raise RuntimeError(
                    f"pretrained backbone checkpoint does not match this "
                    f"architecture: {len(bad)} unmatched keys, e.g. {bad[:3]}")
            params.update(backbone_pre)
            print(f"=> loaded {len(backbone_pre)} ImageNet backbone tensors")
        # factories built with weights_path= stage converted checkpoint
        # parameters here; shape-matching tensors override the random init
        loaded = getattr(self, "_pretrained_params", None)
        if loaded:
            n = 0
            for k, v in loaded.items():
                if k in params and params[k].shape == v.shape:
                    params[k] = v
                    n += 1
            print(f"=> initialized {n}/{len(params)} tensors from checkpoint")
        return params

    def _backbone_params(self, params):
        return {k[len("backbone."):]: v for k, v in params.items()
                if k.startswith("backbone.")}

    def __call__(self, params, x, ctx=None, *, train=False, rng=None):
        """Single-tensor forward (process_single_tensor, hyperseg_v1_0.py:52-60).
        x: (B, H, W, 3) NHWC -> logits (B, H, W, num_classes)."""
        if ctx is None and (train or rng is not None):
            ctx = F.Ctx(train=train, rng=rng)
        # the backbone sees stripped parameter names; collect its BN-state
        # updates in a sub-context and re-prefix them
        bctx = None
        if ctx is not None:
            bctx = F.Ctx(train=ctx.train, rng=ctx.rng)
        # named_scope boundaries feed the generic scope profiler
        # (utils/profile.py flops_by_scope — the hook-registry analogue)
        with jax.named_scope("backbone"):
            feats = self.backbone(self._backbone_params(params), x, bctx)
        if bctx is not None and bctx.updates:
            ctx.updates.update({f"backbone.{k}": v for k, v in bctx.updates.items()})
            ctx.batch_stats.update({f"backbone.{k}": v
                                    for k, v in bctx.batch_stats.items()})
        with jax.named_scope("weight_mapper"):
            s = self.weight_mapper(params, feats[-1], ctx)
        with jax.named_scope("decoder"):
            ins = [x] + feats[:-1]
            if self._scan_decoder(ctx, ins):
                # Eval-only batch scan: per-IMAGE decoder cost at batch >= 2
                # is 1.5-4x its batch-1 value (XLA materializes the per-patch
                # layouts it fuses away at batch 1 — BENCHMARKS.md "Batch
                # scaling"), while the backbone and mapper amortize with
                # batch. Scanning the decoder over the batch keeps the
                # batched backbone AND the batch-1 decoder graph (including
                # its measured batch-1 kernel-dispatch mix) for each image.
                def one(args):
                    ins_i, s_i = args
                    ins_b = [f[None] for f in ins_i]
                    s_b = jax.tree.map(lambda t: t[None], s_i)
                    return self.decoder(params, ins_b, s_b, None)[0]

                return jax.lax.map(one, (ins, s))
            return self.decoder(params, ins, s, ctx)

    def _scan_decoder(self, ctx, ins):
        """Dispatch policy for the eval decoder batch scan (trace-time).

        Batch-gated, eval-only, and pixel-gated on the FINEST map the decoder
        consumes (every decoder family processes xs[-lv-1], so that is
        xs[len(xs) - n_levels]): the scan wins where the batched decoder pays
        XLA's per-patch materialization (finest map <= ~300k px, +12..62%
        in-graph at b8) and loses ~5% where one huge full-resolution level
        dominates and the fused kernel already amortizes the batch itself
        (L-CamVid, 786k px) — see BENCHMARKS.md round-5 scan table."""
        from hyperseg_tpu.ops import pallas as pallas_cfg
        if not (not (ctx is not None and ctx.train)
                and pallas_cfg.DECODER_SCAN_MIN_BATCH
                and ins[0].shape[0] >= pallas_cfg.DECODER_SCAN_MIN_BATCH
                and (pallas_cfg.kernels_available()
                     or pallas_cfg.DECODER_SCAN_FORCE)):
            return False
        finest = ins[max(0, len(ins) - len(self.decoder.level_units))]
        return (finest.shape[1] * finest.shape[2]
                <= pallas_cfg.DECODER_SCAN_MAX_PIXELS)

    def apply_train(self, params, x, rng):
        """Training forward: returns (logits, state_updates) where
        state_updates carries new BN running stats (flat dict)."""
        ctx = F.Ctx(train=True, rng=rng)
        y = self(params, x, ctx)
        return y, ctx.updates

    def forward_pyramid(self, params, pyramid: Sequence):
        """Multi-scale + optional hflip ensembling (hyperseg_v1_0.py:71-91).
        The first pyramid level sets the output resolution."""
        out_res = pyramid[0].shape[1:3]
        out = None
        for x in pyramid:
            if self.inference_hflip:
                a = self(params, x)
                b = self(params, x[:, :, ::-1])[:, :, ::-1]
                p = jnp.maximum(a, b)
            else:
                p = self(params, x)
            if p.shape[1:3] != out_res:
                p = F.resize_bilinear(p, out_res)
            if out is None:
                out = p
            elif self.inference_gather == "mean":
                out = (out + p) * 0.5
            else:
                out = jnp.maximum(out, p)
        return out


def smoke_main(default_model: str):
    """Module smoke harness: build from a spec string, run a random-input
    forward, print the output shape (the reference's per-module __main__
    convention, e.g. hyperseg_v1_0.py:830-865)."""
    import argparse
    import numpy as np
    import jax
    import jax.numpy as jnp
    from hyperseg_tpu.core import registry

    p = argparse.ArgumentParser("hyperseg_tpu model smoke test")
    p.add_argument("-m", "--model", default=default_model, help="model spec")
    p.add_argument("-r", "--res", default=(512,), type=int, nargs="+")
    p.add_argument("-p", "--pyramids", type=int)
    p.add_argument("-b", "--batch", default=1, type=int)
    a = p.parse_args()
    res = tuple(a.res) * 2 if len(a.res) == 1 else tuple(a.res)

    model = registry.build(a.model)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.rand(a.batch, *res, 3), jnp.float32)
    if a.pyramids:
        from hyperseg_tpu.utils.img_utils import create_pyramid
        pyd = [jnp.asarray(t) for t in create_pyramid(np.asarray(x), a.pyramids)]
        out = model.forward_pyramid(params, pyd)
    else:
        out = jax.jit(lambda p, x: model(p, x))(params, x)
    print(out.shape)
