"""EfficientNet encoder, TPU-native (NHWC, functional, static plan + pure apply).

Capability parity with the reference backbone
(hyperseg/models/backbones/efficientnet.py, efficientnet_utils.py):
  * b0–b8 / l2 compound scaling plus the HyperSeg 'c*' / 's*' custom variants
    (efficientnet_utils.py:563-610).
  * multi-scale feature taps: the last block of each stride level is marked
    (efficientnet.py:186-204) and optionally compressed by a 1x1+BN `_feat_fc_i`
    controlled by `out_feat_scale` (efficientnet.py:207-222).
  * the `feat_channels` contract consumed by HyperGen (efficientnet.py:204,227).
  * TF-style SAME padding **computed from the nominal model image size**, not
    the runtime size — the reference builds Conv2dStaticSamePadding from the
    compile-time size trace (240 for b1, 300 for b3, ...), so at odd
    intermediate nominal sizes the pad amounts differ from true runtime SAME.
    Checkpoint parity requires reproducing that exactly
    (efficientnet_utils.py:254-269).

Design: the class computes a static *plan* (block configs, pad amounts,
channel counts) in Python at construction; `apply` is a pure function over a
flat {torch-style key: array} parameter dict, fully jit-traceable with
unrolled block loops and static shapes.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, replace
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from hyperseg_tpu.nn import functional as F

# ---------------------------------------------------------------------------
# Architecture tables
# ---------------------------------------------------------------------------

# width, depth, nominal resolution, dropout — standard EfficientNet compound
# scaling coefficients (efficientnet_utils.py:465-505).
SCALING = {
    "b0": (1.0, 1.0, 224, 0.2), "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3), "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4), "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5), "b7": (2.0, 3.1, 600, 0.5),
    "b8": (2.2, 3.6, 672, 0.5), "l2": (4.3, 5.3, 800, 0.5),
}

# MBConv stage specs: (repeats, kernel, stride, expand, in, out, se_ratio)
BASE_STAGES = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]

# HyperSeg custom variants (efficientnet_utils.py:579-600): 'c*' adds an extra
# stride level (head 1920ch), 's*' moves the first stage to stride 2.
C_STAGES = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (4, 5, 2, 6, 192, 320, 0.25),
    (1, 3, 1, 6, 320, 480, 0.25),
]
S_STAGES = [
    (1, 3, 2, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]

BN_EPS = 1e-3
BN_MOMENTUM = 0.01  # torch momentum convention (1 - 0.99)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """Width scaling with divisor snapping (efficientnet_utils.py:82-107)."""
    if not width:
        return filters
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    if not depth:
        return repeats
    return int(math.ceil(depth * repeats))


def _nominal_out_size(size, stride):
    return [int(math.ceil(size[0] / stride)), int(math.ceil(size[1] / stride))]


@dataclass(frozen=True)
class MBConvPlan:
    in_ch: int
    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ch: Optional[int]
    id_skip: bool
    dw_pad: Tuple[Tuple[int, int], Tuple[int, int]]  # static SAME pad for the depthwise conv
    is_feat: bool  # last block of its stride level


class EfficientNet:
    """Static plan + functional apply for the EfficientNet feature extractor.

    Args mirror the reference factory (efficientnet.py:493-502 +
    global-params): `out_feat_scale` may be a scalar or per-level list;
    `head`/`pool` control the (unused in HyperSeg) classifier tail.
    """

    def __init__(self, model_name: str, *, out_feat_scale=0.25, in_channels=3,
                 num_classes=1000, head=None, pool=False, return_features=True,
                 drop_connect_rate=0.2, dropout_rate=None, remat=False):
        m = re.fullmatch(r"efficientnet-([bcsl])(\d)", model_name)
        if not m:
            raise ValueError(f"unknown efficientnet variant {model_name!r}")
        family, idx = m.group(1), m.group(2)
        scale_key = "l2" if family == "l" else f"b{idx}"
        width, depth, nominal, default_dropout = SCALING[scale_key]
        stages = {"b": BASE_STAGES, "l": BASE_STAGES, "c": C_STAGES, "s": S_STAGES}[family]
        head_ch_base = 1920 if family == "c" else 1280

        self.model_name = model_name
        self.in_channels = in_channels
        self.pool = pool
        self.head = head
        self.num_classes = num_classes
        self.return_features = return_features
        self.drop_connect_rate = drop_connect_rate
        self.dropout_rate = default_dropout if dropout_rate is None else dropout_rate
        # jax.checkpoint each block during training; spec per
        # F.checkpoint_policy (False | True/'full' | 'dots')
        self.remat = remat

        size = [nominal, nominal]
        self.stem_ch = round_filters(32, width)
        self.stem_pad = F.same_padding_2d(size, (3, 3), (2, 2))
        size = _nominal_out_size(size, 2)

        # Resolve blocks with the nominal-size padding trace.
        blocks: List[MBConvPlan] = []
        res_feat_mask: List[bool] = []
        feat_nc: List[int] = []
        for (r, k, s, e, ci, co, se) in stages:
            ci = round_filters(ci, width)
            co = round_filters(co, width)
            r = round_repeats(r, depth)
            if s > 1 and res_feat_mask:
                res_feat_mask[-1] = True
            res_feat_mask += [False] * r
            feat_nc += [co] * r
            for j in range(r):
                stride = s if j == 0 else 1
                bin_ch = ci if j == 0 else co
                mid = bin_ch * e
                se_ch = max(1, int(bin_ch * se)) if se else None
                dw_pad = F.same_padding_2d(size, (k, k), (stride, stride))
                blocks.append(MBConvPlan(
                    in_ch=bin_ch, out_ch=co, expand=e, kernel=k, stride=stride,
                    se_ch=se_ch, id_skip=True,
                    dw_pad=dw_pad, is_feat=False))
                size = _nominal_out_size(size, stride)
        res_feat_mask[-1] = True
        self.blocks = [replace(b, is_feat=res_feat_mask[i]) for i, b in enumerate(blocks)]

        # Feature compressors (efficientnet.py:207-222).
        self.feat_channels = [nc for nc, m_ in zip(feat_nc, res_feat_mask) if m_]
        self.out_feat_scale = out_feat_scale
        self.feat_fc: List[Optional[Tuple[int, int]]] = []
        if out_feat_scale is not None:
            for i, nc in enumerate(self.feat_channels):
                scale = (out_feat_scale[i] if isinstance(out_feat_scale, (list, tuple))
                         else out_feat_scale)
                out_nc = int(round(nc * scale))
                if scale != 1.0:
                    self.feat_fc.append((nc, out_nc))
                    self.feat_channels[i] = out_nc
                else:
                    self.feat_fc.append(None)
        else:
            self.feat_fc = [None] * len(self.feat_channels)

        self.head_ch = round_filters(head_ch_base, width)
        self.feat_channels = list(self.feat_channels) + [self.head_ch]

    # -- parameters ---------------------------------------------------------

    def init(self, rng) -> dict:
        """Initialize parameters (flat dict, torch-compatible key names,
        HWIO conv layout). Conv init follows torch's default kaiming-uniform."""
        params = {}

        def key_stream(base):
            i = 0
            while True:
                yield jax.random.fold_in(base, i)
                i += 1

        keys = key_stream(rng)

        def conv(name, kh, kw, cin, cout, bias=False):
            fan_in = kh * kw * cin
            bound = 1.0 / math.sqrt(fan_in)
            params[f"{name}.weight"] = jax.random.uniform(
                next(keys), (kh, kw, cin, cout), jnp.float32, -bound, bound)
            if bias:
                params[f"{name}.bias"] = jax.random.uniform(
                    next(keys), (cout,), jnp.float32, -bound, bound)

        def bn(name, c):
            params[f"{name}.weight"] = jnp.ones((c,), jnp.float32)
            params[f"{name}.bias"] = jnp.zeros((c,), jnp.float32)
            params[f"{name}.running_mean"] = jnp.zeros((c,), jnp.float32)
            params[f"{name}.running_var"] = jnp.ones((c,), jnp.float32)

        conv("_conv_stem", 3, 3, self.in_channels, self.stem_ch)
        bn("_bn0", self.stem_ch)
        for i, bp in enumerate(self.blocks):
            p = f"_blocks.{i}"
            mid = bp.in_ch * bp.expand
            if bp.expand != 1:
                conv(f"{p}._expand_conv", 1, 1, bp.in_ch, mid)
                bn(f"{p}._bn0", mid)
            conv(f"{p}._depthwise_conv", bp.kernel, bp.kernel, 1, mid)
            bn(f"{p}._bn1", mid)
            if bp.se_ch is not None:
                conv(f"{p}._se_reduce", 1, 1, mid, bp.se_ch, bias=True)
                conv(f"{p}._se_expand", 1, 1, bp.se_ch, mid, bias=True)
            conv(f"{p}._project_conv", 1, 1, mid, bp.out_ch)
            bn(f"{p}._bn2", bp.out_ch)
        for i, fc in enumerate(self.feat_fc):
            if fc is not None:
                cin, cout = fc
                conv(f"_feat_fc_{i}.0", 1, 1, cin, cout)
                bn(f"_feat_fc_{i}.1", cout)
        last_out = self.blocks[-1].out_ch
        conv("_conv_head", 1, 1, last_out, self.head_ch)
        bn("_bn1", self.head_ch)
        if self.head is not None:
            bound = 1.0 / math.sqrt(self.head_ch)
            params["_fc.weight"] = jax.random.uniform(
                next(keys), (self.head_ch, self.num_classes), jnp.float32, -bound, bound)
            params["_fc.bias"] = jax.random.uniform(
                next(keys), (self.num_classes,), jnp.float32, -bound, bound)
        # efficientnet(pretrained=...) stages ImageNet weights here; strict
        # load, load_fc=False semantics (efficientnet_utils.py:669-674)
        staged = getattr(self, "_pretrained_backbone", None)
        if staged:
            bad = [k for k, v in staged.items()
                   if k not in params or params[k].shape != v.shape]
            if bad:
                raise RuntimeError(
                    f"pretrained checkpoint does not match "
                    f"'{self.model_name}': {len(bad)} unmatched keys, "
                    f"e.g. {bad[:3]}")
            params.update(staged)
            print(f"=> loaded {len(staged)} ImageNet tensors")
        return params

    # -- forward ------------------------------------------------------------

    def _bn(self, params, name, x, ctx=None):
        return F.apply_bn(params, name, x, ctx, eps=BN_EPS, momentum=BN_MOMENTUM)

    def _block(self, params, prefix, bp: MBConvPlan, x, ctx, *, drop_rate, rng):
        inputs = x
        mid = bp.in_ch * bp.expand
        if bp.expand != 1:
            x = F.conv2d(x, params[f"{prefix}._expand_conv.weight"])
            x = F.swish(self._bn(params, f"{prefix}._bn0", x, ctx))
        x = F.conv2d(x, params[f"{prefix}._depthwise_conv.weight"],
                     stride=(bp.stride, bp.stride), padding=bp.dw_pad, groups=mid)
        x = F.swish(self._bn(params, f"{prefix}._bn1", x, ctx))
        if bp.se_ch is not None:
            se = F.adaptive_avg_pool_1(x)
            se = F.conv2d(se, params[f"{prefix}._se_reduce.weight"],
                          params[f"{prefix}._se_reduce.bias"])
            se = F.swish(se)
            se = F.conv2d(se, params[f"{prefix}._se_expand.weight"],
                          params[f"{prefix}._se_expand.bias"])
            x = jax.nn.sigmoid(se) * x
        x = F.conv2d(x, params[f"{prefix}._project_conv.weight"])
        x = self._bn(params, f"{prefix}._bn2", x, ctx)
        if bp.id_skip and bp.stride == 1 and bp.in_ch == bp.out_ch:
            if ctx is not None and ctx.train and drop_rate and rng is not None:
                keep = 1.0 - drop_rate
                mask = jnp.floor(keep + jax.random.uniform(
                    rng, (x.shape[0], 1, 1, 1), x.dtype))
                x = x / keep * mask
            x = x + inputs
        return x

    def _stem(self, params, x):
        """Stem conv (3x3/s2). Note: a space-to-depth rewrite (k2/s1 over a
        4*Cin view) was measured and is SLOWER on v5e than the plain conv —
        both the 6-D transpose and strided-slice constructions of the s2d view
        cost more than the 3-channel lane waste they remove."""
        return F.conv2d(x, params["_conv_stem.weight"], stride=(2, 2),
                        padding=self.stem_pad)

    def _stem_kernel_ok(self, x, ctx):
        """True when the eval-mode fused Pallas stem applies (TPU backend,
        supported shape, the kernel's TF-SAME (0,1)x(0,1) pad convention)."""
        from hyperseg_tpu.ops import pallas as pallas_cfg
        if not (pallas_cfg.STEM_ENABLED and (ctx is None or not ctx.train)
                and x.shape[0] <= pallas_cfg.STEM_MAX_BATCH
                and pallas_cfg.kernels_available()):
            return False
        from hyperseg_tpu.ops.pallas import stem as stem_k
        b, h, w, cin = x.shape
        return (stem_k.supported(h, w, cin)
                and tuple(self.stem_pad) == ((0, 1), (0, 1)))

    def _stem_bn_act(self, params, x, ctx, planar=False):
        """Stem + _bn0 + swish, dispatching eval-mode supported shapes to the
        fused Pallas kernel (ops/pallas/stem.py: the XLA stem conv is the
        single most expensive op of the forward; the kernel halves it)."""
        if self._stem_kernel_ok(x, ctx):
            from hyperseg_tpu.ops.pallas import stem as stem_k
            return stem_k.stem_conv_bn_swish(
                x, params["_conv_stem.weight"],
                params["_bn0.weight"], params["_bn0.bias"],
                params["_bn0.running_mean"], params["_bn0.running_var"],
                eps=BN_EPS, planar=planar)
        if self._stem_train_kernel_ok(x, ctx) and not planar:
            # training forward through the kernel (custom_vjp: XLA backward);
            # BN runs in train mode outside it
            from hyperseg_tpu.ops.pallas import stem as stem_k
            conv = stem_k.stem_conv(x, params["_conv_stem.weight"])
            return F.swish(self._bn(params, "_bn0", conv, ctx))
        return F.swish(self._bn(params, "_bn0", self._stem(params, x), ctx))

    def _stem_train_kernel_ok(self, x, ctx):
        """Training-mode variant of _stem_kernel_ok (STEM_TRAIN_ENABLED)."""
        from hyperseg_tpu.ops import pallas as pallas_cfg
        if not (pallas_cfg.STEM_TRAIN_ENABLED
                and ctx is not None and ctx.train
                and pallas_cfg.kernels_available()):
            return False
        from hyperseg_tpu.ops.pallas import stem as stem_k
        b, h, w, cin = x.shape
        return (stem_k.supported(h, w, cin)
                and tuple(self.stem_pad) == ((0, 1), (0, 1)))

    def _fusable_prefix(self, h2, w2):
        """Leading blocks the fused planar MBConv chain absorbs
        (ops/pallas/mbconv.py): expand-1, k3, stride-1, SE blocks — b1's
        block0/1. Expand-ratio blocks (2-4) have a tested kernel
        (expand_dw_phase) but dispatching them was MEASURED SLOWER end to
        end (286 vs 379 img/s on HyperSeg-M): the 16-channel chunking that
        keeps Mosaic's nine live tap temporaries inside the 16 MB scoped
        VMEM costs more in grid overhead than the lane fill recovers, so
        the XLA path keeps blocks 2+ unless MBCONV_EXPAND_ENABLED flips
        that decision for re-measurement."""
        from hyperseg_tpu.ops import pallas as pallas_cfg
        if not pallas_cfg.MBCONV_ENABLED:
            return 0
        h, w, n = h2, w2, 0
        for bp in self.blocks:
            ok_pad = (tuple(bp.dw_pad) == ((1, 1), (1, 1)) if bp.stride == 1
                      else tuple(bp.dw_pad) == ((0, 1), (0, 1)))
            if not (bp.kernel == 3 and bp.stride in (1, 2) and ok_pad
                    and bp.se_ch is not None
                    and (bp.expand == 1 or pallas_cfg.MBCONV_EXPAND_ENABLED)):
                break
            h, w = h // bp.stride, w // bp.stride
            if w % 128 or h % 8:
                break
            n += 1
        return n

    def _fused_prefix_blocks(self, params, x_planar, fuse_n):
        """Run blocks [0, fuse_n) in channel-planar layout via the two-phase
        fused kernels. Returns (nhwc_output_of_last_block, raw_feats): at a
        mid-chain feature tap the projection runs twice (planar to continue
        the chain + NHWC for the feat — the extra matmul is tiny)."""
        from hyperseg_tpu.ops.pallas import mbconv as MB
        x = x_planar
        raw_feats = []
        for i in range(fuse_n):
            bp = self.blocks[i]
            p = f"_blocks.{i}"
            resid = (x if (bp.id_skip and bp.stride == 1
                           and bp.in_ch == bp.out_ch) else None)
            bn1 = tuple(params[f"{p}._bn1.{f}"] for f in
                        ("weight", "bias", "running_mean", "running_var"))
            if bp.expand == 1:
                hmap = MB.dw_phase(
                    x, params[f"{p}._depthwise_conv.weight"], *bn1,
                    eps=BN_EPS)
            else:
                bn0 = tuple(params[f"{p}._bn0.{f}"] for f in
                            ("weight", "bias", "running_mean", "running_var"))
                hmap = MB.expand_dw_phase(
                    x, params[f"{p}._expand_conv.weight"], bn0,
                    params[f"{p}._depthwise_conv.weight"], bn1,
                    stride=bp.stride, eps=BN_EPS)
            pooled = jnp.mean(hmap.astype(jnp.float32), axis=(2, 3))  # (B, C)
            se = F.swish(pooled @ params[f"{p}._se_reduce.weight"][0, 0]
                         + params[f"{p}._se_reduce.bias"])
            se = jax.nn.sigmoid(se @ params[f"{p}._se_expand.weight"][0, 0]
                                + params[f"{p}._se_expand.bias"])
            bn2 = tuple(params[f"{p}._bn2.{f}"] for f in
                        ("weight", "bias", "running_mean", "running_var"))
            wpj = params[f"{p}._project_conv.weight"]
            last = (i == fuse_n - 1)
            x = MB.project_phase(hmap, se, wpj, *bn2, residual=resid,
                                 nhwc=last, eps=BN_EPS)
            if bp.is_feat:
                raw_feats.append(x if last else MB.project_phase(
                    hmap, se, wpj, *bn2, residual=resid, nhwc=True,
                    eps=BN_EPS))
        return x, raw_feats

    def __call__(self, params, x, ctx=None):
        """x: (B, H, W, in_channels) NHWC. Returns the multi-scale feature list
        (one per stride level, compressed) + the stride-32 head feature —
        mirroring extract_features_list (efficientnet.py:319-363)."""
        train = ctx is not None and ctx.train
        rng = ctx.rng if ctx is not None else None
        fuse_n = (self._fusable_prefix(x.shape[1] // 2, x.shape[2] // 2)
                  if self._stem_kernel_ok(x, ctx) else 0)
        feats = []
        if fuse_n:
            with jax.named_scope("stem"):
                x = self._stem_bn_act(params, x, ctx, planar=True)
            with jax.named_scope("fused_blocks"):
                x, raw_feats = self._fused_prefix_blocks(params, x, fuse_n)
            for rf in raw_feats:
                fc = (self.feat_fc[len(feats)]
                      if self.out_feat_scale is not None else None)
                if fc is None:
                    feats.append(rf)
                else:
                    f = F.conv2d(rf, params[f"_feat_fc_{len(feats)}.0.weight"])
                    f = self._bn(params, f"_feat_fc_{len(feats)}.1", f, ctx)
                    feats.append(f)
        else:
            with jax.named_scope("stem"):
                x = self._stem_bn_act(params, x, ctx)

        n = len(self.blocks)
        rngs = jax.random.split(rng, n) if (train and rng is not None) else [None] * n
        for i, bp in enumerate(self.blocks):
            if i < fuse_n:
                continue
            drop_rate = self.drop_connect_rate * i / n if self.drop_connect_rate else 0.0
            with jax.named_scope(f"_blocks.{i}"):
                if train and self.remat:
                    # remat-safe: the block runs in its own Ctx so BN-state
                    # updates flow through the checkpointed function as outputs
                    def block_fn(p_, x_, r_, bp_=bp, i_=i, dr_=drop_rate):
                        bctx = F.Ctx(train=True, rng=None)
                        y_ = self._block(p_, f"_blocks.{i_}", bp_, x_, bctx,
                                         drop_rate=dr_, rng=r_)
                        return y_, bctx.updates
                    r_i = rngs[i] if rngs[i] is not None else jax.random.PRNGKey(0)
                    _, policy = F.checkpoint_policy(self.remat)
                    x, upd = jax.checkpoint(block_fn, policy=policy)(params, x, r_i)
                    if ctx is not None:
                        ctx.updates.update(upd)
                else:
                    x = self._block(params, f"_blocks.{i}", bp, x, ctx,
                                    drop_rate=drop_rate, rng=rngs[i])
            if bp.is_feat:
                fc = self.feat_fc[len(feats)] if self.out_feat_scale is not None else None
                if fc is None:
                    feats.append(x)
                else:
                    f = F.conv2d(x, params[f"_feat_fc_{len(feats)}.0.weight"])
                    f = self._bn(params, f"_feat_fc_{len(feats)}.1", f, ctx)
                    feats.append(f)

        x = F.conv2d(x, params["_conv_head.weight"])
        x = F.swish(self._bn(params, "_bn1", x, ctx))
        if self.pool:
            x = jnp.mean(x, axis=(1, 2))
        if train and self.dropout_rate and rng is not None:
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(jax.random.fold_in(rng, n), keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0)
        if self.head is not None:
            x = F.linear(x, params["_fc.weight"], params["_fc.bias"])
        feats.append(x)
        if self.return_features:
            return feats
        return feats[-1]


def efficientnet(model_name, pretrained=False, weights_path=None, **kwargs):
    """Factory mirroring the reference entry point (efficientnet.py:493-502).

    `pretrained=True` (or a path) resolves ImageNet weights and stages them
    for init(); raises when no checkpoint can be obtained — never a silent
    random init (see backbones/pretrained.py)."""
    model = EfficientNet(model_name, **kwargs)
    if pretrained or weights_path:
        from hyperseg_tpu.models.backbones.pretrained import (
            stage_pretrained_backbone)
        stage_pretrained_backbone(model, model_name, weights_path or pretrained)
    return model


def load_pretrained_backbone(params, weights_path, prefix="backbone."):
    """Load ImageNet-pretrained EfficientNet weights from a local .pth into a
    HyperGen parameter dict — the load_fc=False partial-match semantics of the
    reference (efficientnet_utils.py:643-674): only keys that exist with
    matching shapes are taken (classifier head and reshaped feature
    compressors are skipped). This environment has no network egress, so the
    torch checkpoint must already be on disk (lukemelas release files work).
    Returns (params, n_loaded)."""
    from hyperseg_tpu.core.torch_import import load_torch_checkpoint

    loaded, _ = load_torch_checkpoint(weights_path)
    out = dict(params)
    n = 0
    for k, v in loaded.items():
        key = prefix + k
        if key in out and out[key].shape == v.shape:
            out[key] = v
            n += 1
    return out, n


if __name__ == "__main__":
    # smoke main (reference efficientnet.py __main__): build b0/b1, check the
    # multi-scale feature pyramid shapes and channel plan
    import numpy as np

    for name in ("efficientnet-b0", "efficientnet-b1"):
        m = EfficientNet(name)
        p = m.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.rand(1, 128, 192, 3), jnp.float32)
        feats = m(p, x)
        shapes = [tuple(f.shape) for f in feats]
        assert [s[-1] for s in shapes] == m.feat_channels, (shapes,
                                                           m.feat_channels)
        print(f"{name}: {len(feats)} features "
              f"{[s[1:] for s in shapes]}")
