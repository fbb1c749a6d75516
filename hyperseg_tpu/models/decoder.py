"""Dynamic multi-scale decoder: static plans + pure apply functions.

Re-implements the reference decoder semantics (hyperseg_v1_0.py:94-253 and the
hyper-block family at :281-498) in patch-blocked NHWC form. A decoder is built
once in Python as a *plan* — a list of levels, each a list of hyper units with
resolved channel counts, hyper-parameter ranges, and signal-routing indices —
and applied as a pure jit-traceable function of (params, features, signal).

Checkpoint-parity quirks reproduced deliberately (SURVEY.md §7.0):
  #1 signal_index resets per level in v1_0/v0_2 — init_signal2weights passes
     the index by value into each level's recursion (hyperseg_v1_0.py:269-278),
     so every level's signal2weights reads a prefix slice s[:, 0:ch].
  #2 MetaSequential slices the *signal* by hyper-param ranges and PyTorch
     clamps out-of-range slices (meta_sequential.py:35) — reproduced by
     Python-level min() on the static channel count.
  #4 signal2weights output channels round up to the weight-group count and the
     result is sliced back down (hyperseg_v1_0.py:318-324,451).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from hyperseg_tpu.nn import functional as F
from hyperseg_tpu.ops import patch as P
from hyperseg_tpu.models.signal_split import (
    divide_feature, divide_feature_legacy_v02, next_multiply)

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# ---------------------------------------------------------------------------
# Unit plans
# ---------------------------------------------------------------------------


@dataclass
class S2W:
    """signal2weights routing for one hyper unit (grouped 1x1 conv on a slice
    of the signal, output clipped back to hyper_params)."""
    prefix: str            # parameter prefix of the conv ('...signal2weights')
    signal_ch: int
    signal_index: int
    groups: int
    out_ch: int            # next_multiply(hyper_params, groups)
    hyper_params: int


@dataclass
class PatchConvUnit:
    """A single patch-wise dynamic conv (+ optional full-map BN + activation).

    Covers HyperPatchNoPadding (pad=0, hyperseg_v1_0.py:455-498),
    HyperPatchConv2d (halo pad, :560-725), and v0_1's MetaPatchConv2d blocks
    (meta_patch.py:60-225). BN here runs on the reassembled full map, matching
    make_hyper_patch_conv2d_block's MetaSequential([conv, BN, act]) ordering.
    """
    prefix: str
    in_ch: int
    out_ch: int
    kernel: int = 1
    groups: int = 1
    pad: int = 0
    padding_mode: str = "reflect"
    stride: int = 1
    bn_prefix: Optional[str] = None
    act: Optional[str] = None
    s2w: Optional[S2W] = None

    @property
    def hyper_params(self) -> int:
        return self.out_ch * (self.in_ch // self.groups) * self.kernel * self.kernel

    def apply(self, params, x, w, ctx=None):
        b, h, wd, c = x.shape
        fh, fw = w.shape[1], w.shape[2]
        fullmap_ok = ((ctx is not None and ctx.train)
                      or b >= P.FULLMAP_MIN_BATCH)
        if (fullmap_ok and self.kernel > 1
                and self.groups == self.in_ch == self.out_ch
                and self.stride == 1 and self.pad == self.kernel // 2
                and h % fh == 0 and wd % fw == 0):
            # bit-identical to the patch path (see fullmap_depthwise); avoids
            # the 6D halo materialization that doubles per-image cost at
            # batch >= 2.
            out = P.fullmap_depthwise(x, w, fh, fw, self.kernel,
                                      mode=self.padding_mode)
        elif (fullmap_ok and P.FULLMAP_POINTWISE and self.kernel == 1
                and self.pad == 0
                and self.stride == 1 and h % fh == 0 and wd % fw == 0):
            # same contraction without the two (ph <-> fw) HBM transposes
            out = P.fullmap_pointwise(x, w, fh, fw, self.out_ch, self.groups)
        else:
            if self.pad > 0:
                xp = P.extract_patches_with_halo(
                    x, fh, fw, (self.pad, self.pad), mode=self.padding_mode)
            else:
                xp = P.block_patches(x, fh, fw)
            out = P.patch_conv_valid(
                xp, w, self.out_ch, (self.kernel, self.kernel),
                groups=self.groups, stride=(self.stride, self.stride))
            out = P.unblock_patches(out)
        if self.bn_prefix is not None:
            out = F.apply_bn(params, self.bn_prefix, out, ctx, eps=BN_EPS,
                             momentum=BN_MOMENTUM)
        if self.act:
            out = F.ACTIVATIONS[self.act](out)
        return out


@dataclass
class InvResUnit:
    """v1_0-style fused inverted residual with all three convs dynamic and BN
    in patch space (hyperseg_v1_0.py:281-376): 1x1 expand -> k x k depthwise ->
    1x1 project, weights sliced from one per-patch vector; BN over the
    (b, fh, fw, ·, ·) patch batch; residual when stride==1 and in==out."""
    prefix: str
    in_ch: int
    out_ch: int
    hidden: int
    kernel: int = 3
    stride: int = 1
    act: str = "relu6"
    padding_mode: str = "reflect"
    s2w: Optional[S2W] = None

    @property
    def ranges(self):
        r1 = self.in_ch * self.hidden
        r2 = r1 + self.hidden * self.kernel * self.kernel
        r3 = r2 + self.hidden * self.out_ch
        return (0, r1, r2, r3)

    @property
    def hyper_params(self) -> int:
        return self.ranges[-1]

    def apply(self, params, x, w, ctx=None):
        from hyperseg_tpu.ops import pallas as pallas_cfg
        from hyperseg_tpu.ops.pallas.patch_invres import (
            patch_inverted_residual_fused, supported)
        if (pallas_cfg.invres_kernel_wanted(x.shape, w.shape)
                and pallas_cfg.kernels_available()
                and (ctx is None or not ctx.train)
                and supported(x.shape, w.shape, self.kernel)):
            pfx = self.prefix
            bn = lambda n: tuple(params[f"{pfx}.{n}.{f}"] for f in
                                 ("weight", "bias", "running_mean", "running_var"))
            return patch_inverted_residual_fused(
                x, w, hidden=self.hidden, out_ch=self.out_ch, kernel=self.kernel,
                bn1=bn("bn1"), bn2=bn("bn2"), bn3=bn("bn3"), eps=BN_EPS,
                padding_mode=self.padding_mode)
        b, hgt, wid, _ = x.shape
        fh, fw = w.shape[1], w.shape[2]
        if (P.FULLMAP_INVRES and self.stride == 1 and self.kernel % 2 == 1
                and hgt % fh == 0 and wid % fw == 0
                and ((ctx is not None and ctx.train)
                     or b >= P.FULLMAP_INVRES_EVAL_MIN_BATCH)):
            return self._apply_fullmap(params, x, w, ctx)
        act = F.ACTIVATIONS[self.act]
        r = self.ranges
        pad = self.kernel // 2
        xp = P.extract_patches_with_halo(x, fh, fw, (pad, pad), mode=self.padding_mode)

        def bn(name, t):
            return F.apply_bn(params, f"{self.prefix}.{name}", t, ctx,
                              eps=BN_EPS, momentum=BN_MOMENTUM)

        h = P.patch_pointwise(xp, w[..., r[0]:r[1]], self.hidden)
        h = act(bn("bn1", h))
        h = P.patch_depthwise_valid(h, w[..., r[1]:r[2]], (self.kernel, self.kernel))
        h = act(bn("bn2", h))
        h = P.patch_pointwise(h, w[..., r[2]:r[3]], self.out_ch)
        h = bn("bn3", h)
        out = P.unblock_patches(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            out = out + x
        return out

    def _apply_fullmap(self, params, x, w, ctx):
        """Full-map formulation of the same unit: the 1x1 expand runs once on
        the un-halo'd map (fullmap_pointwise); the halo ring — exactly the
        pixels where a full-map 1x1 would use the wrong patch's weights — is
        produced by thin per-patch band einsums with center-patch weights;
        bn1 normalizes the map+bands multiset (the same element multiset as
        the reference's halo'd tensor, hyperseg_v1_0.py:336-352); depthwise
        and project run on the interleaved blocked layout. The 6D gather
        tensor never exists (~5x HBM tiling pad at batch >= 2), and unlike
        the eval-only Pallas kernel this path is differentiable, so it also
        serves the training step."""
        act = F.ACTIVATIONS[self.act]
        r = self.ranges
        b, hgt, wid, _ = x.shape
        fh, fw = w.shape[1], w.shape[2]
        ph, pw = hgt // fh, wid // fw
        pad = self.kernel // 2

        def bn(name, t):
            return F.apply_bn(params, f"{self.prefix}.{name}", t, ctx,
                              eps=BN_EPS, momentum=BN_MOMENTUM)

        w1 = w[..., r[0]:r[1]]
        a = P.fullmap_pointwise(x, w1, fh, fw, self.hidden)
        bands = P.halo_bands_pointwise(x, w1, fh, fw, pad, self.hidden,
                                       mode=self.padding_mode)
        a, top, bot, lft, rgt = F.apply_bn_multi(
            params, f"{self.prefix}.bn1", (a,) + bands, ctx,
            eps=BN_EPS, momentum=BN_MOMENTUM)
        ablk = act(a).reshape(b, fh, ph, fw, pw, self.hidden)
        xb = P.assemble_halo_blocked(ablk, act(top), act(bot), act(lft),
                                     act(rgt))
        d = P.blocked_depthwise_valid(xb, w[..., r[1]:r[2]],
                                      (self.kernel, self.kernel))
        d = act(bn("bn2", d.reshape(b, hgt, wid, self.hidden)))
        o = P.fullmap_pointwise(d, w[..., r[2]:r[3]], fh, fw, self.out_ch)
        o = bn("bn3", o)
        if self.stride == 1 and self.in_ch == self.out_ch:
            o = o + x
        return o


@dataclass
class V01InvResUnit:
    """v0_1-style inverted residual (hyperseg_v0_1.py:205-237): a MetaSequential
    of independent MetaPatch blocks — each conv folds back to the full map and
    BN runs on the full map (unlike v1_0's patch-space BN)."""
    prefix: str
    in_ch: int
    out_ch: int
    hidden: int
    kernel: int = 3
    stride: int = 1
    expand: float = 1
    padding_mode: str = "reflect"
    subunits: List[PatchConvUnit] = field(default_factory=list)
    s2w: Optional[S2W] = None

    def __post_init__(self):
        if self.subunits:
            return
        layers = []
        j = 0
        if self.expand != 1:
            layers.append(PatchConvUnit(
                prefix=f"{self.prefix}.conv.{j}.0", in_ch=self.in_ch,
                out_ch=self.hidden, kernel=1, pad=0,
                bn_prefix=f"{self.prefix}.conv.{j}.1", act="relu6"))
            j += 1
        layers.append(PatchConvUnit(
            prefix=f"{self.prefix}.conv.{j}.0", in_ch=self.hidden,
            out_ch=self.hidden, kernel=self.kernel, groups=self.hidden,
            pad=self.kernel // 2, padding_mode=self.padding_mode,
            stride=self.stride, bn_prefix=f"{self.prefix}.conv.{j}.1", act="relu6"))
        j += 1
        layers.append(PatchConvUnit(
            prefix=f"{self.prefix}.conv.{j}.0", in_ch=self.hidden,
            out_ch=self.out_ch, kernel=1, pad=0, stride=self.stride,
            bn_prefix=f"{self.prefix}.conv.{j}.1", act=None))
        self.subunits = layers

    @property
    def hyper_params(self) -> int:
        return sum(u.hyper_params for u in self.subunits)

    def apply(self, params, x, w, ctx=None):
        if self._kernel_ok(x, w, ctx):
            from hyperseg_tpu.ops.pallas.patch_invres import (
                patch_inverted_residual_v01)
            bn = lambda u: tuple(
                params[f"{u.bn_prefix}.{f}"]
                for f in ("weight", "bias", "running_mean", "running_var"))
            e, d, p = self.subunits
            return patch_inverted_residual_v01(
                x, w, hidden=self.hidden, out_ch=self.out_ch,
                kernel=self.kernel, bn1=bn(e), bn2=bn(d), bn3=bn(p),
                eps=BN_EPS, padding_mode=self.padding_mode)
        out = x
        ofs = 0
        for u in self.subunits:
            out = u.apply(params, out, w[..., ofs:ofs + u.hyper_params], ctx)
            ofs += u.hyper_params
        if self.stride == 1 and self.in_ch == self.out_ch:
            out = out + x
        return out

    def _kernel_ok(self, x, w, ctx):
        """Eval-mode dispatch gate for the V01-exact fused kernel: same batch
        policy as InvResUnit, the 3-subunit relu6/relu6/none shape (expand
        present, stride 1, k=3, reflect), and v01_supported's VMEM/alignment
        gate. Train keeps the differentiable fullmap forms."""
        from hyperseg_tpu.ops import pallas as pallas_cfg
        from hyperseg_tpu.ops.pallas import patch_invres as PI
        from hyperseg_tpu.ops.pallas.patch_invres import v01_supported
        import numpy as np
        if not PI.V01_KERNEL:
            return False
        if ctx is not None and ctx.train:
            return False
        if not (self.expand != 1 and self.stride == 1 and self.kernel == 3
                and self.padding_mode == "reflect"
                and len(self.subunits) == 3
                and all(u.bn_prefix for u in self.subunits)):
            return False
        # The kernel hardcodes the default 3-subunit shape (1x1 expand+relu6,
        # kxk depthwise+relu6, 1x1 project, all stride 1). A caller-supplied
        # subunits list (__post_init__ returns early on one) could differ in
        # ways the checks above don't see — gate on the fields themselves.
        e, d, p = self.subunits
        if not (
            (e.act, d.act, p.act) == ("relu6", "relu6", None)
            and (e.kernel, d.kernel, p.kernel) == (1, self.kernel, 1)
            and (e.stride, d.stride, p.stride) == (1, 1, 1)
            and (e.pad, d.pad, p.pad) == (0, self.kernel // 2, 0)
            and (e.groups, p.groups) == (1, 1)
            and d.groups == d.in_ch == d.out_ch == self.hidden
            and (e.in_ch, e.out_ch) == (self.in_ch, self.hidden)
            and (p.in_ch, p.out_ch) == (self.hidden, self.out_ch)
            and d.padding_mode == self.padding_mode
        ):
            return False
        if not (pallas_cfg.invres_kernel_wanted(x.shape, w.shape)
                and pallas_cfg.kernels_available()):
            return False
        return v01_supported(x.shape, w.shape, self.kernel,
                             hidden=self.hidden,
                             itemsize=np.dtype(x.dtype).itemsize)


Unit = Union[PatchConvUnit, InvResUnit, V01InvResUnit]


def apply_unit(params, u, x, w, ctx, *, remat=False):
    """Apply a hyper unit, optionally under jax.checkpoint during training
    (the halo-expanded hidden tensors dominate training memory). `remat` is a
    spec for F.checkpoint_policy (False | True/'full' | 'dots'). Remat-safe:
    the unit runs in its own Ctx so BN-state updates flow out as function
    outputs rather than side effects."""
    enabled, policy = F.checkpoint_policy(remat)
    if not (enabled and ctx is not None and ctx.train):
        return u.apply(params, x, w, ctx)

    def fn(p_, x_, w_):
        uctx = F.Ctx(train=True, rng=None)
        y_ = u.apply(p_, x_, w_, uctx)
        return y_, uctx.updates

    y, upd = jax.checkpoint(fn, policy=policy)(params, x, w)
    ctx.updates.update(upd)
    return y


def s2w_dense_matrix(params, route: S2W):
    """The signal2weights kernel as ONE dense (signal_ch, out_ch) matrix:
    the conv kernel itself for groups == 1, its block-diagonal expansion for
    groups > 1 (off-block entries are exact zeros, so the dense matmul is
    numerically identical to the grouped conv)."""
    k = params[f"{route.prefix}.weight"]
    g = route.groups
    if g == 1:
        return k[0, 0]
    opg = route.out_ch // g
    blocks = [k[0, 0, :, gi * opg:(gi + 1) * opg] for gi in range(g)]
    return jax.scipy.linalg.block_diag(
        *[b.astype(jnp.float32) for b in blocks])


def apply_signal2weights(params, s, route: S2W):
    """Generate a unit's weight map from the signal: grouped 1x1 conv on the
    routed channel slice, clipped to hyper_params (hyperseg_v1_0.py:321-326).

    TPU note: grouped 1x1 convs with narrow per-group widths lower poorly
    (measured ~8x slower than one dense matmul on v5e), so for groups > 1 the
    kernel is expanded to its dense block-diagonal form and applied as a plain
    matmul — numerically identical (off-block entries are exact zeros)."""
    sl = s[..., route.signal_index:route.signal_index + route.signal_ch]
    k = params[f"{route.prefix}.weight"]
    if route.groups == 1:
        w = F.conv2d(sl, k)
    else:
        dense = s2w_dense_matrix(params, route)
        b_, h_, w_, c_ = sl.shape
        w = (sl.reshape(-1, c_) @ dense.astype(sl.dtype)).reshape(
            b_, h_, w_, route.out_ch)
    return w[..., :route.hyper_params]


def _s2w_fused_ok(u, x, s, ctx):
    """Dispatch gate for the fully fused signal2weights + inverted-residual
    kernel: eval mode, TPU backend, the plain kernel's batch gate and shape
    gate, and the dense matrices small enough to sit resident in VMEM."""
    from hyperseg_tpu.ops import pallas as pallas_cfg
    from hyperseg_tpu.ops.pallas import patch_invres as PI
    if not (PI.S2W_FUSED and isinstance(u, InvResUnit) and u.stride == 1
            and u.s2w is not None):
        return False
    if ctx is not None and ctx.train:
        return False
    if not pallas_cfg.kernels_available():
        return False
    if not pallas_cfg.invres_kernel_wanted(x.shape, s.shape):
        return False
    # big maps belong to the LANE-PACKED kernel (weights materialized by the
    # XLA s2w matmul — a <5 MB/img round trip), measured in-graph
    # (tools/bench_pack.py, v5e, 2026-08-19): L-camvid 144.6 -> 182.8 img/s
    # b8 / 142.5 -> 186.7 b1, S-city b1 161.4 -> 203.5. On SMALL maps the
    # s2w fusion stays ahead (M b8 396.3 s2w vs 356.9 packed — its levels
    # are <= 131k px). Same threshold as the b1 carve-out.
    g = PI.LANE_PACK if isinstance(PI.LANE_PACK, int) else 2
    if g > 1 and x.shape[1] * x.shape[2] >= pallas_cfg.INVRES_PACK_MIN_PIXELS:
        return False
    rt = u.s2w
    s_shape = (s.shape[0], s.shape[1], s.shape[2], rt.signal_ch)
    import numpy as np
    return PI.s2w_supported(x.shape, s_shape, u.hyper_params, u.hidden,
                            u.out_ch, u.kernel,
                            itemsize=np.dtype(x.dtype).itemsize)


def apply_unit_from_signal(params, u, x, s_cont, ctx, *, remat=False):
    """Generate-and-apply for one hyper unit given its level-container signal
    slice. When eligible (eval, TPU, batch >= INVRES_MIN_BATCH), dispatches
    the fully fused kernel that generates w1/w2/w3 in VMEM from the routed
    signal — the (B, fh, fw, P) generated-weight tensor never reaches HBM
    (hyperseg_v1_0.py:321-326 generation feeding :328-370 consumption).
    Otherwise generates the weight map and applies the unit as before."""
    if u.s2w is None:
        return apply_unit(params, u, x, s_cont, ctx, remat=remat)
    if _s2w_fused_ok(u, x, s_cont, ctx):
        from hyperseg_tpu.ops.pallas.patch_invres import (
            patch_inverted_residual_s2w_fused)
        rt = u.s2w
        sl = s_cont[..., rt.signal_index:rt.signal_index + rt.signal_ch]
        dense = s2w_dense_matrix(params, rt)
        pfx = u.prefix
        bn = lambda n: tuple(params[f"{pfx}.{n}.{f}"] for f in
                             ("weight", "bias", "running_mean", "running_var"))
        return patch_inverted_residual_s2w_fused(
            x, sl, dense, hidden=u.hidden, out_ch=u.out_ch, kernel=u.kernel,
            bn1=bn("bn1"), bn2=bn("bn2"), bn3=bn("bn3"), eps=BN_EPS,
            padding_mode=u.padding_mode)
    w = apply_signal2weights(params, s_cont, u.s2w)
    return apply_unit(params, u, x, w, ctx, remat=remat)


def init_unit_params(params, rng, units: Sequence[Unit]):
    """Initialize BN + signal2weights parameters for a list of units (torch
    default inits: BN affine = (1, 0); conv = kaiming-uniform bounds)."""
    i = 0

    def nk():
        nonlocal i
        i += 1
        return jax.random.fold_in(rng, i)

    def bn(name, c):
        params[f"{name}.weight"] = jnp.ones((c,), jnp.float32)
        params[f"{name}.bias"] = jnp.zeros((c,), jnp.float32)
        params[f"{name}.running_mean"] = jnp.zeros((c,), jnp.float32)
        params[f"{name}.running_var"] = jnp.ones((c,), jnp.float32)

    def s2w_conv(route: S2W):
        fan_in = route.signal_ch // route.groups
        bound = 1.0 / math.sqrt(fan_in)
        params[f"{route.prefix}.weight"] = jax.random.uniform(
            nk(), (1, 1, fan_in, route.out_ch), jnp.float32, -bound, bound)

    for u in units:
        if isinstance(u, PatchConvUnit):
            if u.bn_prefix:
                bn(u.bn_prefix, u.out_ch)
        elif isinstance(u, InvResUnit):
            bn(f"{u.prefix}.bn1", u.hidden)
            bn(f"{u.prefix}.bn2", u.hidden)
            bn(f"{u.prefix}.bn3", u.out_ch)
        elif isinstance(u, V01InvResUnit):
            init_unit_params(params, nk(), u.subunits)
        if u.s2w is not None:
            s2w_conv(u.s2w)


# ---------------------------------------------------------------------------
# v1_0 / v0_2 decoder
# ---------------------------------------------------------------------------


class MultiScaleDecoderV1:
    """Reference MultiScaleDecoder (hyperseg_v1_0.py:94-253).

    feat_channels: [in_nc] + backbone feature channels (finest->coarsest,
    excluding head). Levels run coarsest->finest; level ℓ consumes the
    upsampled previous output concat the level's feature concat a 2-channel
    coordinate grid, through one or more hyper units.

    `coords_res` is accepted for arch-string parity but is intentionally a
    no-op: the reference pre-registers coordinate-grid buffers for these
    resolutions purely as a runtime cache (hyperseg_v1_0.py:189-213); here
    coordinates are trace-time constants baked into the jitted program, so
    every resolution is "cached" by construction.
    """

    def __init__(self, feat_channels, signal_channels, num_classes=3,
                 kernel_sizes=3, level_layers=1, level_channels=None,
                 expand_ratio=1, groups=1, weight_groups=1, with_out_fc=False,
                 out_kernel_size=1, dropout=None, coords_res=None,
                 legacy_divide=False, remat=False, prefix="decoder"):
        levels = len(level_channels)
        ks = ([kernel_sizes] * levels if isinstance(kernel_sizes, int) else list(kernel_sizes))
        ll = ([level_layers] * levels if isinstance(level_layers, int) else list(level_layers))
        er = ([expand_ratio] * levels if isinstance(expand_ratio, (int, float))
              else list(expand_ratio))
        assert len(ks) == levels and len(ll) == levels and len(er) == levels
        self.levels = levels
        self.remat = remat  # jax.checkpoint hyper units during training
        self.prefix = prefix
        self.num_classes = num_classes
        self.dropout = dropout
        rev_feats = list(feat_channels[::-1])

        self.level_units: List[List[Unit]] = []
        prev = 0
        for lv in range(levels):
            prev += rev_feats[lv]
            out_ngf = level_channels[lv]
            units: List[Unit] = []
            for layer in range(ll[lv]):
                if (not with_out_fc) and lv == levels - 1 and layer == ll[lv] - 1:
                    out_ngf = num_classes
                in_ch = prev + 2
                if ks[lv] > 1:
                    units.append(InvResUnit(
                        prefix=f"{prefix}.level_{lv}.{layer}",
                        in_ch=in_ch, out_ch=out_ngf,
                        hidden=int(round(in_ch * er[lv])), kernel=ks[lv]))
                else:
                    g = groups[lv] if isinstance(groups, (list, tuple)) else groups
                    units.append(PatchConvUnit(
                        prefix=f"{prefix}.level_{lv}.{layer}.0",
                        in_ch=in_ch, out_ch=out_ngf, kernel=ks[lv], groups=g,
                        pad=ks[lv] // 2,
                        bn_prefix=f"{prefix}.level_{lv}.{layer}.1", act="relu"))
                prev = out_ngf
            self.level_units.append(units)

        self.out_fc_units: List[Unit] = []
        if with_out_fc:
            self.out_fc_units.append(PatchConvUnit(
                prefix=f"{prefix}.out_fc.{1 if dropout is not None else 0}",
                in_ch=prev, out_ch=num_classes, kernel=out_kernel_size,
                pad=out_kernel_size // 2))

        # hyper-param bookkeeping + signal routing (quirks #1, #2, #4)
        all_units = [u for lvl in self.level_units for u in lvl] + self.out_fc_units
        hyper = [u.hyper_params for u in all_units]
        self.param_groups = [sum(u.hyper_params for u in lvl) for lvl in self.level_units]
        if with_out_fc:
            self.param_groups.append(sum(u.hyper_params for u in self.out_fc_units))
        self.hyper_params = sum(hyper)
        self.signal_channels = signal_channels

        min_unit = (max(weight_groups) if isinstance(weight_groups, (list, tuple))
                    else weight_groups)
        split_fn = divide_feature_legacy_v02 if legacy_divide else divide_feature
        sig_feats = list(split_fn(signal_channels, hyper, min_unit=min_unit))
        wg = list(weight_groups) if isinstance(weight_groups, (list, tuple)) else None
        # Quirk #1: the reference recursion restarts signal_index at 0 for each
        # level container, so consecutive units *within* one level accumulate
        # but levels all start at 0.
        k = 0
        for lvl_units in (self.level_units + ([self.out_fc_units] if with_out_fc else [])):
            sig_index = 0
            for u in lvl_units:
                ch = sig_feats[k]
                g = wg[k] if wg is not None else weight_groups
                u.s2w = S2W(prefix=f"{u.prefix}.signal2weights",
                            signal_ch=int(ch), signal_index=sig_index, groups=g,
                            out_ch=next_multiply(u.hyper_params, g),
                            hyper_params=u.hyper_params)
                sig_index += int(ch)
                k += 1

    def init(self, rng, params=None):
        params = {} if params is None else params
        all_units = [u for lvl in self.level_units for u in lvl] + self.out_fc_units
        init_unit_params(params, rng, all_units)
        return params

    def __call__(self, params, xs, s, ctx=None):
        """xs: [input_image, feat_s2, ..., feat_s16] (finest->coarsest, head
        excluded); s: signal (B, fh, fw, C) at stride 32."""
        p = None
        for lv, units in enumerate(self.level_units):
          with jax.named_scope(f"level_{lv}"):
            feat = xs[-lv - 1]
            if p is None:
                p = feat
            else:
                if p.shape[1:3] != feat.shape[1:3]:
                    p = F.resize_bilinear(p, feat.shape[1:3])
                p = jnp.concatenate([feat, p], axis=-1)
            coords = F.image_coordinates(p.shape[0], p.shape[1], p.shape[2], p.dtype)
            p = jnp.concatenate([coords, p], axis=-1)

            # Quirk #2: the level container slices the signal by hyper ranges,
            # clamped to the actual channel count.
            base = 0
            for u in units:
                hi = min(base + u.hyper_params, s.shape[-1])
                lo = min(base, hi)
                s_cont = s[..., lo:hi] if (lo, hi) != (0, s.shape[-1]) else s
                p = apply_unit_from_signal(params, u, p, s_cont, ctx,
                                           remat=self.remat)
                base += u.hyper_params

        with jax.named_scope("out_fc"):
            for u in self.out_fc_units:
                # reference out_fc = MetaSequential(Dropout2d(dropout), conv)
                # (hyperseg_v1_0.py:166-171) — train-mode only
                if self.dropout and ctx is not None and ctx.train:
                    p = F.dropout2d(p, self.dropout, ctx.next_rng(9100))
                w = apply_signal2weights(params, s, u.s2w)
                p = u.apply(params, p, w, ctx)

        with jax.named_scope("final_resize"):
            if p.shape[1:3] != xs[0].shape[1:3]:
                p = F.resize_bilinear(p, xs[0].shape[1:3])
        return p


# ---------------------------------------------------------------------------
# v0_1 decoder
# ---------------------------------------------------------------------------


class MultiScaleDecoderV0:
    """Oldest decoder generation (hyperseg_v0_1.py:91-202): consumes a *list*
    of per-level weight tensors emitted by the v0_1 WeightMapper; blocks are
    MetaPatch compositions (each conv folds back to the full map, BN on the
    full map); level output channels equal the level's feature channels (no
    level_channels arg); no final upsample (the last level already runs at
    input resolution)."""

    def __init__(self, feat_channels, num_classes=3, kernel_sizes=3,
                 level_layers=1, expand_ratio=1, with_out_fc=False,
                 out_kernel_size=1, dropout=None, remat=False, prefix="decoder"):
        levels = len(feat_channels)
        ks = ([kernel_sizes] * levels if isinstance(kernel_sizes, int) else list(kernel_sizes))
        ll = ([level_layers] * levels if isinstance(level_layers, int) else list(level_layers))
        assert len(ks) == levels and len(ll) == levels
        self.levels = levels
        self.remat = remat
        self.prefix = prefix
        self.num_classes = num_classes
        self.dropout = dropout
        rev_feats = list(feat_channels[::-1])

        self.level_units: List[List[Unit]] = []
        prev = 0
        for lv in range(levels):
            ngf = rev_feats[lv]
            prev += ngf
            units: List[Unit] = []
            for layer in range(ll[lv]):
                if (not with_out_fc) and lv == levels - 1 and layer == ll[lv] - 1:
                    ngf = num_classes
                in_ch = prev + 2
                if ks[lv] > 1:
                    units.append(V01InvResUnit(
                        prefix=f"{prefix}.level_{lv}.{layer}",
                        in_ch=in_ch, out_ch=ngf,
                        hidden=int(round(in_ch * expand_ratio)),
                        kernel=ks[lv], expand=expand_ratio))
                else:
                    units.append(PatchConvUnit(
                        prefix=f"{prefix}.level_{lv}.{layer}.0",
                        in_ch=in_ch, out_ch=ngf, kernel=ks[lv],
                        pad=ks[lv] // 2,
                        bn_prefix=f"{prefix}.level_{lv}.{layer}.1", act="relu"))
                prev = ngf
            self.level_units.append(units)

        self.out_fc_units: List[Unit] = []
        if with_out_fc:
            self.out_fc_units.append(PatchConvUnit(
                prefix=f"{prefix}.out_fc.{1 if dropout is not None else 0}",
                in_ch=prev, out_ch=num_classes, kernel=out_kernel_size,
                pad=out_kernel_size // 2))

        self.param_groups = [sum(u.hyper_params for u in lvl)
                             for lvl in self.level_units]
        if with_out_fc:
            self.param_groups.append(sum(u.hyper_params for u in self.out_fc_units))
        self.hyper_params = sum(self.param_groups)

    def init(self, rng, params=None):
        params = {} if params is None else params
        all_units = [u for lvl in self.level_units for u in lvl] + self.out_fc_units
        init_unit_params(params, rng, all_units)
        return params

    def __call__(self, params, xs, weights, ctx=None):
        """weights: list of per-level weight maps (B, fh, fw, P_level)."""
        assert isinstance(weights, (list, tuple))
        p = None
        for lv, units in enumerate(self.level_units):
            feat = xs[-lv - 1]
            if p is None:
                p = feat
            else:
                if p.shape[1:3] != feat.shape[1:3]:
                    p = F.resize_bilinear(p, feat.shape[1:3])
                p = jnp.concatenate([feat, p], axis=-1)
            coords = F.image_coordinates(p.shape[0], p.shape[1], p.shape[2], p.dtype)
            p = jnp.concatenate([coords, p], axis=-1)

            w = weights[lv]
            base = 0
            for u in units:
                p = apply_unit(params, u, p, w[..., base:base + u.hyper_params],
                               ctx, remat=self.remat)
                base += u.hyper_params

        for u in self.out_fc_units:
            # reference out_fc dropout (hyperseg_v0_1.py:152), train-mode only
            if self.dropout and ctx is not None and ctx.train:
                p = F.dropout2d(p, self.dropout, ctx.next_rng(9100))
            base = 0
            p = u.apply(params, p, weights[-1][..., base:base + u.hyper_params],
                        ctx)
        return p


# ---------------------------------------------------------------------------
# v1_0_unify decoder
# ---------------------------------------------------------------------------


class MultiScaleDecoderUnify:
    """Unified-weights decoder (hyperseg_v1_0_unify.py:96-259): weight
    generation is hoisted out of the hyper blocks into a `weight_blocks` list
    of WeightLayers; levels >= unify_level-1 share a single fused WeightLayer
    whose output is range-sliced per level (:242-249). Unlike v1_0, the
    signal-routing indices here are *cumulative* across weight blocks
    (:275-284) — the reference's index-reset quirk does not apply.
    """

    def __init__(self, feat_channels, signal_channels, num_classes=3,
                 kernel_sizes=3, level_layers=1, level_channels=None,
                 expand_ratio=1, groups=1, weight_groups=1, with_out_fc=False,
                 out_kernel_size=1, dropout=None, coords_res=None,
                 unify_level=None, remat=False, prefix="decoder"):
        levels = len(level_channels)
        assert unify_level is not None and 1 <= unify_level <= levels
        ks = ([kernel_sizes] * levels if isinstance(kernel_sizes, int) else list(kernel_sizes))
        ll = ([level_layers] * levels if isinstance(level_layers, int) else list(level_layers))
        er = ([expand_ratio] * levels if isinstance(expand_ratio, (int, float))
              else list(expand_ratio))
        self.levels = levels
        self.unify_level = unify_level
        self.remat = remat
        self.prefix = prefix
        self.num_classes = num_classes
        self.dropout = dropout
        rev_feats = list(feat_channels[::-1])

        self.level_units: List[List[Unit]] = []
        prev = 0
        for lv in range(levels):
            prev += rev_feats[lv]
            out_ngf = level_channels[lv]
            units: List[Unit] = []
            for layer in range(ll[lv]):
                if (not with_out_fc) and lv == levels - 1 and layer == ll[lv] - 1:
                    out_ngf = num_classes
                in_ch = prev + 2
                if ks[lv] > 1:
                    units.append(InvResUnit(
                        prefix=f"{prefix}.level_blocks.{lv}.{layer}",
                        in_ch=in_ch, out_ch=out_ngf,
                        hidden=int(round(in_ch * er[lv])), kernel=ks[lv]))
                else:
                    g = groups[lv] if isinstance(groups, (list, tuple)) else groups
                    units.append(PatchConvUnit(
                        prefix=f"{prefix}.level_blocks.{lv}.{layer}.0",
                        in_ch=in_ch, out_ch=out_ngf, kernel=ks[lv], groups=g,
                        pad=ks[lv] // 2,
                        bn_prefix=f"{prefix}.level_blocks.{lv}.{layer}.1", act="relu"))
                prev = out_ngf
            self.level_units.append(units)

        # no shipped config uses out_fc here; dropout only acts inside the
        # reference's out_fc (hyperseg_v1_0_unify.py:180-186), so without it
        # dropout is a no-op in the reference too
        assert not with_out_fc, "unify decoder with out_fc is not used by any config"
        self.out_fc_units: List[Unit] = []

        level_sums = [sum(u.hyper_params for u in lvl) for lvl in self.level_units]
        # per-level fused slicing ranges for the shared weight block (:175)
        self._ranges = [0]
        for lv in range(unify_level - 1, levels):
            self._ranges.append(self._ranges[-1] + level_sums[lv])
        # one WeightLayer per level below unify, one fused for the rest (:172-178)
        targets = level_sums[:unify_level - 1] + [sum(level_sums[unify_level - 1:])]
        self.param_groups = list(targets)
        self.hyper_params = sum(targets)
        self.signal_channels = signal_channels

        min_unit = (max(weight_groups) if isinstance(weight_groups, (list, tuple))
                    else weight_groups)
        sig_feats = list(divide_feature(signal_channels, targets, min_unit=min_unit))
        wg = list(weight_groups) if isinstance(weight_groups, (list, tuple)) else None
        self.weight_routes: List[S2W] = []
        sig_index = 0
        for i, t in enumerate(targets):
            g = wg[i] if wg is not None else weight_groups
            self.weight_routes.append(S2W(
                prefix=f"{prefix}.weight_blocks.{i}.signal2weights",
                signal_ch=int(sig_feats[i]), signal_index=sig_index, groups=g,
                out_ch=next_multiply(t, g), hyper_params=t))
            sig_index += int(sig_feats[i])

    def init(self, rng, params=None):
        params = {} if params is None else params
        all_units = [u for lvl in self.level_units for u in lvl]
        init_unit_params(params, rng, all_units)
        for i, r in enumerate(self.weight_routes):
            fan_in = r.signal_ch // r.groups
            bound = 1.0 / math.sqrt(fan_in)
            params[f"{r.prefix}.weight"] = jax.random.uniform(
                jax.random.fold_in(rng, 7000 + i), (1, 1, fan_in, r.out_ch),
                jnp.float32, -bound, bound)
        return params

    def __call__(self, params, xs, s, ctx=None):
        p = None
        w_shared = None
        for lv, units in enumerate(self.level_units):
            feat = xs[-lv - 1]
            if p is None:
                p = feat
            else:
                if p.shape[1:3] != feat.shape[1:3]:
                    p = F.resize_bilinear(p, feat.shape[1:3])
                p = jnp.concatenate([feat, p], axis=-1)
            coords = F.image_coordinates(p.shape[0], p.shape[1], p.shape[2], p.dtype)
            p = jnp.concatenate([coords, p], axis=-1)

            if lv < self.unify_level - 1:
                w = apply_signal2weights(params, s, self.weight_routes[lv])
            else:
                if lv == self.unify_level - 1:
                    w_shared = apply_signal2weights(params, s, self.weight_routes[-1])
                i = lv - self.unify_level + 1
                w = w_shared[..., self._ranges[i]:self._ranges[i + 1]]

            base = 0
            for u in units:
                p = apply_unit(params, u, p, w[..., base:base + u.hyper_params],
                               ctx, remat=self.remat)
                base += u.hyper_params

        if p.shape[1:3] != xs[0].shape[1:3]:
            p = F.resize_bilinear(p, xs[0].shape[1:3])
        return p
