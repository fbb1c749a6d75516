"""Functional NN primitives, NHWC layout, TPU-first.

All ops are pure functions designed to trace cleanly under jit with static
shapes. Conventions:
  * activations: NHWC (batch, height, width, channel) — channel rides the TPU
    lane dimension.
  * conv kernels: HWIO, i.e. (kh, kw, in_ch // groups, out_ch). A PyTorch OIHW
    kernel maps here via transpose(2, 3, 1, 0).
  * linear weights: (in_features, out_features).

Behavioral parity targets (reference = YuvalNirkin/hyperseg, PyTorch):
  * `same_padding_2d` reproduces TF-style SAME padding as computed by the
    reference's Conv2dStaticSamePadding (efficientnet_utils.py:247-274),
    including its quirk of deriving pad amounts from the *nominal* model image
    size rather than the runtime size.
  * `resize_bilinear` matches torch.nn.functional.interpolate(mode='bilinear',
    align_corners=False) bit-for-bit in fp32 (half-pixel centers, edge clamp,
    no antialiasing).
  * `upsample_nearest` matches torch F.interpolate(mode='nearest') /
    nn.UpsamplingNearest2d (floor index mapping).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Padding
# ---------------------------------------------------------------------------


def same_padding_2d(in_hw, kernel_hw, stride_hw, dilation_hw=(1, 1)):
    """TF 'SAME' padding amounts ((top, bottom), (left, right)).

    Mirrors the arithmetic in the reference Conv2dStaticSamePadding
    (efficientnet_utils.py:258-269): pad = max((ceil(i/s)-1)*s + (k-1)*d + 1 - i, 0),
    split as (pad // 2, pad - pad // 2).
    """
    pads = []
    for i, k, s, d in zip(in_hw, kernel_hw, stride_hw, dilation_hw):
        o = math.ceil(i / s)
        p = max((o - 1) * s + (k - 1) * d + 1 - i, 0)
        pads.append((p // 2, p - p // 2))
    return tuple(pads)


def pad2d(x, pad_hw, mode="constant", value=0.0):
    """Pad the spatial dims of an NHWC tensor.

    pad_hw: ((top, bottom), (left, right)). mode: 'constant' | 'reflect' |
    'replicate' (torch naming; 'replicate' maps to numpy 'edge').
    """
    (pt, pb), (pl, pr) = pad_hw
    if pt == pb == pl == pr == 0:
        return x
    cfg = ((0, 0), (pt, pb), (pl, pr), (0, 0))
    if mode == "constant":
        return jnp.pad(x, cfg, mode="constant", constant_values=value)
    if mode == "reflect":
        return jnp.pad(x, cfg, mode="reflect")
    if mode == "replicate":
        return jnp.pad(x, cfg, mode="edge")
    if mode == "circular":
        return jnp.pad(x, cfg, mode="wrap")
    raise ValueError(f"unknown pad mode {mode!r}")


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b=None, *, stride=(1, 1), padding=((0, 0), (0, 0)),
           dilation=(1, 1), groups=1, dtype=None):
    """2D convolution, NHWC x HWIO -> NHWC, explicit asymmetric padding.

    Equivalent of torch F.conv2d (which is cross-correlation, as is XLA conv).
    `padding` is ((top, bottom), (left, right)) or an int for symmetric pads.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if dtype is not None:
        x = x.astype(dtype)
    # mixed-precision: parameters follow the activation dtype (a no-op cast
    # for matching dtypes; XLA folds it into the conv)
    w = w.astype(x.dtype)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def linear(x, w, b=None):
    """x @ w + b with w of shape (in, out)."""
    out = x @ w.astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


# Trace-time switch: when True every eval-mode batch_norm is an exact
# identity — the functional analogue of the reference's remove_bn replacing
# BN modules with Unit (test_fps.py:319-332), which benchmarks a genuinely
# cheaper BN-free model. Set only by cli/test_fps.py (restored in finally);
# Pallas kernels that fuse BN inline read raw params instead, so callers
# must pair this with neutralized BN params (cli/test_fps.py remove_bn).
BN_IDENTITY = False


def batch_norm(x, scale, bias, mean, var, *, eps=1e-5):
    """Inference batch norm over the channel (last) axis using running stats.

    Folded into a single multiply-add; stats kept in fp32 for stability.
    """
    if BN_IDENTITY:
        return x
    inv = lax.rsqrt(var.astype(jnp.float32) + eps)
    w = (scale.astype(jnp.float32) * inv) if scale is not None else inv
    b = -mean.astype(jnp.float32) * w
    if bias is not None:
        b = b + bias.astype(jnp.float32)
    return x * w.astype(x.dtype) + b.astype(x.dtype)


def batch_norm_train(x, scale, bias, mean, var, *, eps=1e-5, momentum=0.1,
                     reduce_axes=None):
    """Training-mode batch norm: normalize by batch stats, return new running
    stats. Matches torch BatchNorm2d semantics (biased var for normalization,
    unbiased var for the running update; torch momentum convention:
    new = (1 - momentum) * old + momentum * batch).

    reduce_axes: axes to compute stats over (default: all but last).
    Returns (y, new_mean, new_var, batch_mean, batch_var) — the raw batch
    stats let callers snapshot exactly what normalization used (BN
    calibration, utils/calibrate.py), independent of the layer's momentum.
    """
    if reduce_axes is None:
        reduce_axes = tuple(range(x.ndim - 1))
    x32 = x.astype(jnp.float32)
    batch_mean = jnp.mean(x32, axis=reduce_axes)
    # centered (two-pass) variance: the E[x^2] - E[x]^2 form cancels
    # catastrophically in fp32 for large activations and can go negative,
    # NaN-ing the rsqrt mid-training
    centered = x32 - jnp.expand_dims(batch_mean, reduce_axes)
    batch_var = jnp.maximum(jnp.mean(jnp.square(centered), axis=reduce_axes), 0.0)
    n = np.prod([x.shape[a] for a in reduce_axes])
    unbiased = batch_var * (n / max(n - 1, 1))
    new_mean = (1 - momentum) * mean.astype(jnp.float32) + momentum * batch_mean
    new_var = (1 - momentum) * var.astype(jnp.float32) + momentum * unbiased
    inv = lax.rsqrt(batch_var + eps)
    w = (scale.astype(jnp.float32) * inv) if scale is not None else inv
    b = -batch_mean * w
    if bias is not None:
        b = b + bias.astype(jnp.float32)
    y = x * w.astype(x.dtype) + b.astype(x.dtype)
    return y, new_mean, new_var, batch_mean, batch_var


def dropout2d(x, p, rng):
    """Channel-wise dropout on NHWC maps — torch nn.Dropout2d semantics
    (zero whole channels per sample, scale survivors by 1/(1-p)). Identity
    when p is falsy or no rng is available (eval)."""
    if not p or rng is None:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


class Ctx:
    """Forward-pass context: train/eval switch, RNG, and collected state
    updates (BN running stats). Pure-functional: `updates` is filled with
    traced arrays during apply and returned alongside the outputs; merging
    them into the parameter dict is the caller's (train step's) job.
    """

    def __init__(self, train=False, rng=None):
        self.train = train
        self.rng = rng
        self.updates = {}
        # raw batch stats of each BN this pass (keyed like `updates`):
        # exactly what train-mode normalization used, independent of each
        # layer's momentum — consumed by utils/calibrate.calibrate_bn
        self.batch_stats = {}

    def next_rng(self, tag: int):
        if self.rng is None:
            return None
        return jax.random.fold_in(self.rng, tag)


def apply_bn(params, prefix, x, ctx: Ctx | None = None, *, eps=1e-5,
             momentum=0.1):
    """BatchNorm by parameter prefix. Eval (or no ctx): running-stats affine.
    Train: batch stats over all-but-channel axes (matches torch BatchNorm2d on
    NHWC maps and the reference's patch-batch BN on patch-blocked 6-D tensors),
    recording updated running stats in ctx.updates."""
    scale = params[f"{prefix}.weight"]
    bias = params[f"{prefix}.bias"]
    mean = params[f"{prefix}.running_mean"]
    var = params[f"{prefix}.running_var"]
    if ctx is None or not ctx.train:
        return batch_norm(x, scale, bias, mean, var, eps=eps)
    y, new_mean, new_var, b_mean, b_var = batch_norm_train(
        x, scale, bias, mean, var, eps=eps, momentum=momentum)
    ctx.updates[f"{prefix}.running_mean"] = new_mean
    ctx.updates[f"{prefix}.running_var"] = new_var
    ctx.batch_stats[f"{prefix}.running_mean"] = b_mean
    ctx.batch_stats[f"{prefix}.running_var"] = b_var
    return y


def apply_bn_multi(params, prefix, parts, ctx: Ctx | None = None, *,
                   eps=1e-5, momentum=0.1):
    """BatchNorm whose statistic multiset is the UNION of several channel-last
    tensors (e.g. a full map plus its halo bands, which together are exactly
    the halo'd patch tensor the reference normalizes). Eval: running-stats
    affine on every part. Train: two-pass batch stats over all parts jointly,
    running stats recorded in ctx like apply_bn. Returns the normalized parts
    in order."""
    scale = params[f"{prefix}.weight"]
    bias = params[f"{prefix}.bias"]
    mean = params[f"{prefix}.running_mean"]
    var = params[f"{prefix}.running_var"]
    if ctx is None or not ctx.train:
        return tuple(batch_norm(p, scale, bias, mean, var, eps=eps)
                     for p in parts)
    n = sum(int(np.prod(p.shape[:-1])) for p in parts)
    s = sum(jnp.sum(p.astype(jnp.float32), axis=tuple(range(p.ndim - 1)))
            for p in parts)
    batch_mean = s / n
    sq = sum(jnp.sum(jnp.square(p.astype(jnp.float32) - batch_mean),
                     axis=tuple(range(p.ndim - 1))) for p in parts)
    batch_var = jnp.maximum(sq / n, 0.0)
    unbiased = batch_var * (n / max(n - 1, 1))
    ctx.updates[f"{prefix}.running_mean"] = (
        (1 - momentum) * mean.astype(jnp.float32) + momentum * batch_mean)
    ctx.updates[f"{prefix}.running_var"] = (
        (1 - momentum) * var.astype(jnp.float32) + momentum * unbiased)
    ctx.batch_stats[f"{prefix}.running_mean"] = batch_mean
    ctx.batch_stats[f"{prefix}.running_var"] = batch_var
    inv = lax.rsqrt(batch_var + eps)
    w = scale.astype(jnp.float32) * inv
    b = bias.astype(jnp.float32) - batch_mean * w
    return tuple(p * w.astype(p.dtype) + b.astype(p.dtype) for p in parts)


def checkpoint_policy(spec):
    """Map a remat spec to (enabled, policy) for jax.checkpoint.

    False      -> no remat (all activations resident through the backward).
    True/'full'-> save nothing: every activation recomputed in the backward —
                  minimum HBM, maximum recompute FLOPs.
    'dots'     -> jax.checkpoint_policies.dots_saveable: MXU dot/conv outputs
                  stay resident, only the elementwise/BN/activation chains
                  between them (cheap VPU work) are recomputed — the usual
                  TPU sweet spot when HBM allows it.
    A/B on-chip: tools/bench_train.py sweeps the spec per component."""
    if not spec:
        return False, None
    if spec is True or spec == "full":
        return True, None
    if spec == "dots":
        import jax
        return True, jax.checkpoint_policies.dots_saveable
    raise ValueError(f"unknown remat spec {spec!r}")


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def relu(x):
    return jnp.maximum(x, 0)


def relu6(x):
    return jnp.clip(x, 0, 6)


def swish(x):
    return x * jax.nn.sigmoid(x)


def hard_sigmoid(x):
    return relu6(x + 3.0) / 6.0


ACTIVATIONS = {
    "relu": relu,
    "relu6": relu6,
    "swish": swish,
    "silu": swish,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
    None: lambda x: x,
}


# ---------------------------------------------------------------------------
# Resizing (torch F.interpolate parity)
# ---------------------------------------------------------------------------


def _linear_resize_matrix(in_size: int, out_size: int, dtype=np.float32):
    """Dense (out, in) matrix implementing 1-D bilinear resize with half-pixel
    centers and edge clamping — torch interpolate(align_corners=False)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=dtype)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m.astype(dtype)


def resize_bilinear(x, out_hw):
    """Bilinear resize of NHWC via two dense matmuls (MXU-friendly).

    Matches torch F.interpolate(mode='bilinear', align_corners=False) exactly:
    separable, half-pixel source coordinates, clamped at edges, no antialias.

    Perf note (v5e, measured): a 2-tap stencil fast path for the exact-2x
    case (shift + stack + reshape interleave) was tried and is 2x SLOWER
    (0.82 ms vs 0.40 ms at (256,512,19)->2x) — the lane interleave on a
    19-channel NHWC tensor costs more than the dense matmuls' wasted FLOPs.
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    from hyperseg_tpu.ops import pallas as pallas_cfg
    if pallas_cfg.RESIZE_ENABLED and jax.default_backend() == "tpu":
        from hyperseg_tpu.ops.pallas import resize as resize_k
        if resize_k.supported(x.shape, out_hw):
            return resize_k.resize_bilinear_kernel(x, tuple(out_hw))
    dt = x.dtype
    my = jnp.asarray(_linear_resize_matrix(h, oh), dtype=jnp.float32)
    mx = jnp.asarray(_linear_resize_matrix(w, ow), dtype=jnp.float32)
    x32 = x.astype(jnp.float32)
    # (oh,h) @ (b,h,w*c) -> contract over h
    y = jnp.einsum("oh,bhwc->bowc", my, x32)
    y = jnp.einsum("pw,bowc->bopc", mx, y)
    return y.astype(dt)


def upsample_nearest(x, out_hw):
    """Nearest-neighbor resize matching torch mode='nearest': src = floor(dst * in/out)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    iy = (np.arange(oh) * h // oh).astype(np.int32)
    ix = (np.arange(ow) * w // ow).astype(np.int32)
    return x[:, iy][:, :, ix]


def adaptive_avg_pool_1(x):
    """Global average pool to 1x1 (keepdims)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def avg_pool2d(x, kernel, stride=None):
    """Average pooling, NHWC, VALID padding (torch F.avg_pool2d default)."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    stride = kernel if stride is None else stride
    if isinstance(stride, int):
        stride = (stride, stride)
    out = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1,) + tuple(kernel) + (1,),
        window_strides=(1,) + tuple(stride) + (1,),
        padding="VALID")
    return out / (kernel[0] * kernel[1])


def image_coordinates(b, h, w, dtype=jnp.float32):
    """Normalized (x, y) coordinate grid, 2 channels, NHWC.

    Matches reference get_image_coordinates (hyperseg_v1_0.py:210-219): channel
    0 is x (width axis) in [-1, 1], channel 1 is y; linspace with endpoints.
    """
    xs = np.linspace(-1.0, 1.0, w, dtype=np.float32)
    ys = np.linspace(-1.0, 1.0, h, dtype=np.float32)
    gx = np.broadcast_to(xs[None, :], (h, w))
    gy = np.broadcast_to(ys[:, None], (h, w))
    grid = np.stack([gx, gy], axis=-1)  # (h, w, 2)
    g = jnp.asarray(grid, dtype=dtype)
    return jnp.broadcast_to(g[None], (b, h, w, 2))
