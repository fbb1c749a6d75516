"""Dynamic-weight ("meta") ops: convolutions/linears whose weights arrive as a
forward argument, one weight set per batch element.

Reference semantics: hyperseg/models/layers/meta_conv.py:163-186 (MetaConv2d
folds the batch into conv groups) and meta_linear.py:49-61 (bmm). On TPU we
keep the same single-conv formulation — XLA lowers grouped convs onto the MXU —
but in NHWC/HWIO layout.

Weight flattening convention (must match the torch reference bit-for-bit for
checkpoint parity): a flat per-sample weight vector of length
out_ch * (in_ch // groups) * kh * kw unpacks C-ordered as
(out_ch, in_ch // groups, kh, kw)  [meta_conv.py:180].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from hyperseg_tpu.nn import functional as F


def meta_conv2d(x, w, *, out_channels, kernel_size=(1, 1), stride=(1, 1),
                padding=((0, 0), (0, 0)), dilation=(1, 1), groups=1,
                padding_mode="zeros"):
    """Per-sample dynamic conv. x: (B, H, W, C); w: (B, hyper_params) flat.

    Implemented as a single grouped convolution with feature_group_count = B *
    groups (the reference's cuDNN trick, meta_conv.py:182-183, which is equally
    natural for XLA): batch folds into the channel dimension.
    """
    b, h, ww, c = x.shape
    kh, kw = kernel_size
    in_per_group = c // groups
    # (B, O, I/g, kh, kw) -> kernel HWIO (kh, kw, I/g, B*O)
    wk = w.reshape(b, out_channels, in_per_group, kh, kw)
    wk = jnp.transpose(wk, (3, 4, 2, 0, 1)).reshape(kh, kw, in_per_group, b * out_channels)
    if padding_mode != "zeros":
        x = F.pad2d(x, padding, mode=padding_mode)
        padding = ((0, 0), (0, 0))
        h, ww = x.shape[1], x.shape[2]
    xi = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, ww, b * c)
    out = lax.conv_general_dilated(
        xi, wk.astype(xi.dtype),
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * groups,
    )
    oh, ow = out.shape[1], out.shape[2]
    out = out.reshape(oh, ow, b, out_channels)
    return jnp.transpose(out, (2, 0, 1, 3))


def meta_linear(x, w, *, out_features, in_features):
    """Per-sample dynamic linear. x: (B, in); w: (B, out*in) flat (C-ordered
    (out, in), matching meta_linear.py:60)."""
    wk = w.reshape(-1, out_features, in_features)
    return jnp.einsum("bi,boi->bo", x, wk.astype(x.dtype))


def meta_conv2d_hyper_params(out_channels, in_channels, kernel_size, groups=1):
    kh, kw = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size, kernel_size)
    return out_channels * (in_channels // groups) * kh * kw


def meta_patch_conv2d(x, w, *, out_channels, kernel_size=1, groups=1,
                      padding=None, padding_mode="reflect", stride=(1, 1)):
    """Standalone patch-wise dynamic conv (MetaPatchConv2d, meta_patch.py:60):
    x (B, H, W, C); w (B, fh, fw, P) per-patch flat filters. `padding` is the
    halo radius (default kernel//2)."""
    from hyperseg_tpu.ops import patch as P

    k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
    pad = k // 2 if padding is None else padding
    fh, fw = w.shape[1], w.shape[2]
    if pad > 0:
        xp = P.extract_patches_with_halo(x, fh, fw, (pad, pad), mode=padding_mode)
    else:
        xp = P.block_patches(x, fh, fw)
    out = P.patch_conv_valid(xp, w, out_channels, (k, k), groups=groups,
                             stride=stride)
    return P.unblock_patches(out)


class MetaSequential:
    """Weight-routing sequential (meta_sequential.py:5-40): children with a
    `hyper_params` attribute receive their slice of the flat weight tensor;
    plain callables receive only x. Accepts a list of per-child weights too."""

    def __init__(self, *children):
        self.children = list(children)
        self.ranges = [0]
        for c in children:
            self.ranges.append(self.ranges[-1] +
                               int(getattr(c, "hyper_params", 0)))
        self.hyper_params = self.ranges[-1]

    def __call__(self, x, w):
        k = 0
        for i, c in enumerate(self.children):
            lo, hi = self.ranges[i], self.ranges[i + 1]
            if hi > lo:
                if isinstance(w, (list, tuple)):
                    x = c(x, w[k])
                else:
                    # torch-style clamped slicing (quirk #2)
                    hi_c = min(hi, w.shape[-1])
                    x = c(x, w[..., min(lo, hi_c):hi_c])
                k += 1
            else:
                x = c(x)
        return x


if __name__ == "__main__":
    # smoke main (reference meta_conv.py:233-254 / meta_patch.py:260-315):
    # shape checks + a dynamic-conv FPS micro-benchmark
    import time

    import jax
    import numpy as np

    rng = np.random.RandomState(0)
    b, cin, cout, h, w = 2, 8, 12, 32, 48
    x = jnp.asarray(rng.rand(b, h, w, cin), jnp.float32)
    wt = jnp.asarray(rng.rand(b, meta_conv2d_hyper_params(cout, cin, 3)),
                     jnp.float32)
    y = meta_conv2d(x, wt, out_channels=cout, kernel_size=(3, 3),
                    padding=((1, 1), (1, 1)))
    assert y.shape == (b, h, w, cout), y.shape
    yl = meta_linear(x[:, 0, 0], jnp.asarray(rng.rand(b, cout * cin)),
                     out_features=cout, in_features=cin)
    assert yl.shape == (b, cout)
    wp = jnp.asarray(rng.rand(b, 4, 6, meta_conv2d_hyper_params(cout, cin, 3)))
    yp = meta_patch_conv2d(x.astype(jnp.float32), wp.astype(jnp.float32),
                           out_channels=cout, kernel_size=3)
    assert yp.shape == (b, h, w, cout)

    f = jax.jit(lambda xx, ww: meta_conv2d(xx, ww, out_channels=cout,
                                           kernel_size=(3, 3),
                                           padding=((1, 1), (1, 1))))
    jax.block_until_ready(f(x, wt))
    t0 = time.perf_counter()
    for _ in range(100):
        out = f(x, wt)
    jax.block_until_ready(out)
    fps = 100 * b / (time.perf_counter() - t0)
    print(f"meta ops ok; meta_conv2d {fps:.0f} img/s at {x.shape}")
