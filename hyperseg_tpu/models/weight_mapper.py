"""Weight mapper ("context head"): maps the stride-32 backbone head feature to
the hypernetwork signal tensor.

Two generations, matching the reference:
  * WeightMapperV1 (hyperseg_v1_0.py:379-448): 1x1 in_conv halves channels, a
    stride-2 down pyramid, a global-average bottleneck broadcast, and an up
    path with skip concats; output = concat(top skip, upsampled) at stride 32
    with `in_channels` channels.
  * WeightMapperV0 (hyperseg_v0_1.py:249-329): down/up U-Net at constant
    width with optional avg-pool bottleneck, ending in a Conv2dMulti
    (:336-362) that emits one weight tensor per decoder level, each input
    slice sized by divide_feature_legacy_v01.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from hyperseg_tpu.nn import functional as F
from hyperseg_tpu.models.signal_split import divide_feature_legacy_v01, next_multiply

BN_EPS = 1e-5


def _conv_bn_relu(params, prefix, x, ctx=None, *, stride=1, relu=True,
                  bias=False, groups=1):
    b = params.get(f"{prefix}.0.bias")
    x = F.conv2d(x, params[f"{prefix}.0.weight"], b, stride=(stride, stride),
                 groups=groups)
    x = F.apply_bn(params, f"{prefix}.1", x, ctx, eps=BN_EPS)
    return F.relu(x) if relu else x


def _init_conv(params, rng, name, kh, kw, cin, cout, bias=False):
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    params[f"{name}.weight"] = jax.random.uniform(
        rng, (kh, kw, cin, cout), jnp.float32, -bound, bound)
    if bias:
        params[f"{name}.bias"] = jax.random.uniform(
            jax.random.fold_in(rng, 1), (cout,), jnp.float32, -bound, bound)


def _init_bn(params, name, c):
    params[f"{name}.weight"] = jnp.ones((c,), jnp.float32)
    params[f"{name}.bias"] = jnp.zeros((c,), jnp.float32)
    params[f"{name}.running_mean"] = jnp.zeros((c,), jnp.float32)
    params[f"{name}.running_var"] = jnp.ones((c,), jnp.float32)


class WeightMapperV1:
    """Signal head of hyperseg_v1_0 / v0_2 / v1_0_unify."""

    def __init__(self, in_channels, out_channels=None, levels=3, bias=False,
                 prefix="weight_mapper"):
        assert in_channels % 2 == 0
        self.in_channels = in_channels
        self.out_channels = out_channels  # informational (decoder param groups)
        self.levels = levels
        self.bias = bias
        self.prefix = prefix
        self.signal_channels = in_channels  # output = cat(skip, up) = in_channels

    def init(self, rng, params=None):
        params = {} if params is None else params
        p, c = self.prefix, self.in_channels
        _init_conv(params, jax.random.fold_in(rng, 0), f"{p}.in_conv.0", 1, 1,
                   c, c // 2, bias=self.bias)
        _init_bn(params, f"{p}.in_conv.1", c // 2)
        for i in range(self.levels - 1):
            _init_conv(params, jax.random.fold_in(rng, 10 + i),
                       f"{p}.down_blocks.{i}.0", 2, 2, c // 2, c // 2, bias=self.bias)
            _init_bn(params, f"{p}.down_blocks.{i}.1", c // 2)
            _init_conv(params, jax.random.fold_in(rng, 100 + i),
                       f"{p}.up_blocks.{i}.0", 1, 1, c, c // 2, bias=self.bias)
            _init_bn(params, f"{p}.up_blocks.{i}.1", c // 2)
        return params

    def __call__(self, params, x, ctx=None):
        p = self.prefix
        x = _conv_bn_relu(params, f"{p}.in_conv", x, ctx)

        skips = [x]
        for i in range(self.levels - 1):
            skips.append(_conv_bn_relu(params, f"{p}.down_blocks.{i}", skips[-1],
                                       ctx, stride=2))

        # Global-context bottleneck: average the coarsest map and broadcast it
        # back (hyperseg_v1_0.py:433-437).
        x = skips[-1]
        if x.shape[1] != 1 or x.shape[2] != 1:
            x = jnp.broadcast_to(jnp.mean(x, axis=(1, 2), keepdims=True), x.shape)

        for i in range(self.levels - 2, -1, -1):
            x = jnp.concatenate([skips.pop(-1), x], axis=-1)
            x = _conv_bn_relu(params, f"{p}.up_blocks.{i}", x, ctx)
            # x2 nearest upsample, targeted at the next skip's size so odd
            # stride-32 maps round-trip (equivalent when sizes are even)
            x = F.upsample_nearest(x, (skips[-1].shape[1], skips[-1].shape[2]))

        return jnp.concatenate([skips.pop(-1), x], axis=-1)


class WeightMapperV0:
    """Signal head of hyperseg_v0_1, emitting a list of per-level weight
    tensors through a multi-head 1x1 conv (Conv2dMulti, hyperseg_v0_1.py:336)."""

    def __init__(self, in_channels, out_channels: Sequence[int], levels=2,
                 bias=False, min_unit=8, down_groups=1, flat_groups=1,
                 weight_groups=1, avg_pool=False, prefix="weight_mapper"):
        self.in_channels = in_channels
        self.out_channels = list(out_channels)
        self.levels = levels
        self.bias = bias
        self.avg_pool = avg_pool
        self.down_groups = down_groups
        self.flat_groups = flat_groups
        self.weight_groups = weight_groups
        self.prefix = prefix
        min_unit = max(min_unit, weight_groups)
        self.rounded_out = [next_multiply(c, weight_groups) for c in self.out_channels]
        self.in_parts = [int(v) for v in divide_feature_legacy_v01(
            in_channels, self.rounded_out, min_unit)]

    def init(self, rng, params=None):
        params = {} if params is None else params
        p, c = self.prefix, self.in_channels
        for i in range(self.levels - 1):
            _init_conv(params, jax.random.fold_in(rng, 10 + i),
                       f"{p}.down_{i}.0", 2, 2, c // self.down_groups, c, bias=self.bias)
            _init_bn(params, f"{p}.down_{i}.1", c)
            _init_conv(params, jax.random.fold_in(rng, 100 + i),
                       f"{p}.flat_{i}.0", 1, 1, (c * 2) // self.flat_groups, c, bias=self.bias)
            _init_bn(params, f"{p}.flat_{i}.1", c)
        for i, (cin, cout) in enumerate(zip(self.in_parts, self.rounded_out)):
            _init_conv(params, jax.random.fold_in(rng, 1000 + i),
                       f"{p}.out_conv.conv_{i}", 1, 1, cin // self.weight_groups,
                       cout, bias=self.bias)
        return params

    def __call__(self, params, x, ctx=None):
        p = self.prefix
        if self.levels > 1:
            feats = [x]
            for i in range(self.levels - 1):
                feats.append(_conv_bn_relu(params, f"{p}.down_{i}", feats[-1],
                                           ctx, stride=2, groups=self.down_groups))
            if self.avg_pool:
                last = feats[-1]
                if last.shape[1] != 1 or last.shape[2] != 1:
                    feats[-1] = jnp.broadcast_to(
                        jnp.mean(last, axis=(1, 2), keepdims=True), last.shape)
            for i in range(self.levels - 2, -1, -1):
                up = F.upsample_nearest(feats.pop(-1),
                                        (feats[-1].shape[1], feats[-1].shape[2]))
                cat = jnp.concatenate([feats[-1], up], axis=-1)
                # flat blocks: ReLU only for level > 0 (hyperseg_v0_1.py:285-289)
                feats[-1] = _conv_bn_relu(params, f"{p}.flat_{i}", cat, ctx,
                                          relu=(i > 0), groups=self.flat_groups)
            x = feats[-1]

        out = []
        base = 0
        for i, (cin, cout, oc) in enumerate(zip(self.in_parts, self.rounded_out,
                                                self.out_channels)):
            sl = x[..., base:base + cin]
            b = params.get(f"{p}.out_conv.conv_{i}.bias")
            w = F.conv2d(sl, params[f"{p}.out_conv.conv_{i}.weight"], b,
                         groups=self.weight_groups)
            if self.weight_groups > 1:
                w = w[..., :oc]
            out.append(w)
            base += cin
        return out
