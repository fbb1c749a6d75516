"""Inference-time parameter folding.

`fold_bn` rewrites a parameter dict so every conv followed by a BatchNorm
absorbs the BN's affine+running-stats into the conv kernel (plus a bias), and
the BN becomes identity. Mathematically exact for eval mode; removes one
full-feature-map elementwise pass per BN. The model code is unchanged — the
identity BNs are still applied but XLA folds `x * 1 + b` into the conv
epilogue.

Known conv->BN pairs follow the reference structure: EfficientNet stem/
expand/depthwise/project/feat_fc/head (efficientnet.py), the weight-mapper
conv+BN sequentials, and the decoder's k=1 block BNs (the patch-space BNs of
inverted residuals are not conv-adjacent in parameter space and stay as-is).
"""

from __future__ import annotations

import jax.numpy as jnp


def _fold_pair(params, conv_key, bn_prefix, eps):
    w = params.get(conv_key)
    if w is None or f"{bn_prefix}.running_mean" not in params:
        return
    scale = params[f"{bn_prefix}.weight"].astype(jnp.float32)
    bias = params[f"{bn_prefix}.bias"].astype(jnp.float32)
    mean = params[f"{bn_prefix}.running_mean"].astype(jnp.float32)
    var = params[f"{bn_prefix}.running_var"].astype(jnp.float32)
    mult = scale / jnp.sqrt(var + eps)          # per out-channel
    params[conv_key] = (w.astype(jnp.float32) * mult).astype(w.dtype)
    # fold the additive part into the BN (now an identity-scale bias)
    params[f"{bn_prefix}.weight"] = jnp.ones_like(scale)
    params[f"{bn_prefix}.bias"] = bias - mean * mult
    params[f"{bn_prefix}.running_mean"] = jnp.zeros_like(mean)
    params[f"{bn_prefix}.running_var"] = jnp.ones_like(var)


def fold_bn(params, *, backbone_eps=1e-3, eps=1e-5):
    """Return a new parameter dict with conv-adjacent BNs folded (eval only)."""
    params = dict(params)
    # discover conv->BN pairs by the framework's naming conventions
    pairs = []
    for k in params:
        if not k.endswith(".weight"):
            continue
        v = params[k]
        if v.ndim != 4:
            continue
        name = k[:-len(".weight")]
        # EfficientNet pairs
        for conv, bn in (("_conv_stem", "_bn0"), ("_conv_head", "_bn1")):
            if name.endswith(conv):
                pairs.append((k, name[:-len(conv)] + bn, backbone_eps))
        for conv, bn in (("_expand_conv", "_bn0"), ("_depthwise_conv", "_bn1"),
                         ("_project_conv", "_bn2")):
            if name.endswith(conv):
                pairs.append((k, name[:-len(conv)] + bn, backbone_eps))
        if "_feat_fc_" in name and name.endswith(".0"):
            pairs.append((k, name[:-2] + ".1", backbone_eps))
        # weight mapper / k=1 decoder blocks: '<prefix>.0.weight' + '<prefix>.1.*'
        if (name.endswith(".0") and ("weight_mapper" in name or
                                     "level_" in name or "flat_" in name or
                                     "down_" in name)):
            pairs.append((k, name[:-2] + ".1", eps))
    for conv_key, bn_prefix, e in pairs:
        _fold_pair(params, conv_key, bn_prefix, e)
    return params
