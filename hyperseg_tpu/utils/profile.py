"""Profiling: analytic FLOPs/params tables + XLA compiled-cost analysis.

Covers both reference profilers (utils/profile.py — MACs/params per module —
and utils/meta_profile.py — which adds a *generated* hyper-params column for
dynamic layers). Two complementary sources:

  * `model_profile`: analytic walk over the static plans (backbone MBConv
    blocks, weight mapper, decoder hyper units) — per-component params, MACs,
    and generated-params-per-patch, printed as a table.
  * `xla_cost`: ground truth from the compiled executable
    (jit(...).lower().compile().cost_analysis()) — total FLOPs and bytes
    accessed as XLA sees them after fusion.
  * `wall_clock`: block_until_ready timing (the test_fps.py:172-191 bracket).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import jax


@dataclass
class Row:
    name: str
    params: int = 0
    hyper_params: int = 0   # generated at runtime per patch (meta profiler column)
    macs: int = 0


def count_params(params) -> Tuple[int, int]:
    """(total, trainable) element counts of a flat parameter dict."""
    total = sum(int(np.prod(v.shape)) for v in params.values())
    trainable = sum(int(np.prod(v.shape)) for k, v in params.items()
                    if not k.endswith((".running_mean", ".running_var")))
    return total, trainable


def _conv_macs(oh, ow, kh, kw, cin, cout, groups=1):
    return oh * ow * kh * kw * (cin // groups) * cout


def backbone_rows(backbone, in_hw) -> Tuple[List[Row], list]:
    """Per-block profile of the EfficientNet plan; returns rows + the feature
    (stride) sizes for downstream use."""
    rows = []
    h, w = in_hw[0] // 2, in_hw[1] // 2
    rows.append(Row("_conv_stem", params=9 * backbone.in_channels * backbone.stem_ch,
                    macs=_conv_macs(h, w, 3, 3, backbone.in_channels, backbone.stem_ch)))
    for i, bp in enumerate(backbone.blocks):
        mid = bp.in_ch * bp.expand
        p = m = 0
        if bp.expand != 1:
            p += bp.in_ch * mid
            m += _conv_macs(h, w, 1, 1, bp.in_ch, mid)
        oh, ow = -(-h // bp.stride), -(-w // bp.stride)
        p += bp.kernel * bp.kernel * mid
        m += _conv_macs(oh, ow, bp.kernel, bp.kernel, mid, mid, groups=mid)
        if bp.se_ch is not None:
            p += mid * bp.se_ch * 2 + bp.se_ch + mid
            m += mid * bp.se_ch * 2
        p += mid * bp.out_ch
        m += _conv_macs(oh, ow, 1, 1, mid, bp.out_ch)
        rows.append(Row(f"_blocks.{i}", params=p, macs=m))
        h, w = oh, ow
    rows.append(Row("_conv_head",
                    params=backbone.blocks[-1].out_ch * backbone.head_ch,
                    macs=_conv_macs(h, w, 1, 1, backbone.blocks[-1].out_ch,
                                    backbone.head_ch)))
    return rows, (h, w)


def decoder_rows(decoder, s_hw) -> List[Row]:
    """Per-unit profile of a decoder plan, including the meta column: each
    unit's `hyper_params` is the per-patch generated weight count and its
    signal2weights conv contributes static params + MACs on the signal grid."""
    rows = []
    sh, sw = s_hw
    for lv, units in enumerate(decoder.level_units):
        scale = 2 ** lv
        h, w = sh * scale, sw * scale
        for u in units:
            p = m = 0
            s2w = getattr(u, "s2w", None)
            if s2w is not None:
                p += (s2w.signal_ch // s2w.groups) * s2w.out_ch
                m += sh * sw * (s2w.signal_ch // s2w.groups) * s2w.out_ch
            # dynamic compute: hyper_params MACs per pixel of the level map
            m += h * w * int(u.hyper_params) // max(
                getattr(u, "kernel", 1) ** 0 , 1)
            rows.append(Row(f"level_{lv}/{type(u).__name__}", params=p,
                            hyper_params=int(u.hyper_params), macs=m))
    if getattr(decoder, "weight_routes", None):
        for i, r in enumerate(decoder.weight_routes):
            rows.append(Row(f"weight_blocks.{i}",
                            params=(r.signal_ch // r.groups) * r.out_ch,
                            macs=sh * sw * (r.signal_ch // r.groups) * r.out_ch))
    return rows


def model_profile(model, input_hw=(512, 1024), print_table=True):
    """Analytic profile of a HyperGen model. Returns (rows, totals)."""
    rows, s_hw = backbone_rows(model.backbone, input_hw)
    rows += decoder_rows(model.decoder, s_hw)
    total = Row("TOTAL",
                params=sum(r.params for r in rows),
                hyper_params=sum(r.hyper_params for r in rows),
                macs=sum(r.macs for r in rows))
    if print_table:
        fmt = "{:<38}{:>14}{:>14}{:>16}"
        print(fmt.format("module", "params", "hyper-params", "MACs"))
        for r in rows + [total]:
            print(fmt.format(r.name, f"{r.params:,}", f"{r.hyper_params:,}",
                             f"{r.macs:,}"))
    return rows, total


def xla_cost(fn, *args):
    """Compiled-cost analysis of a jitted callable: {'flops', 'bytes accessed',
    ...} as reported by XLA after fusion."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return dict(cost) if cost else {}


def wall_clock(fn, *args, iters=20, warmup=3):
    """Median wall-clock seconds per call with device sync."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def trace(log_dir: str):
    """Context manager around jax.profiler.trace for TensorBoard traces."""
    return jax.profiler.trace(log_dir)


def cli():
    """Profiler CLI — the profile.py / meta_profile.py entry point: prints the
    per-module params / generated-params / MACs table and the XLA compiled
    cost for a model spec."""
    import argparse
    import jax
    import jax.numpy as jnp
    from hyperseg_tpu.core import registry

    p = argparse.ArgumentParser("hyperseg_tpu profiler")
    p.add_argument("-m", "--model", required=True, help="model spec string")
    p.add_argument("-r", "--res", default=(512, 1024), type=int, nargs=2)
    p.add_argument("-b", "--batch", default=1, type=int)
    p.add_argument("--xla", action="store_true", help="also compile and print XLA cost")
    a = p.parse_args()

    model = registry.build(a.model)
    rows, total = model_profile(model, tuple(a.res))
    params = model.init(jax.random.PRNGKey(0))
    from hyperseg_tpu.utils.profile import count_params
    tot, trn = count_params(params)
    print(f"parameters: {tot:,} total / {trn:,} trainable; "
          f"generated per patch: {total.hyper_params:,}")
    if a.xla:
        x = jnp.zeros((a.batch, *a.res, 3), jnp.float32)
        cost = xla_cost(lambda p_, x_: model(p_, x_), params, x)
        flops = cost.get("flops")
        print(f"XLA: flops={flops:,.0f} bytes={cost.get('bytes accessed', 0):,.0f}")


if __name__ == "__main__":
    cli()
