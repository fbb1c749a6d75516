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


# ---------------------------------------------------------------------------
# Generic scope profiler — the XLA-native analogue of the reference's
# hook-registry profiler (/root/reference/hyperseg/utils/profile.py:9-127):
# instead of nn.Module forward hooks, model code annotates module boundaries
# with jax.named_scope, the traced jaxpr is walked once, and a registry of
# per-primitive counting rules accumulates FLOPs per scope. Depth clipping
# and the per-module table mirror the reference's clip_summary_depth /
# print_summary semantics. Works for ANY jax-traceable callable — no
# per-model-family hand-written rows needed.
# ---------------------------------------------------------------------------

def _dot_flops(eqn):
    ((lc, rc), _batch) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    out = int(np.prod(eqn.outvars[0].aval.shape))
    contract = int(np.prod([lhs[d] for d in lc])) if lc else 1
    return 2 * out * contract


def _conv_flops(eqn):
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    out = int(np.prod(eqn.outvars[0].aval.shape))
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    k_spatial = int(np.prod([rhs[d] for d in dn.rhs_spec[2:]]))
    cin = lhs[dn.lhs_spec[1]]
    return 2 * out * k_spatial * (cin // groups)


def _ewise_flops(eqn):
    return int(np.prod(eqn.outvars[0].aval.shape))


def _reduce_flops(eqn):
    return int(np.prod(eqn.invars[0].aval.shape))


# primitive name -> FLOPs rule; extend via the custom_rules argument
# (the analogue of the reference's custom_ops overwrite, profile.py:19-23)
FLOP_RULES = {
    "dot_general": _dot_flops,
    "conv_general_dilated": _conv_flops,
    **{p: _ewise_flops for p in (
        "add", "sub", "mul", "div", "max", "min", "pow", "exp", "log",
        "tanh", "logistic", "rsqrt", "sqrt", "erf", "integer_pow",
        "add_any", "select_n")},
    **{p: _reduce_flops for p in (
        "reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
        "argmax", "argmin", "reduce_and", "reduce_or")},
}

_ZERO_PRIMS = {  # data movement / bookkeeping: zero FLOPs by design
    "reshape", "transpose", "broadcast_in_dim", "convert_element_type",
    "slice", "dynamic_slice", "dynamic_update_slice", "concatenate",
    "gather", "scatter", "scatter-add", "pad", "squeeze", "rev", "iota",
    "copy", "stop_gradient", "split",
}


def flops_by_scope(fn, *args, max_depth=None, custom_rules=None,
                   warn_unknown=False):
    """Trace `fn(*args)` and return [(scope, flops, in_shape, out_shape)]
    aggregated by jax.named_scope path (clipped to max_depth components),
    in first-visit order. Sub-jaxprs (pjit/scan/while/cond/remat) are
    visited recursively; scan bodies are multiplied by trip count."""
    rules = {**FLOP_RULES, **(custom_rules or {})}
    closed = jax.make_jaxpr(fn)(*args)
    agg = {}
    order = []
    warned = set()

    def clip(stack):
        parts = [p for p in str(stack).split("/") if p]
        if max_depth is not None:
            parts = parts[:max_depth]
        return "/".join(parts)

    def visit(jaxpr, mult):
        for eqn in jaxpr.eqns:
            sub_mult = mult
            if eqn.primitive.name == "scan":
                sub_mult = mult * eqn.params.get("length", 1)
            elif eqn.primitive.name == "while":
                sub_mult = mult  # dynamic trip count: count one iteration
            for v in eqn.params.values():
                for j in _extract_jaxprs(v):
                    visit(j, sub_mult)
            rule = rules.get(eqn.primitive.name)
            fl = mult * rule(eqn) if rule else 0
            if (rule is None and warn_unknown
                    and eqn.primitive.name not in _ZERO_PRIMS
                    and eqn.primitive.name not in warned):
                warned.add(eqn.primitive.name)
                print(f"[WARN] no FLOPs rule for primitive "
                      f"{eqn.primitive.name!r}; counted as zero")
            scope = clip(eqn.source_info.name_stack)
            if scope not in agg:
                agg[scope] = [0, None, None]
                order.append(scope)
            row = agg[scope]
            row[0] += fl
            shapes_in = [tuple(v.aval.shape) for v in eqn.invars
                         if getattr(v.aval, "shape", ())]
            if row[1] is None and shapes_in:
                row[1] = shapes_in[0]
            if eqn.outvars and getattr(eqn.outvars[0].aval, "shape", ()):
                row[2] = tuple(eqn.outvars[0].aval.shape)

    def _extract_jaxprs(v):
        if hasattr(v, "jaxpr") and hasattr(v, "consts"):   # ClosedJaxpr
            return [v.jaxpr]
        if hasattr(v, "eqns"):                              # Jaxpr
            return [v]
        if isinstance(v, (tuple, list)):
            return [j for x in v for j in _extract_jaxprs(x)]
        return []

    visit(closed.jaxpr, 1)
    return [(s, agg[s][0], agg[s][1], agg[s][2]) for s in order]


def params_by_scope(params, max_depth=None):
    """Aggregate flat-param-dict element counts by dotted prefix clipped to
    max_depth components (the analogue of count_parameters per module)."""
    out = {}
    for k, v in params.items():
        parts = k.split(".")[:-1]
        if max_depth is not None:
            parts = parts[:max_depth]
        key = ".".join(parts)
        out[key] = out.get(key, 0) + int(np.prod(v.shape))
    return out


def assign_params_to_scopes(params, scopes):
    """Assign each flat-param key to the LONGEST row scope whose dotted form
    prefixes it (scopes are named_scope paths like 'backbone/_blocks.0';
    param keys 'backbone._blocks.0._bn1.weight'). Keys matching no scope go
    to the '' (top) row if present. No double counting: the per-row Params
    column sums to the model total."""
    pref = {s: s.replace("/", ".") for s in scopes}
    counts = {s: 0 for s in scopes}
    for k, v in params.items():
        best = None
        for s, d in pref.items():
            if d and (k == d or k.startswith(d + ".")):
                if best is None or len(d) > len(pref[best]):
                    best = s
        if best is None and "" in counts:
            best = ""
        if best is not None:
            counts[best] += int(np.prod(v.shape))
    return counts


def print_scope_table(rows, params=None):
    """Reference print_summary format: Layer | Shape Mapping | Params | FLOPs
    (profile.py:66-92), over flops_by_scope rows. `params` is the flat param
    dict; each key is counted on the deepest matching scope row."""
    by_scope = (assign_params_to_scopes(params, [r[0] for r in rows])
                if params else {})
    table = []
    for scope, fl, in_sh, out_sh in rows:
        shapes = (f"{list(in_sh) if in_sh else '?'} -> "
                  f"{list(out_sh) if out_sh else '?'}")
        p = by_scope.get(scope, 0)
        table.append((scope or "(top)", shapes, f"{p:,}", f"{fl / 1e9:.3f}B"))
    total_fl = sum(fl for _s, fl, _i, _o in rows)
    total_p = sum(int(np.prod(v.shape)) for v in params.values()) if params else 0
    table.append(("TOTAL", "", f"{total_p:,}" if params else "",
                  f"{total_fl / 1e9:.3f}B"))
    titles = ("Scope", "Shape Mapping", "Params", "FLOPs")
    widths = [max(len(str(r[i])) for r in table + [titles])
              for i in range(4)]
    line = "-" * (sum(widths) + 6)
    print(line)
    print("  ".join(f"{t:^{w}}" for t, w in zip(titles, widths)))
    print("=" * (sum(widths) + 6))
    for i, r in enumerate(table):
        if i == len(table) - 1:
            print("=" * (sum(widths) + 6))
        print("  ".join(f"{str(c):>{w}}" for c, w in zip(r, widths)))
    print(line)


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
    p.add_argument("--scopes", action="store_true",
                   help="generic per-scope table from the traced jaxpr "
                        "(any model; reference profile.py table format)")
    p.add_argument("--max_depth", type=int, default=2,
                   help="scope depth clipping for --scopes")
    a = p.parse_args()

    model = registry.build(a.model)
    if a.scopes:
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.zeros((a.batch, *a.res, 3), jnp.float32)
        rows = flops_by_scope(lambda p_, x_: model(p_, x_), params, x,
                              max_depth=a.max_depth, warn_unknown=True)
        print_scope_table(rows, params)
        return
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
