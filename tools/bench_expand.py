"""Expand-block (blocks 2-4) kernel A/B at the flagship shapes.

Two views, both with the bench.py fori_loop methodology and identity-baseline
subtraction (run alone on the idle chip — see NEXT_STEPS.md #6):

1. End-to-end three-way flag A/B on HyperSeg-M (the VERDICT round-2 ask):
   stem kernel only / + expand-1 MBConv chain / + expand-ratio blocks too.
2. Per-block micro: XLA block vs the expand_dw_phase + SE + project_phase
   pipeline at each expand block's real geometry, sweeping the channel-chunk
   size (the known cost center: VMEM-forced chunking vs lane fill).

Usage: python tools/bench_expand.py [e2e|micro|both]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])


import functools

from tools._bench import timed as _timed

timed = functools.partial(_timed, iters=400)


def e2e():
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    from hyperseg_tpu.ops import pallas as cfg
    from __graft_entry__ import HYPERSEG_M_KW

    model = V1.hyperseg_efficientnet("efficientnet-b1", **HYPERSEG_M_KW)
    params = model.init(jax.random.PRNGKey(0))
    params = {k: (v.astype(jnp.bfloat16)
                  if v.dtype == jnp.float32 and v.ndim >= 2 else v)
              for k, v in params.items()}
    x = jnp.asarray(np.random.RandomState(0).rand(1, 512, 1024, 3),
                    jnp.bfloat16)
    base = timed(lambda xx: xx, x)
    print(f"harness floor: {base:.3f} ms/iter")
    for label, mb, exp in (("stem kernel only", False, False),
                           ("+ expand-1 MBConv chain", True, False),
                           ("+ expand-ratio blocks 2-4", True, True)):
        cfg.MBCONV_ENABLED, cfg.MBCONV_EXPAND_ENABLED = mb, exp
        ms = timed(lambda xx: model(params, xx), x) - base
        print(f"{label:28s}: {ms:.3f} ms  ({1e3 / ms:.1f} img/s)", flush=True)
    cfg.MBCONV_ENABLED, cfg.MBCONV_EXPAND_ENABLED = True, False


def micro():
    from hyperseg_tpu.models.backbones import efficientnet as E
    from hyperseg_tpu.nn import functional as F
    from hyperseg_tpu.ops.pallas import mbconv as MB

    bb = E.EfficientNet("efficientnet-b1")
    params = {k: (v.astype(jnp.bfloat16)
                  if v.dtype == jnp.float32 and v.ndim >= 2 else v)
              for k, v in bb.init(jax.random.PRNGKey(0)).items()}
    rng = np.random.RandomState(0)
    cases = [(2, (1, 16, 256, 512)), (3, (1, 24, 128, 256)),
             (4, (1, 24, 128, 256))]
    for bi, shape in cases:
        bp = bb.blocks[bi]
        p = f"_blocks.{bi}"
        xpl = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
        x_nhwc = jnp.transpose(xpl, (0, 2, 3, 1))
        base = timed(lambda xx: xx, xpl)

        def xla_block(xx):
            return bb._block(params, p, bp, jnp.transpose(xx, (0, 2, 3, 1)),
                             None, drop_rate=0.0, rng=None)

        def kern_block(xx, cchunk=None):
            bn0 = tuple(params[f"{p}._bn0.{f}"] for f in
                        ("weight", "bias", "running_mean", "running_var"))
            bn1 = tuple(params[f"{p}._bn1.{f}"] for f in
                        ("weight", "bias", "running_mean", "running_var"))
            bn2 = tuple(params[f"{p}._bn2.{f}"] for f in
                        ("weight", "bias", "running_mean", "running_var"))
            resid = xx if bp.stride == 1 and bp.in_ch == bp.out_ch else None
            h = MB.expand_dw_phase(
                xx, params[f"{p}._expand_conv.weight"], bn0,
                params[f"{p}._depthwise_conv.weight"], bn1,
                stride=bp.stride, eps=E.BN_EPS, cchunk=cchunk)
            pooled = jnp.mean(h.astype(jnp.float32), axis=(2, 3))
            se = F.swish(pooled @ params[f"{p}._se_reduce.weight"][0, 0]
                         + params[f"{p}._se_reduce.bias"])
            se = jax.nn.sigmoid(se @ params[f"{p}._se_expand.weight"][0, 0]
                                + params[f"{p}._se_expand.bias"])
            return MB.project_phase(h, se, params[f"{p}._project_conv.weight"],
                                    *bn2, residual=resid, eps=E.BN_EPS)

        # NHWC->planar transpose included for the XLA side so both paths
        # consume the chain's planar layout
        t_xla = timed(xla_block, xpl) - base
        cmid = bp.in_ch * bp.expand
        print(f"block {bi} (cmid={cmid}, s={bp.stride}, {shape[2]}x{shape[3]}):"
              f" XLA {t_xla:.3f} ms", flush=True)
        for cc in sorted({d for d in (16, 24, 32, 48, cmid)
                          if cmid % d == 0}):
            try:
                t_k = timed(lambda xx, cc=cc: kern_block(xx, cc), xpl) - base
                print(f"    kernel cchunk={cc:3d}: {t_k:.3f} ms", flush=True)
            except Exception as e:
                print(f"    kernel cchunk={cc:3d}: FAILED "
                      f"{type(e).__name__}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("e2e", "both"):
        e2e()
    if mode in ("micro", "both"):
        micro()
