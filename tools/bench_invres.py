"""Measure the patch inverted-residual op: XLA path vs fused Pallas kernel.

Runs on the real TPU chip; shapes are the HyperSeg-M k=3 decoder levels at
the benchmark resolution (512x1024). Methodology matches bench.py: on-device
fori_loop, perturbed input, single scalar readback."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hyperseg_tpu.models.decoder import InvResUnit
from hyperseg_tpu.nn import functional as F

SHAPES = [
    # name, (B, H, W), fh, fw, cin, hidden, out, k
    # (decoder level ℓ of a (H0, W0) input runs at H0/2^(4-ℓ); the patch grid
    # is H0/32 x W0/32 — traced for HyperSeg-M 512x1024 / HyperSeg-S CamVid
    # 576x768: level-3 patches are 8x8, level-4 patches 16x16)
    ("M_level3", (1, 128, 256), 16, 32, 24, 48, 16, 3),
    ("M_level4", (1, 256, 512), 16, 32, 34, 68, 19, 3),
    ("S_camvid_l3", (1, 144, 192), 18, 24, 24, 48, 16, 3),
    ("S_camvid_l4", (1, 288, 384), 18, 24, 34, 68, 12, 3),
    # HyperSeg-L CamVid 1024x768 (6 levels; InvRes at 3/4/5; level 5 runs at
    # input resolution with 32x32 patches — the shape where the XLA gather
    # path is pathological even at batch 1: forcing the kernels lifted the
    # whole config 108.6 -> 141.5 img/s, tools/bench_s2w.py round 4)
    ("L_camvid_l3", (1, 192, 256), 24, 32, 24, 48, 16, 3),
    ("L_camvid_l4", (1, 384, 512), 24, 32, 34, 68, 16, 3),
    ("L_camvid_l5", (1, 768, 1024), 24, 32, 21, 42, 12, 3),
]


from tools._bench import timed


def main():
    from hyperseg_tpu.ops import pallas as pallas_cfg
    dtype = jnp.bfloat16
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    only = sys.argv[2] if len(sys.argv) > 2 else ""  # substring shape filter
    for name, (b, hgt, wid), fh, fw, cin, hidden, out, k in SHAPES:
        if only and only not in name:
            continue
        b *= batch
        unit = InvResUnit(prefix="u", in_ch=cin, out_ch=out, hidden=hidden,
                          kernel=k)
        P = unit.hyper_params
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(b, hgt, wid, cin), dtype)
        w = jnp.asarray(rng.rand(b, fh, fw, P) * 0.1, dtype)
        params = {}
        for i, ch in [(1, hidden), (2, hidden), (3, out)]:
            params[f"u.bn{i}.weight"] = jnp.ones(ch, jnp.float32)
            params[f"u.bn{i}.bias"] = jnp.zeros(ch, jnp.float32)
            params[f"u.bn{i}.running_mean"] = jnp.zeros(ch, jnp.float32)
            params[f"u.bn{i}.running_var"] = jnp.ones(ch, jnp.float32)

        from hyperseg_tpu.ops import patch as Pops
        from hyperseg_tpu.ops.pallas import patch_invres as PI

        # Pin each path explicitly: the default dispatch gates (batch-based
        # kernel dispatch, fullmap eval gate) would otherwise silently remap
        # which formulation "xla" means at batch >= 2.
        def pin(kernel=False, fullmap=False, rank4=False, out6d=False):
            pallas_cfg.ENABLED = kernel
            pallas_cfg.INVRES_MIN_BATCH = 1 if kernel else 10 ** 9
            # the batch-1 big-patch carve-out would silently dispatch the
            # kernel under a "gather" pin at 32x32-patch shapes (L_camvid_l5)
            pallas_cfg.INVRES_B1_MIN_PATCH_AREA = 1 if kernel else 10 ** 9
            Pops.FULLMAP_INVRES = fullmap
            Pops.FULLMAP_INVRES_EVAL_MIN_BATCH = 1
            PI.RANK4_DOT = rank4
            PI.OUT6D = out6d

        variants = [("gather", dict()),
                    ("fullmap", dict(fullmap=True)),
                    ("pallas", dict(kernel=True)),
                    ("rank4", dict(kernel=True, rank4=True)),
                    ("out6d", dict(kernel=True, out6d=True)),
                    # lane-packing (round-3 item 10): g patches share the
                    # 128-lane axis; any g dividing the chunk is legal, the
                    # BN/store pads absorb non-tile-aligned g*hidden
                    ("pack2", dict(kernel=True, pack=2)),
                    ("pack4", dict(kernel=True, pack=4))]
        times, outs = {}, {}
        for vname, kw in variants:
            kw = dict(kw)
            PI.LANE_PACK = kw.pop("pack", 1)
            pin(**kw)
            try:
                times[vname] = timed(
                    lambda xx, ww: unit.apply(params, xx, ww), x, w)
            except Exception as e:  # e.g. scoped-vmem OOM at level-4 shapes
                print(f"  {name}/{vname} failed: "
                      f"{type(e).__name__}: {str(e)[:600]}", flush=True)
                times[vname] = float("nan")
                continue
            try:  # accuracy check separately: its failure keeps the timing
                outs[vname] = np.asarray(unit.apply(
                    params, x.astype(jnp.float32), w.astype(jnp.float32)))
            except Exception as e:
                print(f"  {name}/{vname} f32 accuracy apply failed: "
                      f"{type(e).__name__}: {str(e)[:600]}", flush=True)
        pin()
        PI.LANE_PACK = 1
        pallas_cfg.INVRES_B1_MIN_PATCH_AREA = 1024
        pallas_cfg.INVRES_MIN_BATCH = 2
        Pops.FULLMAP_INVRES = True
        Pops.FULLMAP_INVRES_EVAL_MIN_BATCH = 2

        ok = {v: t for v, t in times.items() if t == t}
        if not ok:
            print(f"{name}: all variants failed")
            continue
        ref_name = "gather" if "gather" in outs else next(iter(outs), None)
        devs = ({v: np.abs(outs[v] - outs[ref_name]).max()
                 / (np.abs(outs[ref_name]).max() + 1e-6) for v in outs}
                if ref_name else {})
        best = min(ok, key=ok.get)
        print(f"{name}: " + "  ".join(f"{v}={times[v]:.3f}ms" for v, _ in
                                      variants)
              + f"  best={best}"
              + (f"  max_rel_dev={max(devs.values()):.2e} (vs {ref_name})"
                 if devs else ""))


if __name__ == "__main__":
    main()
