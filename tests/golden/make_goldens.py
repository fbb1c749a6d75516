"""Generate full-config golden artifacts (requires the torch reference).

For each shipped benchmark configuration this script:
  1. builds OUR model, inits from PRNGKey(0), calibrates BN running stats on
     the golden input (utils/calibrate.py), fp16-rounds every parameter;
  2. exports the params to a torch state_dict, loads them into the REFERENCE
     model of the same config, and records the reference's fp32 logits at the
     benchmark resolution;
  3. saves a compact artifact: 4x-strided reference logits (fp16), per-class
     mean/std over the full map (fp32), and the observed jax-vs-torch max
     deviation (which sets the test tolerance).

The committed artifacts let tests/test_golden.py verify logits parity for all
shipped configs WITHOUT the torch oracle installed. Regenerate with:
    python tests/golden/make_goldens.py [name ...]
"""

import copy
import importlib
import os
import sys
import types

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
GOLDEN_DIR = os.path.dirname(os.path.abspath(__file__))
REFERENCE_DIR = "/root/reference"

# the five shipped benchmark configs (BASELINE.md / bench_all.py); kwargs are
# identical for our factories and the reference's (tests/test_hyperseg_*.py)
CONFIGS = {
    "hyperseg_m_cityscapes": dict(
        module="hyperseg_v1_0", backbone="efficientnet-b1", res=(512, 1024),
        kw=dict(levels=2, out_feat_scale=[1.0, 0.25, 0.25, 0.25, 0.25],
                kernel_sizes=[1, 1, 1, 3, 3], level_channels=[64, 32, 16, 16, 16],
                expand_ratio=2, with_out_fc=False, decoder_dropout=None,
                weight_groups=[32, 16, 8, 16, 4], decoder_groups=1,
                num_classes=19)),
    "hyperseg_s_cityscapes": dict(
        module="hyperseg_v1_0_unify", backbone="efficientnet-b1", res=(768, 1536),
        kw=dict(levels=2, out_feat_scale=[1.0, 0.166, 0.2, 0.25, 0.4],
                kernel_sizes=[1, 1, 1, 3, 3], level_channels=[32, 16, 8, 8, 8],
                expand_ratio=2, with_out_fc=False, decoder_dropout=None,
                weight_groups=[32, 16, 8, 16, 4], decoder_groups=1,
                unify_level=4, num_classes=19)),
    "hyperseg_s_camvid": dict(
        module="hyperseg_v1_0", backbone="efficientnet-b1", res=(576, 768),
        kw=dict(levels=2, kernel_sizes=(1, 1, 1, 3, 3),
                level_channels=[64, 32, 16, 16, 16], expand_ratio=2,
                with_out_fc=False, decoder_dropout=None,
                weight_groups=[64, 32, 32, 16, 8], num_classes=12)),
    "hyperseg_l_camvid": dict(
        module="hyperseg_v1_0", backbone="efficientnet-b1", res=(768, 1024),
        kw=dict(levels=2, kernel_sizes=(1, 1, 1, 3, 3, 3),
                level_channels=[64, 32, 16, 16, 16, 16], expand_ratio=2,
                with_out_fc=False, decoder_dropout=None,
                weight_groups=[64, 32, 32, 16, 8, 8], num_classes=12)),
    "hyperseg_l_voc": dict(
        module="hyperseg_v0_1", backbone="efficientnet-b3", res=(512, 512),
        # deeper stack: the default attenuation starves the output (std
        # 0.02); milder factors keep it conditioned at std ~0.14
        atten=(9.0, 1.0),
        kw=dict(levels=3, kernel_sizes=(1, 1, 3, 3, 3, 3), expand_ratio=2,
                with_out_fc=False, decoder_dropout=None, weight_groups=16,
                num_classes=21)),
}

STRIDE = 4
INPUT_SEED = 11


def golden_input(res):
    h, w = res
    x = np.random.RandomState(INPUT_SEED).rand(1, h, w, 3).astype(np.float32)
    return x * 2.0 - 1.0  # roughly the range of a Normalize()d image


def build_ours(name, bn_stats=None):
    """Deterministically reproduce the golden model: init from PRNGKey(0),
    BN running stats either computed by calibration (generation) or loaded
    from the artifact (test — recomputing them would couple the comparison
    to tiny compilation-dependent float differences that feed back through
    the fp16 rounding), fp16-round everything."""
    import jax
    import jax.numpy as jnp

    cfg = CONFIGS[name]
    jmod = importlib.import_module(f"hyperseg_tpu.models.{cfg['module']}")
    model = jmod.hyperseg_efficientnet(cfg["backbone"], **copy.deepcopy(cfg["kw"]))
    params = model.init(jax.random.PRNGKey(0))
    x = golden_input(cfg["res"])
    if bn_stats is None:
        from hyperseg_tpu.utils.calibrate import calibrate_bn
        params = calibrate_bn(model, params, jnp.asarray(x))
        # Deliberately attenuated operating point: at exact batch stats the
        # random-init hypernetwork amplifies 1-ulp float-order differences
        # into macroscopic logit changes (measured jax-vs-torch max|dev| 5-15
        # at output std ~0.9, argmax agreement only 82%) — a strict numeric
        # golden there is ill-conditioned BY CONSTRUCTION, not by bug.
        # Inflating the running variances (100x backbone, 10x decoder/mapper)
        # attenuates each BN's output, damping the chaos while still
        # exercising every parameter and code path (structural regressions
        # still produce O(std) deviations; measured conditioning at this
        # point: max|dev| 1e-3..1e-2 at output std 0.14-0.29).
        fb, fd = cfg.get("atten", (100.0, 10.0))
        params = {k: (v * (fb if k.startswith("backbone.") else fd)
                      if k.endswith(".running_var") else v)
                  for k, v in params.items()}
    else:
        params = {**params, **bn_stats}
    params = {k: np.asarray(v).astype(np.float16).astype(np.float32)
              for k, v in params.items()}
    return model, params, x


def make(name):
    import torch
    from hyperseg_tpu.core.torch_import import export_state_dict

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    sys.modules.setdefault("ffmpeg", types.ModuleType("ffmpeg"))

    cfg = CONFIGS[name]
    model, params, x = build_ours(name)
    import jax.numpy as jnp
    ours = np.asarray(model(params, jnp.asarray(x)))

    tmod = importlib.import_module(f"hyperseg.models.{cfg['module']}")
    tm = tmod.hyperseg_efficientnet(cfg["backbone"], pretrained=False,
                                    **copy.deepcopy(cfg["kw"]))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params).items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)  # NHWC

    assert ref.shape == ours.shape, (ref.shape, ours.shape)
    std = float(ref.std())
    # guard against the underflow regime (uncalibrated BN gives std ~1e-39);
    # calibrated configs land at std 0.2-2 depending on depth
    assert std > 0.05, f"{name}: degenerate golden (std={std})"
    dev = float(np.abs(ours - ref).max())
    print(f"{name}: ref std={std:.3f}  jax-vs-torch max|dev|={dev:.2e}")

    stats = {f"bn::{k}": v.astype(np.float16) for k, v in params.items()
             if k.endswith((".running_mean", ".running_var"))}
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, f"{name}.npz"),
        sample=ref[:, ::STRIDE, ::STRIDE, :].astype(np.float16),
        cls_mean=ref.mean(axis=(0, 1, 2)).astype(np.float32),
        cls_std=ref.std(axis=(0, 1, 2)).astype(np.float32),
        max_dev=np.float32(dev), ref_std=np.float32(std),
        res=np.array(cfg["res"]), stride=np.int32(STRIDE), **stats)


if __name__ == "__main__":
    # the environment's sitecustomize registers a TPU backend; generation is
    # a CPU+torch job — force CPU regardless (as tests/conftest.py does)
    import jax
    jax.config.update("jax_platforms", "cpu")
    names = sys.argv[1:] or list(CONFIGS)
    for n in names:
        make(n)
