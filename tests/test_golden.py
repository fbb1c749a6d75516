"""Golden-file parity: verifies logits against a committed reference output.

The artifact (tests/golden/hyperseg_v1_0_b0_tiny.npz) holds a calibrated
reference model's state_dict (fp16), an input batch, and the reference's fp32
output — generated once from the PyTorch reference, so this check runs WITHOUT
the reference installed (unlike the oracle-based tests)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "hyperseg_v1_0_b0_tiny.npz")


def test_golden_logits_parity():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden artifact missing")
    from hyperseg_tpu.core.torch_import import convert_state_dict
    from hyperseg_tpu.models import hyperseg_v1_0 as M

    z = np.load(GOLDEN)
    x = z["__input__"].astype(np.float32)
    want = z["__output__"]
    sd = {k[len("sd::"):]: z[k].astype(np.float32) for k in z.files
          if k.startswith("sd::")}

    model = M.hyperseg_efficientnet(
        "efficientnet-b0", levels=2, kernel_sizes=[1, 3],
        level_channels=[16, 16], expand_ratio=2, weight_groups=[8, 8],
        num_classes=7)
    params = convert_state_dict(sd)
    out = model(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    # the artifact's weights were fp16-rounded before the reference output
    # was recorded, so both sides compute from identical values; observed
    # max deviation is ~1.5e-3 at output std ~5.5
    np.testing.assert_allclose(got, want, atol=1e-2)


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "hyperseg_m_cityscapes", "hyperseg_s_cityscapes", "hyperseg_s_camvid",
    "hyperseg_l_camvid", "hyperseg_l_voc"])
def test_config_golden(name):
    """Full-config logits parity against committed reference outputs at the
    benchmark resolutions — runs WITHOUT the torch oracle. The golden model is
    reproduced deterministically (PRNGKey(0) init -> BN calibration ->
    fp16-rounded params, see golden/make_goldens.py); the artifact holds the
    torch reference's logits computed from those exact parameter values."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "golden"))
    import make_goldens as G

    path = os.path.join(os.path.dirname(__file__), "golden", f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip("golden artifact missing")
    z = np.load(path)
    stride = int(z["stride"])
    bn_stats = {k[len("bn::"):]: z[k].astype(np.float32) for k in z.files
                if k.startswith("bn::")}

    model, params, x = G.build_ours(name, bn_stats=bn_stats or None)
    got = np.asarray(model(params, jnp.asarray(x)))

    sample = z["sample"].astype(np.float32)
    got_sample = got[:, ::stride, ::stride, :]
    assert got_sample.shape == sample.shape
    # tolerance: the recorded generation-time jax-vs-torch deviation plus
    # fp16 storage quantization, with 2x headroom for cross-version numerics
    tol = 2.0 * float(z["max_dev"]) + 2e-3 * float(z["ref_std"])
    np.testing.assert_allclose(got_sample, sample, atol=max(tol, 1e-2))
    np.testing.assert_allclose(got.mean(axis=(0, 1, 2)), z["cls_mean"],
                               atol=max(tol, 1e-2))
    np.testing.assert_allclose(got.std(axis=(0, 1, 2)), z["cls_std"],
                               atol=max(tol, 1e-2))
