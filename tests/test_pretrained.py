"""ImageNet-pretrained backbone bootstrapping (backbones/pretrained.py).

Covers the reference's from_pretrained/load_fc=False semantics
(reference efficientnet.py:416-447, efficientnet_utils.py:643-674) against a
real lukemelas-format state_dict generated from the torch reference in-test,
plus the fail-loud contract when pretrained weights are unobtainable.
"""

import os

import numpy as np
import jax
import pytest


@pytest.fixture()
def no_network(monkeypatch):
    """Disable the best-effort download so resolution is deterministic."""
    import hyperseg_tpu.utils.download as dl
    monkeypatch.setattr(dl, "download_url", lambda *a, **k: False)


@pytest.fixture()
def isolated_dirs(tmp_path, monkeypatch, no_network):
    """Point every pretrained search dir at empty temp locations."""
    from hyperseg_tpu.models.backbones import pretrained as P
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv(P.ENV_DIR, str(cache))
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.chdir(tmp_path)
    return cache


def _save_lukemelas_b0(torch, path):
    """A real classification-head EfficientNet-b0 state_dict — exactly the
    key set of the lukemelas release files (incl. _fc.*)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from hyperseg.models.backbones.efficientnet import EfficientNet as TorchEff
    m = TorchEff.from_name("efficientnet-b0")
    torch.save(m.state_dict(), str(path))
    return m.state_dict()


def test_fail_loud_when_unavailable(isolated_dirs):
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    with pytest.raises(RuntimeError, match="pretrained=True"):
        V1.hyperseg_efficientnet(
            "efficientnet-b0", pretrained=True, levels=2,
            kernel_sizes=[1, 1, 1, 3, 3], level_channels=[8, 8, 8, 8, 8],
            expand_ratio=2, weight_groups=[4, 4, 4, 4, 4], num_classes=3)


def test_explicit_missing_path_raises(no_network):
    from hyperseg_tpu.models.backbones.pretrained import resolve_pretrained
    with pytest.raises(RuntimeError, match="does not exist"):
        resolve_pretrained("efficientnet-b0", "/nonexistent/b0.pth")


def test_lukemelas_load_fc_false(isolated_dirs, torch):
    """pretrained=True finds the cached lukemelas file, loads every backbone
    tensor, drops _fc.*, and leaves decoder params at random init."""
    sd = _save_lukemelas_b0(torch, isolated_dirs / "efficientnet-b0-test.pth")

    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    model = V1.hyperseg_efficientnet(
        "efficientnet-b0", pretrained=True, levels=2,
        kernel_sizes=[1, 1, 1, 3, 3], level_channels=[8, 8, 8, 8, 8],
        expand_ratio=2, weight_groups=[4, 4, 4, 4, 4], num_classes=3)
    params = model.init(jax.random.PRNGKey(0))

    # every non-fc, non-counter torch tensor landed under backbone.*
    stem = np.asarray(params["backbone._conv_stem.weight"])
    want = sd["_conv_stem.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(stem, want, rtol=0, atol=0)
    bn = np.asarray(params["backbone._blocks.3._bn1.running_mean"])
    np.testing.assert_allclose(bn, sd["_blocks.3._bn1.running_mean"].numpy())
    # load_fc=False: the classifier head is dropped
    assert not any(k.startswith("backbone._fc.") for k in params)
    # feature compressors are NOT in the ImageNet file -> stay random (std>0)
    fcs = [k for k in params if "_feat_fc_" in k and k.endswith("0.weight")]
    assert fcs and all(float(np.asarray(params[k]).std()) > 0 for k in fcs)


def test_wrong_architecture_raises(isolated_dirs, torch):
    """A b0 checkpoint staged into a b1 model must be rejected, not
    silently partial-loaded."""
    _save_lukemelas_b0(torch, isolated_dirs / "efficientnet-b1-wrong.pth")
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    model = V1.hyperseg_efficientnet(
        "efficientnet-b1", pretrained=True, levels=2,
        kernel_sizes=[1, 1, 1, 3, 3], level_channels=[8, 8, 8, 8, 8],
        expand_ratio=2, weight_groups=[4, 4, 4, 4, 4], num_classes=3)
    with pytest.raises(RuntimeError, match="does not match"):
        model.init(jax.random.PRNGKey(0))


def test_checkpoint_rebuild_skips_pretrained(isolated_dirs, tmp_path):
    """load_model on an arch string with pretrained=True must not try to
    fetch ImageNet weights (the checkpoint supersedes them)."""
    import jax.numpy as jnp
    from hyperseg_tpu.core import checkpoint as C

    arch = ("hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet("
            "'efficientnet-b0',pretrained=True,levels=2,"
            "kernel_sizes=[1,1,1,3,3],level_channels=[8,8,8,8,8],"
            "expand_ratio=2,weight_groups=[4,4,4,4,4],num_classes=3)")
    from hyperseg_tpu.core import registry
    spec = registry.parse_spec(arch).with_overrides(pretrained=False)
    params = spec.build().init(jax.random.PRNGKey(0))
    path = str(tmp_path / "model_latest.npz")
    C.save_checkpoint(str(tmp_path), "model", C.jnp_to_np(params),
                      meta={"arch": arch, "epoch": 1, "best_iou": 0.5})
    model, loaded, meta = C.load_model(path)  # must not raise
    assert set(loaded) == set(params)
