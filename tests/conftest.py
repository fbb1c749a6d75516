import os
import sys

# Force an 8-device CPU mesh for all tests: multi-chip sharding is validated on
# virtual devices (the real environment has a single TPU chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize registers a TPU backend and pins
# jax_platforms; force CPU for the test suite regardless.
jax.config.update("jax_platforms", "cpu")

import types

import pytest


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full-model SPMD compiles)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference():
    """Import the PyTorch reference implementation as a numerical oracle.

    Tests using this fixture skip when the reference checkout is unavailable
    (the framework itself never depends on it).
    """
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "hyperseg")):
        pytest.skip("reference checkout not available")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    # hyperseg.utils.utils imports ffmpeg at module import time; stub it out.
    for mod in ("ffmpeg",):
        if mod not in sys.modules:
            sys.modules[mod] = types.ModuleType(mod)
    import hyperseg  # noqa: F401
    return sys.modules["hyperseg"]


@pytest.fixture(scope="session")
def torch(reference):
    import torch
    torch.manual_seed(0)
    return torch


@pytest.fixture(scope="session")
def calibrate(torch):
    """Make a freshly-initialized reference model numerically non-degenerate.

    At default init every conv shrinks activation variance by ~3x and eval-mode
    BN (running stats 0/1) never rescales, so deep outputs underflow toward 0
    and logits comparisons would be vacuous. One train-mode pass with BN
    momentum=1 writes real batch statistics into the running buffers; in eval
    mode every BN then rescales its input to O(1).
    """

    def _cal(model, x):
        for m in model.modules():
            if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                m.momentum = 1.0
            # zero all stochasticity so the recorded stats exactly match the
            # eval-mode distribution (otherwise decoder BNs de-calibrate and
            # activations explode)
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
            if hasattr(m, "_global_params") and hasattr(m._global_params, "drop_connect_rate"):
                m._global_params = m._global_params._replace(drop_connect_rate=0)
        model.train()
        with torch.no_grad():
            model(x)
        model.eval()
        return model

    return _cal
