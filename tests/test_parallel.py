"""SPMD consistency: sharded execution must match single-device execution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperseg_tpu.parallel import (make_mesh, make_mesh_for_batch,
                                   replicate_params, data_sharded)


@pytest.fixture(scope="module")
def small_model():
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    model = V1.hyperseg_efficientnet(
        "efficientnet-b0", levels=2, kernel_sizes=[1, 3],
        level_channels=[16, 16], expand_ratio=2, weight_groups=[8, 8],
        num_classes=5)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_mesh_for_batch_divisibility():
    assert make_mesh_for_batch(2).shape["data"] in (1, 2)
    assert make_mesh_for_batch(8).shape["data"] == 8
    assert make_mesh_for_batch(3).shape["data"] in (1, 3)


@pytest.mark.slow
def test_sharded_inference_matches_single_device(small_model):
    """Data+spatial sharded forward == unsharded forward (GSPMD inserts the
    halo exchanges for the patch decoder; results must be identical up to
    reduction-order noise)."""
    model, params = small_model
    x = jnp.asarray(np.random.RandomState(0).rand(8, 64, 128, 3), jnp.float32)

    f = jax.jit(lambda p, x: model(p, x))
    ref = np.asarray(f(params, x))

    mesh = make_mesh(n_data=4, n_spatial=2)
    ps = replicate_params(mesh, params)
    xs = jax.device_put(x, data_sharded(mesh, spatial_dim=1))
    out = np.asarray(f(ps, xs))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

    # pure data-parallel over 8 devices
    mesh8 = make_mesh(n_data=8)
    out8 = np.asarray(f(replicate_params(mesh8, params),
                        jax.device_put(x, data_sharded(mesh8))))
    np.testing.assert_allclose(out8, ref, atol=2e-5, rtol=1e-5)
