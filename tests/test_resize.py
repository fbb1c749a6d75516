"""Resize-op parity vs torch F.interpolate (the decoder/TTA upsample paths)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyperseg_tpu.nn import functional as F


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 24), (32, 48)),    # x2 upsample
    ((18, 24), (36, 48)),
    ((16, 24), (33, 50)),    # non-integer scale
    ((33, 50), (16, 24)),    # downsample
    ((64, 128), (512, 1024)),
])
def test_resize_bilinear_matches_torch(reference, torch, in_hw, out_hw):
    import torch.nn.functional as TF
    x = torch.randn(2, 5, *in_hw)
    ref = TF.interpolate(x, out_hw, mode="bilinear", align_corners=False).numpy()
    got = np.asarray(F.resize_bilinear(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), out_hw)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((9, 12), (18, 24)),     # UpsamplingNearest2d x2
    ((9, 12), (20, 30)),
    ((20, 30), (9, 12)),
])
def test_upsample_nearest_matches_torch(reference, torch, in_hw, out_hw):
    import torch.nn.functional as TF
    x = torch.randn(2, 3, *in_hw)
    ref = TF.interpolate(x, out_hw, mode="nearest").numpy()
    got = np.asarray(F.upsample_nearest(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), out_hw)).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(got, ref)


def test_image_coordinates_match_torch(reference, torch):
    from hyperseg.models.hyperseg_v0_1 import get_image_coordinates
    ref = get_image_coordinates(2, 7, 9, "cpu").numpy()
    got = np.asarray(F.image_coordinates(2, 7, 9)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-6)
