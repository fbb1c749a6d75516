"""Shape-bucketed predictor: arbitrary resolutions, one compile per bucket."""

import numpy as np
import jax
import jax.numpy as jnp

from hyperseg_tpu.core.predictor import Predictor, pad_to_multiple


def test_pad_to_multiple():
    x = np.zeros((1, 50, 70, 3), np.float32)
    p, (h, w) = pad_to_multiple(x, 32)
    assert p.shape == (1, 64, 96, 3) and (h, w) == (50, 70)
    p2, _ = pad_to_multiple(np.zeros((1, 64, 96, 3), np.float32), 32)
    assert p2.shape == (1, 64, 96, 3)


def test_predictor_arbitrary_resolutions():
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    model = V1.hyperseg_efficientnet(
        "efficientnet-b0", levels=2, kernel_sizes=[1, 3],
        level_channels=[16, 16], expand_ratio=2, weight_groups=[8, 8],
        num_classes=5)
    params = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, params, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    for shape in [(50, 70, 3), (64, 96, 3), (33, 129, 3)]:
        logits = pred(rng.rand(*shape).astype(np.float32))
        assert logits.shape == shape[:2] + (5,)
    # two of the three shapes share the (64, 96) bucket -> 2 compiles
    assert len(pred._cache) == 2
    # padded-bucket result must match a direct divisible-shape forward
    x = rng.rand(1, 64, 96, 3).astype(np.float32)
    direct = np.asarray(model(params, jnp.asarray(x)))
    np.testing.assert_allclose(pred(x), direct, atol=1e-5)
