"""divide_feature arithmetic parity vs the three reference variants."""

import numpy as np
import pytest

from hyperseg_tpu.models import signal_split as S

CASES = [
    (1280, [5248, 3008, 704, 2352, 4216], 32),   # Cityscapes HyperSeg-M
    (1280, [1000, 1000, 704, 2352, 4216], 32),   # equal-group case
    (1280, [5248], 32),
    (1536, [4000, 3000, 2000, 1000, 500, 250], 16),
    (640, [100, 100, 100, 100], 8),
    (1280, [123, 456, 789, 1011, 1213], 8),
    (1280, [9036], 4),
]


@pytest.mark.parametrize("in_f,out_f,mu", CASES)
def test_divide_feature_v1(reference, in_f, out_f, mu):
    from hyperseg.models.hyperseg_v1_0 import divide_feature as ref
    np.testing.assert_array_equal(S.divide_feature(in_f, out_f, mu), ref(in_f, out_f, mu))


@pytest.mark.parametrize("in_f,out_f,mu", CASES)
def test_divide_feature_v02(reference, in_f, out_f, mu):
    from hyperseg.models.hyperseg_v0_2 import divide_feature_legacy as ref
    np.testing.assert_array_equal(
        S.divide_feature_legacy_v02(in_f, out_f, mu), ref(in_f, out_f, mu))


@pytest.mark.parametrize("in_f,out_f,mu", CASES)
def test_divide_feature_v01(reference, in_f, out_f, mu):
    from hyperseg.models.hyperseg_v0_1 import divide_feature_legacy as ref
    np.testing.assert_array_equal(
        S.divide_feature_legacy_v01(in_f, out_f, mu), ref(in_f, out_f, mu))


def test_next_multiply():
    assert S.next_multiply(3676, 4) == 3676
    assert S.next_multiply(3677, 4) == 3680
    assert S.next_multiply(5248, 32) == 5248
