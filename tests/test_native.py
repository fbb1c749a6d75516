"""Native host-op kernels vs their numpy references."""

import numpy as np
from hyperseg_tpu import native


def test_native_builds():
    assert native.available(), "C++ host ops failed to build/load"


def test_rgb_label_to_index():
    from hyperseg_tpu.data.camvid import CLASS_COLOR
    rng = np.random.RandomState(0)
    colors = np.asarray(CLASS_COLOR, np.uint8)
    idx = rng.randint(0, len(colors), (64, 96))
    rgb = colors[idx]
    rgb[0, 0] = (9, 9, 9)  # unknown color
    got = native.rgb_label_to_index(rgb, colors, fill=255)
    want = np.full(rgb.shape[:2], 255, np.uint8)
    for i, c in enumerate(colors):
        want[np.all(rgb == c, axis=2)] = i
    np.testing.assert_array_equal(got, want)


def test_map_labels():
    from hyperseg_tpu.data.cityscapes import ID_TO_TRAIN_ID
    rng = np.random.RandomState(1)
    labels = rng.randint(0, 34, (50, 70)).astype(np.uint8)
    got = native.map_labels(labels, ID_TO_TRAIN_ID, fill=0)
    np.testing.assert_array_equal(got, ID_TO_TRAIN_ID[labels])


def test_normalize_u8():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (32, 48, 3), np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = native.normalize_u8(img, mean, std)
    want = ((img.astype(np.float32) / 255.0) - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-6)
