"""Utility substrate coverage: misc helpers, batch runner, logging meters."""

import os

import numpy as np
import pytest

from hyperseg_tpu.utils import misc
from hyperseg_tpu.utils.logging import AverageMeter, TensorBoardLogger
from hyperseg_tpu.utils import batch as batch_runner
from hyperseg_tpu.utils import img_utils


def test_str2int():
    assert misc.str2int("4K") == 4000
    assert misc.str2int("2m") == 2_000_000
    assert misc.str2int(7) == 7
    assert misc.str2int("123") == 123


def test_exp_decaying_hyper_parameter():
    p = misc.ExpDecayingHyperParameter(1.0, 0.0, half_life=10)
    assert p() == pytest.approx(1.0)
    p.update(10)
    assert p() == pytest.approx(0.5)
    p.load_state_dict({"step": 20})
    assert p() == pytest.approx(0.25)


def test_random_pair():
    a, b = misc.random_pair(10, min_dist=3)
    assert abs(a - b) >= 3
    lo, hi = misc.random_pair_range(2, 9, min_dist=2)
    assert 2 <= lo < hi <= 9 and hi - lo >= 2


def test_average_meter_and_logger(tmp_path):
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == pytest.approx(2.0) and m.val == 3.0

    lg = TensorBoardLogger(str(tmp_path))
    lg.reset(prefix="ep 1;")
    lg.update("losses", total=0.5)
    lg.update("losses", total=1.5)
    lg.log_scalars_val("losses", 0)
    lg.log_scalars_avg("losses", 0)
    assert "total" in str(lg)


def test_batch_runner(tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text("x")
    seen = []
    ok, fail = batch_runner.main([str(tmp_path / "*.txt")],
                                 func=lambda p: seen.append(p))
    assert ok == 3 and fail == 0 and len(seen) == 3

    def boom(p):
        raise ValueError(p)

    ok, fail = batch_runner.main([str(tmp_path / "*.txt")], func=boom)
    assert ok == 0 and fail == 3  # failures logged, sweep continues


def test_parse_paths_listfile(tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text("a.png\nb.png\n")
    assert batch_runner.parse_paths(str(lst)) == ["a.png", "b.png"]


def test_blend_and_grid():
    img = np.zeros((8, 10, 3), np.float32)
    seg = np.zeros((8, 10), np.int32)
    seg[:4] = 1
    seg[0, 0] = 255  # ignored pixel stays untouched
    out = img_utils.blend_seg(img, seg, [(255, 0, 0), (0, 255, 0)], alpha=1.0)
    assert out[1, 0, 1] == pytest.approx(1.0)   # class-1 green
    assert out[0, 0].sum() == 0                  # ignored
    grid = img_utils.make_grid(out, out)
    assert grid.shape[1] > 2 * 10


def test_create_pyramid():
    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32)
    pyd = img_utils.create_pyramid(x, 3)
    assert [p.shape[1] for p in pyd] == [16, 8, 4]
