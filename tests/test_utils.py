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


def test_generic_scope_profiler():
    """flops_by_scope: jaxpr-walk FLOPs grouped by named_scope with depth
    clipping — the hook-registry profiler analogue (reference
    utils/profile.py:9-127). Verifies scope structure on the real model,
    dot/conv rules against hand counts, and params_by_scope totals."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hyperseg_tpu.core import registry
    from hyperseg_tpu.utils import profile as P

    # rule sanity on a hand-countable function
    def f(x, w):
        with jax.named_scope("mm"):
            y = x @ w                     # (4,8)@(8,16): 2*4*16*8 = 1024
        return jax.nn.relu(y)

    rows = P.flops_by_scope(f, jnp.ones((4, 8)), jnp.ones((8, 16)))
    by = {s: fl for s, fl, _i, _o in rows}
    assert by["mm"] == 2 * 4 * 16 * 8

    arch = ("hyperseg_tpu.models.hyperseg_v1_0.hyperseg_efficientnet("
            "'efficientnet-b0', levels=2, kernel_sizes=[1, 3], "
            "level_channels=[16, 16], expand_ratio=2, weight_groups=[8, 8])")
    model = registry.build(arch, num_classes=12)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)

    rows = P.flops_by_scope(lambda p, xx: model(p, xx), params, x, max_depth=2)
    scopes = [s for s, *_ in rows]
    assert "backbone/stem" in scopes and "weight_mapper" in scopes
    assert "decoder/level_0" in scopes and "decoder/final_resize" in scopes
    assert sum(1 for s in scopes if s.startswith("backbone/_blocks.")) == 16

    # depth clipping aggregates exactly
    rows1 = P.flops_by_scope(lambda p, xx: model(p, xx), params, x, max_depth=1)
    total2 = sum(fl for _s, fl, _i, _o in rows)
    total1 = sum(fl for _s, fl, _i, _o in rows1)
    assert total1 == total2
    bb1 = {s: fl for s, fl, _i, _o in rows1}["backbone"]
    bb2 = sum(fl for s, fl, _i, _o in rows if s.split("/")[0] == "backbone")
    assert bb1 == bb2
    assert bb1 > total1 * 0.3  # the backbone is a real share of the model

    # params_by_scope partitions the flat dict exactly
    pbs = P.params_by_scope(params, max_depth=1)
    assert sum(pbs.values()) == P.count_params(params)[0]

    # per-row Params: longest-prefix scope assignment, no double counting
    counts = P.assign_params_to_scopes(params, [r[0] for r in rows])
    assert sum(counts.values()) == P.count_params(params)[0]
    blk0 = counts.get("backbone/_blocks.0", 0)
    assert blk0 == sum(int(np.prod(v.shape)) for k, v in params.items()
                       if k.startswith("backbone._blocks.0."))
    assert blk0 > 0

    # table printing doesn't crash, includes the total, and the block row
    # shows its real param count (regression: the old scope->key translation
    # never matched, printing Params=0 everywhere)
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        P.print_scope_table(rows, params)
    out = buf.getvalue()
    assert "TOTAL" in out and f"{blk0:,}" in out


def test_progress_meter_and_scalar_tags(tmp_path, capsys):
    """ProgressMeter (tqdm-parity, reference train.py:97) prints a rate line
    on description changes for non-TTY streams; log_scalars_val/avg write
    meters under main_tag/<category>/<key> (the reference add_scalars
    semantics) with optional category filtering."""
    import io
    from hyperseg_tpu.utils.logging import ProgressMeter

    buf = io.StringIO()
    pm = ProgressMeter(10, stream=buf)
    for _ in range(10):
        pm.update()
    pm.set_description("TRAINING: Epoch: 1 / 2; losses: [total: 0.5000 (0.5000); ]")
    pm.close()
    out = buf.getvalue()
    assert "10/10" in out and "TRAINING" in out and "batches/s" in out

    lg = TensorBoardLogger(str(tmp_path))  # no tensorboardX -> jsonl backend
    lg.reset(prefix="TRAINING: Epoch: 1 / 1;")
    lg.update("losses", total=1.0)
    lg.update("bench", iou=0.25)
    lg.log_scalars_val("batch", 16)
    lg.log_scalars_avg("epoch/train", 0, category="losses")
    s = str(lg)
    assert "losses: [total: 1.0000 (1.0000); ]" in s
    assert "bench: [iou: 0.2500 (0.2500); ]" in s
    if lg._jsonl is not None:
        lg._jsonl.flush()
        import json as J
        lines = [J.loads(x) for x in
                 open(tmp_path / "metrics.jsonl").read().splitlines()]
        batch_rec = next(r for r in lines if r["suffix"] == "val")
        assert "batch/losses/total" in batch_rec and "batch/bench/iou" in batch_rec
        epoch_rec = next(r for r in lines if r["suffix"] == "avg")
        assert "epoch/train/losses/total" in epoch_rec
        assert not any("bench" in k for k in epoch_rec)  # category filter
