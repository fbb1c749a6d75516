"""Loss parity, metrics, and the SPMD train step on a virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyperseg_tpu.train import losses as L
from hyperseg_tpu.train import metrics as M
from hyperseg_tpu.train import schedule as S
from hyperseg_tpu.train import step as T


def test_bootstrapped_ce_parity(reference, torch):
    from hyperseg.losses.bootstrapped_ce_loss import BootstrappedCrossEntropyLoss
    b, c, h, w = 3, 19, 32, 64
    torch.manual_seed(0)
    logits = torch.randn(b, c, h, w)
    labels = torch.randint(0, c, (b, h, w))
    labels[0, :4] = 255  # some ignored pixels
    # k smaller than the pixel count so both branches are exercised
    for k, thresh in [(256, 0.3), (100, 5.0), (2047, 0.0)]:
        ref = BootstrappedCrossEntropyLoss(k=k, thresh=thresh, ignore_index=255)(
            logits, labels).item()
        for method in ("sort", "select"):
            got = L.bootstrapped_cross_entropy(
                jnp.asarray(logits.numpy().transpose(0, 2, 3, 1)),
                jnp.asarray(labels.numpy()), k=k, thresh=thresh,
                ignore_index=255, method=method)
            np.testing.assert_allclose(float(got), ref, rtol=2e-5)


def test_ce_class_major_matches_gather():
    """The class-major CE layout (one transpose, lane-dense passes — 40x on
    v5e at the b16 training shape) must match the NHWC gather formulation in
    value and gradient, with class weights and ignored pixels."""
    rng = np.random.RandomState(1)
    b, c, h, w = 2, 19, 16, 24
    logits = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    labels_np = rng.randint(0, c, (b, h, w))
    labels_np[1, 5:] = 255
    labels = jnp.asarray(labels_np, jnp.int32)
    wgt = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    try:
        for weight in (None, wgt):
            def f(x, cm):
                L.CE_CLASS_MAJOR = cm
                nll, valid = L.softmax_cross_entropy(
                    x, labels, ignore_index=255, weight=weight)
                return nll.sum() / jnp.maximum(valid.sum(), 1)
            v0, g0 = jax.value_and_grad(lambda x: f(x, False))(logits)
            v1, g1 = jax.value_and_grad(lambda x: f(x, True))(logits)
            np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                       atol=1e-7)
    finally:
        L.CE_CLASS_MAJOR = True


def test_bootstrapped_ce_select_matches_sort():
    """The sort-free formulation (bit-bisection k-th largest + masked
    reductions) must agree with the full-sort formulation in value AND
    gradient on both branches, including k >= n and tied losses."""
    rng = np.random.RandomState(0)
    b, c, h, w = 3, 7, 16, 24
    logits = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    labels_np = rng.randint(0, c, (b, h, w))
    labels_np[0, :4] = 255
    labels = jnp.asarray(labels_np, jnp.int32)
    # half-precision logits quantize losses -> genuine ties at the k-th value
    logits_tied = jnp.asarray(
        np.round(rng.randn(b, h, w, c), 1), jnp.float32)

    for lg, tied in ((logits, False), (logits_tied, True)):
        for k, thresh in [(64, 0.3), (50, 50.0), (383, 0.0), (10_000, 0.3)]:
            args = dict(k=k, thresh=thresh, ignore_index=255)
            f_sel = lambda x: L.bootstrapped_cross_entropy(
                x, labels, method="select", **args)
            f_srt = lambda x: L.bootstrapped_cross_entropy(
                x, labels, method="sort", **args)
            v_sel, g_sel = jax.value_and_grad(f_sel)(lg)
            v_srt, g_srt = jax.value_and_grad(f_srt)(lg)
            np.testing.assert_allclose(float(v_sel), float(v_srt), rtol=1e-6)
            if tied:
                # among tied pixels the sort assigns the residual top-k
                # weight to an arbitrary subset while select spreads it
                # evenly — values agree, per-pixel gradients legitimately
                # differ, and both remain finite
                assert bool(jnp.all(jnp.isfinite(g_sel)))
            else:
                np.testing.assert_allclose(np.asarray(g_sel),
                                           np.asarray(g_srt), atol=1e-7)


def test_kth_largest_exact():
    rng = np.random.RandomState(1)
    rows = np.abs(rng.randn(4, 257)).astype(np.float32)
    rows[1, :50] = rows[1, 50]  # ties
    rows[2, :] = 0.0            # all-equal row
    for kk in (1, 2, 50, 256, 257):
        want = np.sort(rows, axis=1)[:, ::-1][:, kk - 1]
        got = np.asarray(L._kth_largest(jnp.asarray(rows), kk))
        np.testing.assert_array_equal(got, want)


def test_plain_ce_parity(reference, torch):
    import torch.nn.functional as TF
    b, c, h, w = 2, 12, 16, 16
    torch.manual_seed(1)
    logits = torch.randn(b, c, h, w)
    labels = torch.randint(0, c, (b, h, w))
    labels[:, :3] = 255
    ref = TF.cross_entropy(logits, labels, ignore_index=255).item()
    got = L.cross_entropy_loss(
        jnp.asarray(logits.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(labels.numpy()), ignore_index=255)
    np.testing.assert_allclose(float(got), ref, rtol=2e-5)


def test_confusion_matrix_matmul_matches_bincount():
    """The MXU one-hot-matmul confmat must equal the scatter/bincount one
    exactly (integer counts), including ignore pixels and out-of-range
    labels."""
    rng = np.random.RandomState(3)
    labels = rng.randint(0, 21, (4, 33, 47)).astype(np.int32)
    labels[labels == 20] = 255
    preds = rng.randint(0, 19, (4, 33, 47)).astype(np.int32)
    a = M.confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 19,
                           method="matmul")
    b = M.confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 19,
                           method="bincount")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.dtype == b.dtype == jnp.int32
    # chunked scan path (pixel count not a multiple of chunk, padded tail
    # must contribute nothing)
    c = M.confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 19,
                           method="matmul", chunk=1000)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(b))


def test_confusion_matrix_matches_running_score(reference):
    import sys
    sys.modules.setdefault("tqdm", __import__("types").ModuleType("tqdm"))
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 19, (2, 32, 32))
    labels[0, 0] = 255
    preds = rng.randint(0, 19, (2, 32, 32))
    got = np.asarray(M.confusion_matrix(jnp.asarray(labels), jnp.asarray(preds), 19))
    # reference runningScore masks labels outside [0, n); 255 drops out
    mask = (labels >= 0) & (labels < 19)
    want = np.bincount(19 * labels[mask].astype(int) + preds[mask],
                       minlength=19 * 19).reshape(19, 19)
    np.testing.assert_array_equal(got, want)
    scores = M.scores_from_confmat(got)
    assert 0 <= scores["mean_iou"] <= 1


def test_poly_lr():
    sched = S.poly_lr(1e-3, 1000, power=0.9)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(1000)) == pytest.approx(0.0)
    assert float(sched(500)) == pytest.approx(1e-3 * 0.5 ** 0.9)


@pytest.mark.slow
def test_spmd_train_step_8dev():
    """Full HyperSeg-M train step, jitted over an 8-device (data x spatial)
    mesh on virtual CPU devices — gradient + BN-stat + metric reductions ride
    the mesh. This is the same path __graft_entry__.dryrun_multichip runs."""
    from hyperseg_tpu.parallel import make_mesh, replicate_params, data_sharded
    from hyperseg_tpu.models import hyperseg_v1_0 as V1

    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_spatial=2)

    model = V1.hyperseg_efficientnet(
        "efficientnet-b1", levels=2, out_feat_scale=[1.0, 0.25, 0.25, 0.25, 0.25],
        kernel_sizes=[1, 1, 1, 3, 3], level_channels=[64, 32, 16, 16, 16],
        expand_ratio=2, weight_groups=[32, 16, 8, 16, 4], num_classes=19)
    params = model.init(jax.random.PRNGKey(0))

    criterion = L.BootstrappedCrossEntropyLoss(k=64, thresh=0.3, ignore_index=255)
    optimizer = T.make_optimizer(S.poly_lr(1e-3, 100))
    train_step = T.make_train_step(model, criterion, optimizer, num_classes=19)

    state = T.init_train_state(replicate_params(mesh, params), optimizer)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(8, 64, 128, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 19, (8, 64, 128)), jnp.int32),
    }
    batch = {k: jax.device_put(v, data_sharded(mesh, spatial_dim=1 if k == "image" else None))
             for k, v in batch.items()}

    jitted = jax.jit(train_step)
    new_state, metrics = jitted(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state["step"]) == 1
    # parameters actually moved
    k = "decoder.level_0.0.0.signal2weights.weight"
    assert not np.allclose(np.asarray(new_state["params"][k]),
                           np.asarray(state["params"][k]))
    # BN running stats updated
    k = "backbone._bn0.running_mean"
    assert not np.allclose(np.asarray(new_state["params"][k]),
                           np.asarray(state["params"][k]))


def test_weighted_ce_parity(reference, torch):
    import torch.nn.functional as TF
    b, c, h, w = 2, 5, 8, 8
    torch.manual_seed(5)
    logits = torch.randn(b, c, h, w)
    labels = torch.randint(0, c, (b, h, w))
    labels[:, 0] = 255
    weight = torch.rand(c) + 0.5
    ref = TF.cross_entropy(logits, labels, weight=weight, ignore_index=255).item()
    got = L.cross_entropy_loss(
        jnp.asarray(logits.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(labels.numpy()), ignore_index=255,
        weight=jnp.asarray(weight.numpy()))
    np.testing.assert_allclose(float(got), ref, rtol=2e-5)


def test_per_image_jaccard_matches_reference():
    """Reference formula transcribed from test.py:210-227 (importing
    hyperseg.test pulls torchvision, absent here): confusion matrix over valid
    targets, union of the ignore class zeroed, mean IoU over non-empty unions
    with a 1e-6 eps."""
    rng = np.random.RandomState(0)
    num_classes, ignore = 6, 0
    target = rng.randint(0, num_classes, (16, 16))
    pred = rng.randint(0, num_classes, (16, 16))

    mask = (target >= 0) & (target < num_classes) & (target != ignore)
    inds = num_classes * target[mask] + pred[mask]
    cm = np.bincount(inds, minlength=num_classes ** 2).reshape(num_classes,
                                                               num_classes)
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(1) + cm.sum(0) - inter
    union[ignore] = 0
    score = inter / (union + 1e-6)
    ref = score[union > 0].mean()

    got = M.per_image_jaccard(target, pred, num_classes, ignore_index=ignore)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_per_image_jaccard_void_pixels_excluded():
    """Predictions at void (255) label pixels must not enter any class union
    (reference calc_conf_mat masks target>=num_classes, test.py:211); an
    all-void image scores 0 without blowing up."""
    num_classes = 3
    target = np.full((8, 8), 255, np.int64)
    target[0, :4] = 1
    pred = np.full((8, 8), 2, np.int64)  # wrong everywhere, incl. void pixels
    pred[0, :4] = 1                      # right on the 4 valid pixels
    # only the 4 valid pixels count: class 1 IoU = 1.0; class 2 union
    # would be 60 if void pixels leaked in -> score would drop to 0.5
    got = M.per_image_jaccard(target, pred, num_classes, ignore_index=0)
    np.testing.assert_allclose(got, 1.0, rtol=1e-5)
    assert M.per_image_jaccard(np.full((4, 4), 255), np.zeros((4, 4), int),
                               num_classes, ignore_index=0) == 0.0
