"""Full-model TRAIN-step parity vs the torch reference (VERDICT r3 item 4).

Eval-mode logits parity is covered per family in test_hyperseg_*.py; this
file checks that one full training step — forward in train mode (batch-stat
BN, incl. the patch-space bn1 halo multiset, hyperseg_v1_0.py:352-366),
bootstrapped-CE loss, backward, Adam(beta1=0.5) update, and the BN
running-stat writes — produces the same numbers as the reference's hot loop
(train.py:118-132) from identical weights and batch. Stochasticity
(drop_connect, efficientnet_utils.py:128-153; out_fc dropout) is disabled on
both sides for determinism.
"""

import copy

import numpy as np
import jax
import jax.numpy as jnp

from hyperseg_tpu.core.torch_import import convert_state_dict
from hyperseg_tpu.models import hyperseg_v1_0 as M
from hyperseg_tpu.train import losses as L
from hyperseg_tpu.train import schedule as S
from hyperseg_tpu.train import step as T

KW = dict(levels=2, kernel_sizes=[1, 3], level_channels=[16, 16],
          expand_ratio=2, weight_groups=[8, 8], num_classes=6)
LR = 1e-3


def _make_batch(seed=3, num_classes=None, res=(128, 256)):
    gen = np.random.RandomState(seed)
    nc = KW["num_classes"] if num_classes is None else num_classes
    img = gen.rand(2, *res, 3).astype(np.float32) * 2 - 1
    lbl = gen.randint(0, nc, (2, *res)).astype(np.int32)
    lbl[0, :16] = 255  # exercise ignore_index in loss + metrics
    return img, lbl


def _zero_stochasticity(torch, tm):
    """Zero drop_connect + dropout for determinism (our side mirrors); BN
    keeps its default momentum 0.1."""
    for m in tm.modules():
        if hasattr(m, "_global_params") and hasattr(m._global_params,
                                                    "drop_connect_rate"):
            m._global_params = m._global_params._replace(drop_connect_rate=0)
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def _torch_reference_steps(reference, torch, tm, batches, *,
                           poly_steps=None):
    """Run N reference train steps (the train.py:118-136 hot loop, incl. the
    per-batch PolyLR step when poly_steps is set); return everything needed
    for comparison."""
    from hyperseg.losses.bootstrapped_ce_loss import BootstrappedCrossEntropyLoss

    _zero_stochasticity(torch, tm)
    tm.train()
    sd0 = copy.deepcopy(tm.state_dict())

    opt = torch.optim.Adam(tm.parameters(), lr=LR, betas=(0.5, 0.999))
    sched = None
    if poly_steps is not None:
        from hyperseg.utils.polylr import PolyLR
        sched = PolyLR(opt, poly_steps)
    crit = BootstrappedCrossEntropyLoss(ignore_index=255)
    losses, grads = [], None
    for img, lbl in batches:
        x = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
        t = torch.from_numpy(lbl.astype(np.int64))
        pred = tm(x)
        loss = crit(pred, t)
        opt.zero_grad()
        loss.backward()
        if grads is None:  # first-step gradients, pre-update
            grads = {k: p.grad.detach().clone()
                     for k, p in tm.named_parameters() if p.grad is not None}
        opt.step()
        if sched is not None:
            sched.step()  # batch_scheduler=True (train.py:135-136)
        losses.append(float(loss.item()))
    sd1 = copy.deepcopy(tm.state_dict())
    return sd0, losses, grads, sd1


def _torch_reference_step(reference, torch):
    """Run ONE reference train step; return everything needed for comparison."""
    from hyperseg.models.hyperseg_v1_0 import hyperseg_efficientnet

    torch.manual_seed(11)
    tm = hyperseg_efficientnet("efficientnet-b0", pretrained=False,
                               **copy.deepcopy(KW))
    sd0, losses, grads, sd1 = _torch_reference_steps(
        reference, torch, tm, [_make_batch()])
    return sd0, losses[0], grads, sd1


def test_train_step_parity_full_model(reference, torch):
    sd0, ref_loss, ref_grads_t, sd1 = _torch_reference_step(reference, torch)

    jm = M.hyperseg_efficientnet("efficientnet-b0", **copy.deepcopy(KW))
    jm.backbone.drop_connect_rate = 0.0  # match the torch side
    # the reference applies the head dropout to the conv_head FEATURE output
    # too (extract_features_list, efficientnet.py:358) — zeroed on the torch
    # side above, so zero ours as well
    jm.backbone.dropout_rate = 0.0
    params = convert_state_dict(sd0)
    img, lbl = _make_batch()
    batch = {"image": jnp.asarray(img), "label": jnp.asarray(lbl)}

    criterion = L.BootstrappedCrossEntropyLoss(ignore_index=255)
    optimizer = T.make_optimizer(S.poly_lr(LR, 100))
    train_step = T.make_train_step(jm, criterion, optimizer,
                                   num_classes=KW["num_classes"])
    state = T.init_train_state(params, optimizer)
    new_state, metrics = jax.jit(train_step)(state, batch,
                                             jax.random.PRNGKey(0))

    # --- loss ---
    got_loss = float(metrics["loss"])
    assert ref_loss > 0.1, "degenerate reference loss; parity test vacuous"
    np.testing.assert_allclose(got_loss, ref_loss, rtol=2e-4)

    # --- gradients (decoder s2w / weight mapper / backbone stem) ---
    trainable, frozen = T.split_params(params)

    def loss_fn(tr):
        logits, _ = jm.apply_train({**tr, **frozen}, batch["image"],
                                   jax.random.PRNGKey(0))
        return criterion(logits, batch["label"])

    grads = jax.grad(loss_fn)(trainable)
    ref_grads = convert_state_dict(ref_grads_t)  # same layout mapping as params

    sel = [k for k in ref_grads
           if k.endswith("signal2weights.weight")
           or k == "backbone._conv_stem.weight"
           or (k.startswith("weight_mapper.") and k.endswith(".weight")
               and ref_grads[k].ndim == 4)]
    assert any("signal2weights" in k for k in sel)
    assert "backbone._conv_stem.weight" in sel
    assert any(k.startswith("weight_mapper.") for k in sel)
    for k in sel:
        g_ref = np.asarray(ref_grads[k])
        g_got = np.asarray(grads[k])
        scale = max(np.abs(g_ref).max(), 1e-8)
        np.testing.assert_allclose(
            g_got, g_ref, atol=5e-4 * scale, rtol=1e-3,
            err_msg=f"gradient mismatch for {k} (ref |g|max={scale:.3e})")

    # --- post-step parameters (covers the Adam update rule + lr) ---
    sd1_params = convert_state_dict(sd1)
    sd0_params = convert_state_dict(sd0)
    for k in sel:
        upd_ref = np.asarray(sd1_params[k]) - np.asarray(sd0_params[k])
        upd_got = np.asarray(new_state["params"][k]) - np.asarray(params[k])
        # near-zero grads make the first Adam step g/(|g|+eps) ill-conditioned;
        # compare where the reference gradient is meaningfully nonzero
        mask = np.abs(np.asarray(ref_grads[k])) > 1e-6
        assert mask.mean() > 0.5, f"too few comparable elements for {k}"
        np.testing.assert_allclose(
            upd_got[mask], upd_ref[mask], atol=LR * 2e-2,
            err_msg=f"Adam update mismatch for {k}")

    # --- post-step BN running stats (train-mode stat writes, incl. the
    # patch-space decoder BNs, quirk #6) ---
    bn_keys = [k for k in sd1_params
               if k.endswith((".running_mean", ".running_var"))
               and (k.startswith("backbone._bn0")
                    or ".bn1." in k or ".bn2." in k or ".bn3." in k
                    or k.startswith("weight_mapper."))]
    assert any(".bn1." in k for k in bn_keys), "no decoder patch-space BN found"
    changed = 0
    for k in bn_keys:
        want = np.asarray(sd1_params[k])
        got = np.asarray(new_state["params"][k])
        base = np.asarray(sd0_params[k])
        if not np.allclose(want, base):
            changed += 1
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(
            got, want, atol=1e-4 * scale, rtol=1e-3,
            err_msg=f"BN running-stat mismatch for {k}")
    assert changed > 4, "BN stats barely moved; stat-write comparison vacuous"


def test_train_three_steps_parity(reference, torch):
    """Three consecutive steps of the reference hot loop (train.py:118-136),
    per-batch PolyLR included: catches optimizer-state (Adam m/v), BN-momentum,
    and schedule drift that a single-step comparison cannot see."""
    from hyperseg.models.hyperseg_v1_0 import hyperseg_efficientnet

    torch.manual_seed(11)
    tm = hyperseg_efficientnet("efficientnet-b0", pretrained=False,
                               **copy.deepcopy(KW))
    batches = [_make_batch(seed=3 + i) for i in range(3)]
    sd0, ref_losses, _, sd1 = _torch_reference_steps(
        reference, torch, tm, batches, poly_steps=100)

    jm = M.hyperseg_efficientnet("efficientnet-b0", **copy.deepcopy(KW))
    jm.backbone.drop_connect_rate = 0.0
    jm.backbone.dropout_rate = 0.0
    params = convert_state_dict(sd0)

    criterion = L.BootstrappedCrossEntropyLoss(ignore_index=255)
    optimizer = T.make_optimizer(S.poly_lr(LR, 100))
    train_step = jax.jit(T.make_train_step(jm, criterion, optimizer,
                                           num_classes=KW["num_classes"]))
    state = T.init_train_state(params, optimizer)
    got_losses = []
    for i, (img, lbl) in enumerate(batches):
        batch = {"image": jnp.asarray(img), "label": jnp.asarray(lbl)}
        state, metrics = train_step(state, batch, jax.random.PRNGKey(i))
        got_losses.append(float(metrics["loss"]))

    # per-step losses: step 0 is the single-step bound; later steps see the
    # compounded drift of two Adam updates + BN stat writes
    assert ref_losses[0] > 0.1
    np.testing.assert_allclose(got_losses[0], ref_losses[0], rtol=2e-4)
    np.testing.assert_allclose(got_losses[1], ref_losses[1], rtol=1e-3)
    np.testing.assert_allclose(got_losses[2], ref_losses[2], rtol=3e-3)

    # final parameters after 3 updates (covers Adam m/v accumulation and the
    # PolyLR decay: steps 1/2 used lr*(0.99)^0.9, lr*(0.98)^0.9). Early Adam
    # amplifies fp noise elementwise — with v ~ g^2 the per-element update is
    # ~±lr regardless of |g|, so tiny gradient deltas flip near-zero
    # elements; measured drift on CPU f32: cos 0.991-0.997, relL2 0.08-0.13.
    # A systematic bug looks different: wrong lr/schedule scales the NORM
    # (ratio far from 1), wrong beta/eps rotates the DIRECTION (cos << 1).
    sd1_params = convert_state_dict(sd1)
    sd0_params = convert_state_dict(sd0)
    sel = [k for k in sd1_params
           if k.endswith("signal2weights.weight")
           or k == "backbone._conv_stem.weight"]
    assert len(sel) >= 2
    for k in sel:
        upd_ref = (np.asarray(sd1_params[k])
                   - np.asarray(sd0_params[k])).ravel()
        upd_got = (np.asarray(state["params"][k])
                   - np.asarray(params[k])).ravel()
        nr, ng = np.linalg.norm(upd_ref), np.linalg.norm(upd_got)
        cos = float(upd_ref @ upd_got / (nr * ng + 1e-12))
        rel = float(np.linalg.norm(upd_got - upd_ref) / (nr + 1e-12))
        assert cos > 0.97, f"3-step update direction drift for {k}: cos={cos}"
        assert abs(ng / nr - 1.0) < 0.05, \
            f"3-step update magnitude drift for {k}: |got|/|ref|={ng / nr}"
        assert rel < 0.3, f"3-step update relL2 too high for {k}: {rel}"

    # final BN running stats after 3 momentum-0.1 writes
    bn_keys = [k for k in sd1_params
               if k.endswith((".running_mean", ".running_var"))
               and (".bn1." in k or ".bn2." in k or ".bn3." in k)]
    assert bn_keys
    for k in bn_keys:
        want = np.asarray(sd1_params[k])
        got = np.asarray(state["params"][k])
        scale = max(np.abs(want).max(), 1.0)
        # steps 2/3 write batch stats of activations computed from params
        # that already drifted ~10% in update-relL2 (see above) — the stats
        # inherit that drift (measured on CPU f32: up to 1.2% rel on isolated
        # decoder running_var elements); a momentum-machinery bug (wrong
        # momentum, swapped mean/var, missing write) moves the stat by ~10%
        # of itself or more, well above this tolerance
        np.testing.assert_allclose(
            got, want, atol=2.5e-2 * scale, rtol=2.5e-2,
            err_msg=f"3-step BN running-stat mismatch for {k}")


V0_KW = dict(levels=2, kernel_sizes=(1, 1, 3, 3, 3, 3), expand_ratio=2,
             with_out_fc=False, decoder_dropout=None, weight_groups=16,
             num_classes=21)


def test_train_step_parity_v0_1(reference, torch):
    """One train step of the v0_1 family (VOC HyperSeg-L lineage): its
    decoder BNs run on the FULL map between the three MetaPatch convs
    (hyperseg_v0_1.py:205-237), unlike v1_0's patch-space bn1/bn2/bn3 — so
    train-mode batch stats, their running-stat writes, and the backward
    through the fullmap forms are a distinct code path from
    test_train_step_parity_full_model."""
    from hyperseg.models.hyperseg_v0_1 import hyperseg_efficientnet

    torch.manual_seed(11)
    tm = hyperseg_efficientnet("efficientnet-b0", pretrained=False,
                               **copy.deepcopy(V0_KW))
    img, lbl = _make_batch(seed=5, num_classes=V0_KW["num_classes"],
                           res=(128, 128))
    sd0, ref_losses, ref_grads_t, sd1 = _torch_reference_steps(
        reference, torch, tm, [(img, lbl)])
    ref_loss = ref_losses[0]

    from hyperseg_tpu.models import hyperseg_v0_1 as M01
    jm = M01.hyperseg_efficientnet("efficientnet-b0", **copy.deepcopy(V0_KW))
    jm.backbone.drop_connect_rate = 0.0
    jm.backbone.dropout_rate = 0.0
    params = convert_state_dict(sd0)
    batch = {"image": jnp.asarray(img), "label": jnp.asarray(lbl)}

    criterion = L.BootstrappedCrossEntropyLoss(ignore_index=255)
    optimizer = T.make_optimizer(S.poly_lr(LR, 100))
    train_step = T.make_train_step(jm, criterion, optimizer,
                                   num_classes=V0_KW["num_classes"])
    state = T.init_train_state(params, optimizer)
    new_state, metrics = jax.jit(train_step)(state, batch,
                                             jax.random.PRNGKey(0))

    got_loss = float(metrics["loss"])
    assert ref_loss > 0.1, "degenerate reference loss; parity test vacuous"
    np.testing.assert_allclose(got_loss, ref_loss, rtol=5e-4)

    # gradients: the weight-generating mapper convs (incl. the Conv2dMulti
    # multi-head out_conv) and the backbone stem
    ref_grads = convert_state_dict(ref_grads_t)
    trainable, frozen = T.split_params(params)

    def loss_fn(tr):
        logits, _ = jm.apply_train({**tr, **frozen}, batch["image"],
                                   jax.random.PRNGKey(0))
        if logits.shape[1:3] != lbl.shape[1:3]:
            from hyperseg_tpu.nn import functional as F
            logits = F.resize_bilinear(logits, lbl.shape[1:3])
        return criterion(logits, batch["label"])

    grads = jax.grad(loss_fn)(trainable)
    sel = [k for k in ref_grads
           if (k.startswith("weight_mapper.") and ref_grads[k].ndim == 4
               and k.endswith(".weight"))
           or k == "backbone._conv_stem.weight"]
    assert any("out_conv" in k for k in sel), "Conv2dMulti grads not covered"
    assert "backbone._conv_stem.weight" in sel
    for k in sel:
        g_ref = np.asarray(ref_grads[k])
        g_got = np.asarray(grads[k])
        scale = max(np.abs(g_ref).max(), 1e-8)
        np.testing.assert_allclose(
            g_got, g_ref, atol=2e-3 * scale, rtol=2e-3,
            err_msg=f"v0_1 gradient mismatch for {k} (ref |g|max={scale:.3e})")

    # post-step BN running stats — the v0_1 full-map BN semantics under test
    sd1_params = convert_state_dict(sd1)
    sd0_params = convert_state_dict(sd0)
    bn_keys = [k for k in sd1_params
               if k.endswith((".running_mean", ".running_var"))
               and k.startswith("decoder.")]
    assert bn_keys, "no decoder full-map BN stats found"
    changed = 0
    for k in bn_keys:
        want = np.asarray(sd1_params[k])
        got = np.asarray(new_state["params"][k])
        if not np.allclose(want, np.asarray(sd0_params[k])):
            changed += 1
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(
            got, want, atol=2e-4 * scale, rtol=2e-3,
            err_msg=f"v0_1 BN running-stat mismatch for {k}")
    assert changed > 4, "decoder BN stats barely moved; comparison vacuous"
