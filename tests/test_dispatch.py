"""Kernel-dispatch policy pins.

Every measured ON/OFF decision recorded in BENCHMARKS.md is asserted here so
a silent dispatch change (which no numerical test can catch — the kernels are
exact) fails loudly. Round-2 postmortem: `_fusable_prefix` lost its
`expand == 1` gate, the slower expand_dw_phase kernel dispatched for blocks
2-4, and the headline dropped 379 -> 286 img/s with all 139 tests green.
"""

import pytest

from hyperseg_tpu.models.backbones.efficientnet import EfficientNet
from hyperseg_tpu.ops import pallas as pallas_cfg


# (backbone, post-stem h2 x w2 for each benchmark config, expected prefix)
# The fused planar MBConv chain absorbs exactly the leading expand-1 blocks
# (b1/b3 stage 1: two blocks) at every benchmark shape; expand-ratio blocks
# stay XLA by measurement (286 vs 379 img/s on HyperSeg-M, BENCHMARKS.md).
BENCH_SHAPES = [
    ("efficientnet-b1", (256, 512), 2),   # hyperseg-m cityscapes 1024x512
    ("efficientnet-b1", (384, 768), 2),   # hyperseg-s cityscapes 1536x768
    ("efficientnet-b1", (288, 384), 2),   # hyperseg-s camvid 768x576
    ("efficientnet-b1", (384, 512), 2),   # hyperseg-l camvid 1024x768
    ("efficientnet-b3", (256, 256), 2),   # hyperseg-l voc 512x512
]


@pytest.mark.parametrize("name,h2w2,want", BENCH_SHAPES)
def test_fusable_prefix_is_expand1_blocks_only(name, h2w2, want):
    bb = EfficientNet(name, out_feat_scale=0.25, head=None)
    got = bb._fusable_prefix(*h2w2)
    assert got == want, (
        f"{name}@{h2w2}: fused MBConv prefix {got} != measured-fastest "
        f"{want} — expand-ratio blocks must NOT dispatch expand_dw_phase "
        f"(BENCHMARKS.md: 286 vs 379 img/s)")
    # the absorbed blocks really are the expand-1 ones
    for i in range(got):
        assert bb.blocks[i].expand == 1


def test_fusable_prefix_respects_flags(monkeypatch):
    bb = EfficientNet("efficientnet-b1", out_feat_scale=0.25, head=None)
    monkeypatch.setattr(pallas_cfg, "MBCONV_ENABLED", False)
    assert bb._fusable_prefix(256, 512) == 0
    monkeypatch.setattr(pallas_cfg, "MBCONV_ENABLED", True)
    monkeypatch.setattr(pallas_cfg, "MBCONV_EXPAND_ENABLED", True)
    # with the expand gate lifted, the chain extends past block 1 (the
    # re-measurement configuration — not the shipped default)
    assert bb._fusable_prefix(256, 512) > 2


def test_shipped_flag_defaults():
    """The shipped flag set IS the measured-fastest configuration."""
    assert pallas_cfg.STEM_ENABLED is True
    # stem kernel wins IN-GRAPH at every measured batch (b8, img/s kernel vs
    # XLA stem: M 395/339, S-city 158/134, S-camvid 378/355, L-camvid 144/128,
    # L-voc 214/211) — the isolated-op bench that favored XLA at b2+ handed
    # the XLA conv a favorable layout the real graph never provides
    assert pallas_cfg.STEM_MAX_BATCH >= 1 << 30
    # train-path stem kernel loses: b16 full step 291.7 vs 274.2 ms (the
    # custom_vjp boundary blocks fusion around the stem in the train graph)
    assert pallas_cfg.STEM_TRAIN_ENABLED is False
    assert pallas_cfg.MBCONV_ENABLED is True
    assert pallas_cfg.MBCONV_EXPAND_ENABLED is False
    assert pallas_cfg.ENABLED is False  # patch_invres forced-on: batch-1 loses
    # batch >= 2 dispatches the fused invres kernel (1.4-1.9x at batch 8;
    # XLA materializes the 6D halo tensor + 9 tap products there)
    assert pallas_cfg.INVRES_MIN_BATCH == 2
    # batch-1 big-patch carve-out: 32x32 patches (L level 5) kernel 3.44 vs
    # XLA 5.42 ms; 16x16 and below XLA wins at b1 (tools/bench_invres.py)
    assert pallas_cfg.INVRES_B1_MIN_PATCH_AREA == 1024
    assert pallas_cfg.RESIZE_ENABLED is False  # XLA ~0.09 vs kernel ~0.11 ms
    # eval decoder batch scan: b8 in-graph batched->scan M 395.7->395.2,
    # S-city 154.3->185.7, S-camvid 372.2->418.1, L-voc 213.6->347.1;
    # L-camvid (finest map 786k px) 183.3->173.9 — hence the pixel gate
    assert pallas_cfg.DECODER_SCAN_MIN_BATCH == 2
    assert pallas_cfg.DECODER_SCAN_MAX_PIXELS == 500_000
    assert pallas_cfg.DECODER_SCAN_FORCE is False

    from hyperseg_tpu.ops import patch as P
    from hyperseg_tpu.ops.pallas import patch_invres as PI
    from hyperseg_tpu.ops.pallas import stem as SK
    import inspect
    from hyperseg_tpu.train import losses as L
    # measured on-chip 2026-08-18 (tools/measure_pending.sh, BENCHMARKS.md):
    assert P.FULLMAP_INVRES is False      # train fwd+bwd 0.80-0.87x vs gather
    assert P.FULLMAP_POINTWISE is True    # b8 >= 1.0x everywhere, 1.67x Lvoc
    assert P.FULLMAP_MIN_BATCH == 2       # b1 keeps the measured blocked form
    assert PI.RANK4_DOT is False          # loses + intermittent Mosaic 500s
    assert PI.OUT6D is False              # ties l4, loses 25% at l3
    # fused s2w ties the plain kernel (±1.1% across M/S/L at b1/b8) and
    # eliminates the generated-weight HBM round-trip -> ON
    assert PI.S2W_FUSED is True
    assert SK.SEL_GATHER is False         # Mosaic compile fails (2026-08-18)
    # loss top-k: select beats sort (b8 67.1 vs 72.8, b16 135.2 vs 146.2 ms)
    sig = inspect.signature(L.bootstrapped_cross_entropy)
    assert sig.parameters["method"].default == "select"
    assert inspect.signature(L.BootstrappedCrossEntropyLoss).parameters[
        "method"].default == "select"
    # class-major CE: b16 fwd+bwd 135.7 -> 3.37 ms (NHWC C=19 pays a 6.7x
    # lane-pad tax on every pass; class-major passes are lane-dense)
    assert L.CE_CLASS_MAJOR is True


def test_invres_batch_dispatch_policy(monkeypatch):
    """InvResUnit routes by batch size: XLA at batch 1, kernel at batch >= 2,
    XLA whenever the shape gate fails (e.g. pyramid-TTA patch dims)."""
    import jax.numpy as jnp
    import numpy as np
    from hyperseg_tpu.models.decoder import InvResUnit
    from hyperseg_tpu.ops.pallas import patch_invres as PI

    unit = InvResUnit(prefix="u", in_ch=6, out_ch=5, hidden=12, kernel=3)
    rng = np.random.RandomState(0)
    params = {}
    for i, ch in [(1, 12), (2, 12), (3, 5)]:
        params[f"u.bn{i}.weight"] = jnp.ones(ch)
        params[f"u.bn{i}.bias"] = jnp.zeros(ch)
        params[f"u.bn{i}.running_mean"] = jnp.zeros(ch)
        params[f"u.bn{i}.running_var"] = jnp.ones(ch)

    calls = []
    real = PI.patch_inverted_residual_fused

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k, interpret=True)

    monkeypatch.setattr(PI, "patch_inverted_residual_fused", spy)

    def run(b, h, w, fh, fw):
        calls.clear()
        x = jnp.asarray(rng.rand(b, h, w, 6), jnp.float32)
        ww = jnp.asarray(rng.rand(b, fh, fw, unit.hyper_params) * 0.1)
        unit.apply(params, x, ww)
        return bool(calls)

    # on a CPU backend Mosaic can't execute — no dispatch even at batch 2
    # (regression pin: batch-2 v0_2 eval crashed on CPU before this gate)
    assert not run(2, 16, 16, 2, 2)

    monkeypatch.setattr(pallas_cfg, "kernels_available", lambda: True)
    assert not run(1, 16, 16, 2, 2)        # batch 1, 8x8 patches -> XLA
    assert run(2, 16, 16, 2, 2)            # batch 2 -> kernel
    assert not run(2, 12, 12, 2, 2)        # ph=6 not 8-aligned -> XLA
    # batch-1 big-patch carve-out: 32x32 patches dispatch even at batch 1
    # (L-CamVid level 5: kernel 3.44 vs XLA 5.42 ms)
    assert run(1, 64, 64, 2, 2)
    monkeypatch.setattr(pallas_cfg, "INVRES_B1_MIN_PATCH_AREA", 10 ** 9)
    assert not run(1, 64, 64, 2, 2)


def test_v01_invres_dispatch_and_parity(monkeypatch):
    """V01InvResUnit routes through the V01-exact fused kernel under the
    shared batch policy (kernel at batch >= 2 on a TPU backend, XLA at
    batch 1 / on CPU / in training), and the kernel path matches the
    subunit-composition path (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp
    from hyperseg_tpu.models.decoder import V01InvResUnit
    from hyperseg_tpu.nn import functional as F
    from hyperseg_tpu.ops.pallas import patch_invres as PI

    unit = V01InvResUnit(prefix="u", in_ch=6, out_ch=6, hidden=12, kernel=3,
                         expand=2)
    params = {}
    for j, ch in [(0, 12), (1, 12), (2, 6)]:
        params[f"u.conv.{j}.1.weight"] = jnp.ones(ch) * 0.9
        params[f"u.conv.{j}.1.bias"] = jnp.zeros(ch) + 0.05
        params[f"u.conv.{j}.1.running_mean"] = jnp.zeros(ch) + 0.02
        params[f"u.conv.{j}.1.running_var"] = jnp.ones(ch) * 1.1

    calls = []
    real = PI.patch_inverted_residual_v01

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k, interpret=True)

    monkeypatch.setattr(PI, "patch_inverted_residual_v01", spy)
    # the default is OFF (Mosaic remote-compile failure on the real chip,
    # see patch_invres.py V01_KERNEL); this test exercises the dispatch
    # POLICY with the lever pinned on, then checks the lever-off path last
    monkeypatch.setattr(PI, "V01_KERNEL", True)

    def run(b, ctx=None):
        calls.clear()
        # deterministic per-batch-size data: the kernel-vs-XLA comparison
        # below calls run(2) twice and must see identical inputs
        r = np.random.RandomState(b)
        x = jnp.asarray(r.rand(b, 16, 16, 6), jnp.float32)
        w = jnp.asarray(r.rand(b, 2, 2, unit.hyper_params) * 0.1)
        y = unit.apply(params, x, w, ctx)
        return bool(calls), y

    assert not run(2)[0]                       # CPU backend: no dispatch
    monkeypatch.setattr(pallas_cfg, "kernels_available", lambda: True)
    assert not run(1)[0]                       # batch 1, small patches: XLA
    hit, got = run(2)
    assert hit                                 # batch 2: kernel
    monkeypatch.setattr(pallas_cfg, "kernels_available", lambda: False)
    _, want = run(2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)
    monkeypatch.setattr(pallas_cfg, "kernels_available", lambda: True)
    assert not run(2, F.Ctx(train=True))[0]    # training: differentiable XLA
    monkeypatch.setattr(PI, "V01_KERNEL", False)
    assert not run(2)[0]                       # lever off


def test_patchconv_fullmap_batch_gate(monkeypatch):
    """PatchConvUnit's full-map eval forms (pointwise + depthwise) dispatch
    only at batch >= FULLMAP_MIN_BATCH or in training: the recorded batch-1
    sweep measured the patch-blocked forms, and the full-map forms' motivation
    (the batch >= 2 relayout tax) doesn't exist at batch 1."""
    import jax.numpy as jnp
    import numpy as np
    from hyperseg_tpu.models.decoder import PatchConvUnit
    from hyperseg_tpu.nn import functional as F
    from hyperseg_tpu.ops import patch as P

    rng = np.random.RandomState(0)
    hits = []
    for fn in ("fullmap_pointwise", "fullmap_depthwise"):
        real = getattr(P, fn)
        monkeypatch.setattr(P, fn, lambda *a, _r=real, _n=fn, **k: (
            hits.append(_n), _r(*a, **k))[1])

    def run(unit, b, ctx=None):
        hits.clear()
        x = jnp.asarray(rng.rand(b, 16, 16, unit.in_ch), jnp.float32)
        w = jnp.asarray(rng.rand(b, 2, 2, unit.hyper_params) * 0.1)
        unit.apply({}, x, w, ctx)
        return list(hits)

    pw = PatchConvUnit(prefix="u", in_ch=4, out_ch=6, kernel=1)
    dw = PatchConvUnit(prefix="u", in_ch=4, out_ch=4, kernel=3, groups=4,
                       pad=1)
    assert run(pw, 1) == [] and run(dw, 1) == []            # batch 1: patch
    assert run(pw, 2) and run(dw, 2)                        # batch 2: fullmap
    train = F.Ctx(train=True)
    assert run(pw, 1, train) and run(dw, 1, train)          # training: always


def test_s2w_fused_dispatch_and_parity(monkeypatch):
    """With S2W_FUSED on (and a TPU-backend stub), the decoder's V1 level
    loop dispatches the fully fused s2w+invres kernel at batch >= 2 — and the
    result matches the generate-then-apply path (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp
    from hyperseg_tpu.models import decoder as D
    from hyperseg_tpu.ops.pallas import patch_invres as PI

    unit = D.InvResUnit(prefix="u", in_ch=6, out_ch=5, hidden=12, kernel=3)
    unit.s2w = D.S2W(prefix="u.signal2weights", signal_ch=32, signal_index=0,
                     groups=2, out_ch=D.next_multiply(unit.hyper_params, 2),
                     hyper_params=unit.hyper_params)
    rng = np.random.RandomState(0)
    params = {"u.signal2weights.weight": jnp.asarray(
        rng.randn(1, 1, 16, unit.s2w.out_ch) * 0.05, jnp.float32)}
    for i, ch in [(1, 12), (2, 12), (3, 5)]:
        params[f"u.bn{i}.weight"] = jnp.ones(ch) * 0.9
        params[f"u.bn{i}.bias"] = jnp.zeros(ch) + 0.05
        params[f"u.bn{i}.running_mean"] = jnp.zeros(ch)
        params[f"u.bn{i}.running_var"] = jnp.ones(ch)

    x = jnp.asarray(rng.rand(2, 16, 16, 6), jnp.float32)
    s = jnp.asarray(rng.randn(2, 2, 2, 32) * 0.3, jnp.float32)
    want = D.apply_unit_from_signal(params, unit, x, s, None)  # flag off

    calls = []
    real = PI.patch_inverted_residual_s2w_fused

    def spy(*a, **k):
        calls.append(1)
        k.pop("interpret", None)
        return real(*a, **k, interpret=True)

    monkeypatch.setattr(PI, "patch_inverted_residual_s2w_fused", spy)
    monkeypatch.setattr(PI, "S2W_FUSED", True)
    monkeypatch.setattr(pallas_cfg, "kernels_available", lambda: True)
    # keep the non-fused fallback off the (non-interpret) plain kernel
    monkeypatch.setattr(pallas_cfg, "INVRES_MIN_BATCH", 2)

    got = D.apply_unit_from_signal(params, unit, x, s, None)
    assert calls, "fused kernel did not dispatch at batch 2"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.02, rtol=0.05)

    # batch 1 stays on the measured XLA path; training never fuses
    calls.clear()
    D.apply_unit_from_signal(params, unit, x[:1], s[:1], None)
    assert not calls
    from hyperseg_tpu.nn import functional as F
    import jax
    D.apply_unit_from_signal(params, unit, x, s,
                             F.Ctx(train=True, rng=jax.random.PRNGKey(0)))
    assert not calls


def test_decoder_batch_scan_parity_and_policy(monkeypatch):
    """Eval decoder batch scan (models/hypergen.py _scan_decoder): logits
    must be identical to the batched decoder (the scan body IS the batch-1
    graph), the gate must be eval-only and batch-gated, and training must
    never scan (BN batch stats need the full batch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hyperseg_tpu.models import hyperseg_v1_0 as V1
    from hyperseg_tpu.models.hypergen import HyperGen
    from hyperseg_tpu.nn import functional as F

    model = V1.hyperseg_efficientnet(
        "efficientnet-b0", levels=2, kernel_sizes=(1, 1, 3), expand_ratio=2,
        weight_groups=(8, 8, 4), level_channels=[16, 8, 8], num_classes=5)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(3, 64, 128, 3), jnp.float32)

    monkeypatch.setattr(pallas_cfg, "DECODER_SCAN_FORCE", True)
    monkeypatch.setattr(pallas_cfg, "DECODER_SCAN_MIN_BATCH", 0)
    want = model(params, x)
    monkeypatch.setattr(pallas_cfg, "DECODER_SCAN_MIN_BATCH", 2)
    got = model(params, x)
    # identical graph per image; only fusion-order float noise differs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # policy: eval-only, batch-, backend-, and finest-map-pixel-gated
    nl = len(model.decoder.level_units)
    ShapeOnly = type("ShapeOnly", (), {})

    def ins_for(batch, h, w, n_ins=None):
        """Fake ins list whose finest consumed entry is (batch, h, w)."""
        outs = []
        for i in range(n_ins or nl):
            o = ShapeOnly()
            o.shape = (batch, h, w, 3)
            outs.append(o)
        return outs

    ctx_train = F.Ctx(train=True, rng=jax.random.PRNGKey(0))
    assert model._scan_decoder(None, ins_for(8, 256, 512))
    assert model._scan_decoder(F.Ctx(train=False, rng=None),
                               ins_for(2, 256, 512))
    assert not model._scan_decoder(ctx_train, ins_for(8, 256, 512))
    assert not model._scan_decoder(None, ins_for(1, 256, 512))
    # finest consumed map above the measured pixel gate: no scan (L-CamVid,
    # 768x1024 = 786k px, loses 5% in-graph)
    assert not model._scan_decoder(None, ins_for(8, 768, 1024))
    monkeypatch.setattr(pallas_cfg, "DECODER_SCAN_MIN_BATCH", 0)
    assert not model._scan_decoder(None, ins_for(8, 256, 512))
    monkeypatch.setattr(pallas_cfg, "DECODER_SCAN_MIN_BATCH", 2)
    monkeypatch.setattr(pallas_cfg, "DECODER_SCAN_FORCE", False)
    assert not model._scan_decoder(None, ins_for(8, 256, 512))  # CPU: no scan
