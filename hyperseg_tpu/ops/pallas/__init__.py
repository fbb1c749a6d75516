"""Fused Pallas TPU kernels (per-kernel opt-in flags, eval path only).

STEM_ENABLED (default True) routes the backbone stem+BN+swish through
ops/pallas/stem.py — measured 1.5-1.6x faster than the XLA stem at every
benchmark shape on v5e (the biggest single op of the forward).

Eval-mode inverted residuals (ops/pallas/patch_invres.py) dispatch by BATCH
SIZE: at batch >= INVRES_MIN_BATCH the fused full-map kernel runs; at batch 1
the XLA patch-blocked path stays. Round-3 measurement (tools/bench_invres.py,
v5e): at batch 1 XLA wins slightly (~0.45 vs ~0.78 ms on M_level4), but at
batch 8 XLA materializes the 6D halo-patch tensor and all nine depthwise tap
products in HBM with ~5x tiling pad — per-IMAGE cost jumps 0.45 -> 1.26 ms —
while the kernel (which reads the reflect-padded full map directly; no 6D
tensor ever exists) holds ~0.67 ms/img: 1.9x faster. ENABLED=True forces the
kernel at every batch size (A/B lever); the XLA path (ops/patch.py) remains
the numerical oracle."""

ENABLED = False
INVRES_MIN_BATCH = 2
# Batch-1 shape carve-out: dispatch the fused kernels at batch 1 too when the
# patch is large. Measured (tools/bench_invres.py, v5e, 2026-08-18): at 32x32
# patches (HyperSeg-L CamVid level 5, the level that runs at full input
# resolution) the XLA gather path is pathological even at batch 1 — kernel
# 3.44 ms vs gather 5.42 ms (1.57x); forcing kernels lifted the whole config
# 108.6 -> 141.5 img/s. At 16x16 (M/L level 4) and 8x8 patches XLA still wins
# at batch 1 (0.72 vs 0.67-0.90 ms), so the gate is patch AREA >= 1024.
INVRES_B1_MIN_PATCH_AREA = 1024
# Second batch-1 carve-out, for the LANE-PACKED kernel (patch_invres.py
# LANE_PACK): levels with a LARGE map win in-graph at batch 1 regardless of
# patch size. Measured (tools/bench_pack.py, v5e, 2026-08-19, b1 img/s
# forced-vs-default): S-city 214.7 vs 161.3 (+33%, its levels are 8x8/16x16
# patches but 192x384..384x768 maps) and L-camvid 185.2 vs 177.1 (l4 at
# 384x512 adds +4.6% over the area carve-out alone); M (level maps <= 131k
# px) 418.7 vs 423.4 and S-camvid (<= 110k px) 391.0 vs 413.8 say SMALL maps
# still belong to the fused XLA gather at batch 1. Threshold splits the
# measured win set {196608, 294912, 786432} from the loss set
# {110592, 131072}.
INVRES_PACK_MIN_PIXELS = 150_000
# Eval decoder batch scan (models/hypergen.py _scan_decoder): at batch >=
# this, the decoder runs as a lax.map over the batch — per-image decoder
# cost returns to its batch-1 value (where XLA fuses the per-patch layouts
# it materializes at batch >= 2) while the backbone/mapper stay batched.
# 0/None disables. Measured v5e (tools/bench_scan.py, in-graph b8 img/s,
# batched vs scan): M 395.7/395.2 (tie), S-city 154.3/185.7 (+20%),
# S-camvid 372.2/418.1 (+12%), L-voc 213.6/347.1 (+62%), L-camvid
# 183.3/173.9 (-5%). The one loser is the config whose finest consumed map
# is full-resolution (786k px) and kernel-dominated; the pixel gate below
# excludes it. The eval CLIs disable the scan when the batch is sharded
# over a >1-device data mesh (the scan iterates the GLOBAL batch).
DECODER_SCAN_MIN_BATCH = 2
# Finest-consumed-map pixel gate: measured win set {110k, 262k, 294k} px,
# tie at 131k, loss at 786k (full-res level dominated by the packed kernel,
# which amortizes batch better than lax.map's serialized iterations).
DECODER_SCAN_MAX_PIXELS = 500_000
# Test hook: enable the scan on a non-TPU backend (kernels_available gates
# it to TPU in production because the batched-XLA inversion it fixes is a
# TPU layout artifact).
DECODER_SCAN_FORCE = False

STEM_ENABLED = True
# Batch gate for the eval stem kernel. The ISOLATED stem bench says XLA
# catches up at batch >= 2 (b8 S 3.17 vs 1.74 ms) — but IN-GRAPH the kernel
# wins at batch 8 on every benchmark config (v5e img/s, kernel vs XLA stem:
# M 395.0/339.3, S-city 157.8/133.5, S-camvid 378.0/355.0, L-camvid
# 143.5/128.3, L-voc 213.7/210.9): inside the jitted model the XLA stem's
# 3-channel conv forces the same pathological layout pipeline it pays at
# batch 1, while the isolated bench hands it a favorably-laid-out operand.
# In-graph A/B is the binding measurement; gate effectively off. Large-batch
# extrapolation checked on v5e (2026-08-19, in-graph HyperSeg-M full model,
# kernel vs XLA stem): b16 372.2/321.4, b32 362.0/350.5 img/s — the kernel
# keeps winning, margin narrowing (~16% -> ~3%) as the batched XLA conv
# amortizes its layout pipeline; no crossover through b32.
STEM_MAX_BATCH = 1 << 30
# Route the TRAINING forward's stem conv through the kernel too (custom_vjp:
# Pallas forward / XLA conv backward; BN-train + swish stay XLA). OFF by
# measurement (tools/bench_train.py, v5e b16 full step: 291.7 ms with the
# kernel vs 274.2 XLA — the custom_vjp boundary blocks XLA's fusion around
# the stem in the train graph).
STEM_TRAIN_ENABLED = False

# Fused planar MBConv prefix chain (ops/pallas/mbconv.py). MBCONV_ENABLED
# gates the whole chain independently of the stem kernel so the two can be
# A/B-measured separately (tools/bench_components.py). MBCONV_EXPAND_ENABLED
# additionally lets expand-ratio (expand>1) blocks dispatch through
# expand_dw_phase — measured SLOWER end to end on v5e (286 vs 379 img/s on
# HyperSeg-M: Mosaic keeps all nine depthwise tap temporaries live, forcing
# 16-channel grid chunking), so it stays off; only expand-1 blocks fuse.
MBCONV_ENABLED = True
MBCONV_EXPAND_ENABLED = False

# Banded-MXU integer-scale bilinear upsample (ops/pallas/resize.py) for the
# final logit upsample — differentiable (custom_vjp), dispatches in both
# train and eval when the shape gate (resize.supported) passes. OFF by
# measurement: the round-2 "0.35 ms final resize" was mostly timing-harness
# overhead (identity-loop baseline 0.16-0.19 ms/iter); the true XLA resize
# is ~0.09 ms at the flagship shape and the kernel measured ~0.11 ms
# (tools/bench_resize history: G=1 concat 0.25, G=4 0.30, sum-of-dots
# 0.25-0.28 raw, all before baseline subtraction). Kept for larger-tensor
# regimes where the banded matmuls amortize better.
RESIZE_ENABLED = False


def invres_kernel_wanted(x_shape, map_shape):
    """Dispatch policy for the fused inverted-residual kernels (plain and
    s2w-fused): forced (ENABLED), batched (batch >= INVRES_MIN_BATCH), or the
    big-patch batch-1 carve-out (patch area >= INVRES_B1_MIN_PATCH_AREA — see
    the flag comment). `map_shape` is any (B, fh, fw, ...) per-patch tensor
    (the generated weight map or the signal container)."""
    b, hgt, wid = x_shape[0], x_shape[1], x_shape[2]
    fh, fw = map_shape[1], map_shape[2]
    if ENABLED or b >= INVRES_MIN_BATCH:
        return True
    if hgt % fh == 0 and wid % fw == 0:
        if (hgt // fh) * (wid // fw) >= INVRES_B1_MIN_PATCH_AREA:
            return True
        # packed-kernel extension: big maps win at batch 1 even with small
        # patches (see INVRES_PACK_MIN_PIXELS) — only when lane packing is on
        from hyperseg_tpu.ops.pallas import patch_invres as PI
        g = PI.LANE_PACK if isinstance(PI.LANE_PACK, int) else 2
        return g > 1 and hgt * wid >= INVRES_PACK_MIN_PIXELS
    return False


def kernels_available():
    """True when Mosaic kernels can execute (a real TPU backend). Dispatch
    sites must check this: batch-based auto-dispatch on a CPU backend would
    crash ('Only interpret mode is supported on CPU backend'). Tests
    monkeypatch this to exercise dispatch policy with interpret=True."""
    import jax
    return jax.default_backend() == "tpu"
