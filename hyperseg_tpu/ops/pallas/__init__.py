"""Fused Pallas TPU kernels (per-kernel opt-in flags, eval path only).

STEM_ENABLED (default True) routes the backbone stem+BN+swish through
ops/pallas/stem.py — measured 1.5-1.6x faster than the XLA stem at every
benchmark shape on v5e (the biggest single op of the forward).

ENABLED (default False) routes eval-mode inverted residuals through
ops/pallas/patch_invres.py. Measured on v5e (tools/bench_invres.py) the
fused kernel slightly loses to the XLA patch-blocked path at the shipped
benchmark shapes (0.72-0.85 ms vs 0.66-0.79 ms per level) — the op is
MXU-shape-bound, not HBM-bound, so keeping the expanded chain in VMEM buys
nothing. The XLA path (ops/patch.py) stays the default and the numerical
oracle; the kernel remains for larger-patch regimes where the halo gather
dominates."""

ENABLED = False
STEM_ENABLED = True

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
