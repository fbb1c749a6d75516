"""Fused Pallas TPU kernels (opt-in).

Set `hyperseg_tpu.ops.pallas.ENABLED = True` to route eval-mode inverted
residuals through the fused kernel (ops/pallas/patch_invres.py). The XLA
patch-blocked path (ops/patch.py) is the numerical oracle and the default —
on v5e the fused kernel currently matches it rather than beating it (the op
is MXU-shape-bound, not HBM-bound), so the default stays XLA until the kernel
wins."""

ENABLED = False
