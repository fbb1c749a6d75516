"""BatchNorm running-stat calibration for freshly-initialized models.

At default init every conv shrinks activation variance and eval-mode BN
(running stats 0/1) never rescales, so deep outputs underflow toward zero and
any logits-level comparison is vacuous. One deterministic train-mode pass
(stochastic ops are identity when no rng is supplied) yields BN updates under
the torch momentum convention (nn/functional.py:137-159); inverting that
update recovers the exact batch statistics — equivalent to the reference-side
momentum=1 calibration used by the parity suite (tests/conftest.py). After
calibration, eval-mode activations are O(1) at every depth."""

from __future__ import annotations

from hyperseg_tpu.nn import functional as F


def calibrate_bn(model, params, x):
    """Return a copy of `params` whose BN running stats are the exact batch
    statistics of a forward pass on `x` (deterministic: train mode, no rng).

    Uses the raw batch stats recorded in Ctx.batch_stats — NOT a momentum
    inversion, which would need each layer's own momentum (the backbone uses
    0.01, the decoder 0.1). Eval-mode logits with these stats reproduce the
    calibration pass's train-mode logits exactly."""
    ctx = F.Ctx(train=True, rng=None)
    model(params, x, ctx)
    return {**params, **ctx.batch_stats}
