"""General utilities mirroring hyperseg/utils/utils.py oddities that tools and
configs rely on."""

from __future__ import annotations

import math
import random
from typing import Optional

import numpy as np


def set_seed(seed: Optional[int]):
    """Seed numpy/python RNGs and return a jax PRNGKey (utils/utils.py:49-58;
    the torch/cudnn determinism knobs have no TPU analogue — XLA is
    deterministic by default)."""
    import jax
    if seed is None:
        seed = random.randint(0, 2 ** 31 - 1)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def str2int(s):
    """'4K' -> 4000 style suffix parsing (utils/utils.py:85-93)."""
    if isinstance(s, (int, float)):
        return int(s)
    s = s.strip().lower()
    mult = {"k": 1_000, "m": 1_000_000, "g": 1_000_000_000}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def random_pair(n, min_dist=0, index1=None):
    """Random index pair with minimum distance (utils/utils.py:184-205)."""
    r1 = random.randint(0, n - 1) if index1 is None else index1
    while True:
        r2 = random.randint(0, n - 1)
        if abs(r1 - r2) >= min_dist:
            return r1, r2


def random_pair_range(a, b, min_dist=0, index1=None):
    """Random ordered pair in [a, b] (utils/utils.py:208-222)."""
    r1 = random.randint(a, b) if index1 is None else index1
    while True:
        r2 = random.randint(a, b)
        if abs(r1 - r2) >= min_dist:
            return tuple(sorted((r1, r2)))


class ExpDecayingHyperParameter:
    """Exponentially decaying scalar hyper-parameter (utils/utils.py:350-377):
    value = final + (initial - final) * 0.5 ** (step / half_life)."""

    def __init__(self, initial_value, final_value, half_life):
        self.initial_value = initial_value
        self.final_value = final_value
        self.half_life = half_life
        self.step = 0

    def __call__(self):
        decay = 0.5 ** (self.step / self.half_life)
        return self.final_value + (self.initial_value - self.final_value) * decay

    def update(self, n=1):
        self.step += n

    def state_dict(self):
        return {"step": self.step}

    def load_state_dict(self, d):
        self.step = d["step"]


def get_media_info(path):
    """Probe a media file for (width, height, fps, frame_count) — the
    reference calls out to ffmpeg (utils/utils.py:225-251); gated here on
    ffmpeg availability since this environment has none."""
    try:
        import ffmpeg
    except ImportError as e:
        raise RuntimeError("get_media_info requires ffmpeg-python") from e
    probe = ffmpeg.probe(path)
    stream = next(s for s in probe["streams"] if s["codec_type"] == "video")
    fps = eval_fraction(stream.get("avg_frame_rate", "0/1"))
    return (int(stream["width"]), int(stream["height"]), fps,
            int(stream.get("nb_frames", 0)))


def eval_fraction(s: str) -> float:
    num, _, den = s.partition("/")
    den = float(den) if den else 1.0
    return float(num) / den if den else 0.0


def init_weights(params, rng, init_type="normal", gain=0.02):
    """Multi-scheme re-initialization of conv/linear weights over a flat param
    dict (utils/utils.py:16-33): 'normal' | 'xavier' | 'kaiming' |
    'orthogonal'; biases zeroed; BN affine -> N(1, gain), 0. The trainer's
    init_weights is the xavier scheme (train.py:277-279)."""
    import jax
    import jax.numpy as jnp
    out = dict(params)
    i = 0

    def key():
        nonlocal i
        i += 1
        return jax.random.fold_in(rng, i)

    bn_scales = {k[:-len(".running_mean")] for k in params
                 if k.endswith(".running_mean")}
    for k, v in params.items():
        base = k[:-len(".weight")] if k.endswith(".weight") else None
        if base is not None and base in bn_scales:
            out[k] = 1.0 + gain * jax.random.normal(key(), v.shape, jnp.float32)
            continue
        if k.endswith(".bias"):
            out[k] = jnp.zeros_like(v)
            continue
        if not (k.endswith(".weight") and v.ndim in (2, 4)):
            continue
        if v.ndim == 4:
            kh, kw, cin, cout = v.shape
            fan_in, fan_out = kh * kw * cin, kh * kw * cout
        else:
            fan_in, fan_out = v.shape
        if init_type == "normal":
            out[k] = gain * jax.random.normal(key(), v.shape, jnp.float32)
        elif init_type == "xavier":
            std = gain * math.sqrt(2.0 / (fan_in + fan_out))
            out[k] = std * jax.random.normal(key(), v.shape, jnp.float32)
        elif init_type == "kaiming":
            std = math.sqrt(2.0 / fan_in)
            out[k] = std * jax.random.normal(key(), v.shape, jnp.float32)
        elif init_type == "orthogonal":
            rows = int(np.prod(v.shape[:-1]))
            cols = v.shape[-1]
            flat = jax.random.normal(key(), (max(rows, cols), min(rows, cols)),
                                     jnp.float32)
            q, r = jnp.linalg.qr(flat)
            q = q * jnp.sign(jnp.diagonal(r))
            if rows < cols:
                q = q.T
            out[k] = gain * q[:rows, :cols].reshape(v.shape)
        else:
            raise NotImplementedError(init_type)
    return out


# backwards-compatible alias
def init_weights_xavier(params, rng):
    return init_weights(params, rng, init_type="xavier", gain=1.0)


def set_device(index=None):
    """Device pick helper (the set_device analogue, utils/utils.py:36-46):
    returns (device, all_devices) preferring accelerators over CPU."""
    import jax
    devices = jax.devices()
    device = devices[index or 0]
    print(f"=> using {device.platform} device: {device}")
    return device, devices
