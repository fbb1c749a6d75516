"""Per-op fwd+bwd attribution INSIDE one InvResUnit training step (the
level-3/4 train path dominates the b16 step: +29 / +114.6 ms of 272 ms,
tools/bench_bwd.py). Times value_and_grad of progressively longer chains at
the HyperSeg-M decoder shapes; consecutive deltas attribute each op's own
fwd+bwd cost, localizing the backward (VERDICT r4 item 4) below the
unit level: halo gather (whose VJP is a scatter-add), pointwise einsums
(whose dw is many tiny contractions), depthwise taps, patch-space BN.

Run alone on the idle chip.
Usage: python tools/bench_bwd_unit.py [batch ...]   (default: 16)
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hyperseg_tpu.nn import functional as F
from hyperseg_tpu.ops import patch as P
from tools._bench import timed as _timed

timed = functools.partial(_timed, iters=100)

SHAPES = [
    # name, (H, W), fh, fw, cin, hidden, out, k
    ("M_level3", (128, 256), 16, 32, 24, 48, 16, 3),
    ("M_level4", (256, 512), 16, 32, 34, 68, 19, 3),
]

BN_EPS = 1e-5


def main():
    batches = [int(a) for a in sys.argv[1:]] or [16]
    dtype = jnp.bfloat16
    for batch in batches:
        for name, (hgt, wid), fh, fw, cin, hidden, out, k in SHAPES:
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.rand(batch, hgt, wid, cin), dtype)
            r1 = cin * hidden
            r2 = r1 + hidden * k * k
            r3 = r2 + hidden * out
            w = jnp.asarray(rng.rand(batch, fh, fw, r3) * 0.1, dtype)
            params = {}
            for i, ch in [(1, hidden), (2, hidden), (3, out)]:
                params[f"u.bn{i}.weight"] = jnp.ones(ch, jnp.float32)
                params[f"u.bn{i}.bias"] = jnp.zeros(ch, jnp.float32)
                params[f"u.bn{i}.running_mean"] = jnp.zeros(ch, jnp.float32)
                params[f"u.bn{i}.running_var"] = jnp.ones(ch, jnp.float32)

            def bn(n, t, ctx):
                return F.apply_bn(params, f"u.bn{n}", t, ctx, eps=BN_EPS)

            def chain(xx, ww, stop):
                ctx = F.Ctx(train=True)
                pad = k // 2
                xp = P.extract_patches_with_halo(xx, fh, fw, (pad, pad))
                if stop == "gather":
                    return xp
                h = P.patch_pointwise(xp, ww[..., :r1], hidden)
                if stop == "pw1":
                    return h
                h = F.ACTIVATIONS["relu6"](bn(1, h, ctx))
                if stop == "bn1":
                    return h
                h = P.patch_depthwise_valid(h, ww[..., r1:r2], (k, k))
                if stop == "dw":
                    return h
                h = F.ACTIVATIONS["relu6"](bn(2, h, ctx))
                if stop == "bn2":
                    return h
                h = P.patch_pointwise(h, ww[..., r2:r3], out)
                if stop == "pw2":
                    return h
                h = bn(3, h, ctx)
                o = P.unblock_patches(h)
                if cin == out:
                    o = o + xx
                return o

            stops = ["gather", "pw1", "bn1", "dw", "bn2", "pw2", "full"]
            prev = {False: 0.0, True: 0.0}
            print(f"# b={batch} {name}  (columns: scatter-VJP | slice-VJP)")
            for stop in stops:
                def loss(xx, ww, stop=stop):
                    y = chain(xx, ww, stop)
                    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

                grad_fn = jax.value_and_grad(loss, argnums=(0, 1))

                def step(xx, ww):
                    val, (gx, gw) = grad_fn(xx, ww)
                    return (val + gx.astype(jnp.float32).sum()
                            + gw.astype(jnp.float32).sum())

                row = {}
                for flag in (False, True):
                    P.HALO_SLICE_VJP = flag
                    row[flag] = timed(step, x, w)
                print(f"  {stop:7s} "
                      f"{row[False]:8.3f} ms (d {row[False]-prev[False]:+7.3f})"
                      f" | {row[True]:8.3f} ms (d {row[True]-prev[True]:+7.3f})")
                prev = row


if __name__ == "__main__":
    main()
