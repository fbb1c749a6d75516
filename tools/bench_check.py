"""Perf-regression canary: re-measure every benchmark config and fail loudly
if any drops below the recorded claim by more than the tolerance.

Round-2 postmortem motivation: a dispatch-gate regression cost 24% of the
headline throughput while all numerical tests stayed green. This tool (plus
tests/test_dispatch.py for the trace-time policy) makes the recorded
BENCHMARKS.md numbers executable claims.

Run alone on the idle chip (concurrent TPU processes corrupt each other's
fori_loop timings — see NEXT_STEPS.md #6). Exit code 1 on any regression.

Usage: python tools/bench_check.py [--tolerance 0.15] [--update]
  --update rewrites EXPECTED below from the fresh measurements (prints the
  new dict for manual pasting; the file is never self-modified).
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# img/s recorded in BENCHMARKS.md (round 5 sweep). Keys match bench_all.CONFIGS.
# Note: measured isolated/per-config; a full single-process sweep reads the
# LAST config ~8% low (BENCHMARKS.md methodology note), which the 15%
# tolerance absorbs.
EXPECTED = {
    "hyperseg-m_cityscapes_1024x512": 423.2,
    "hyperseg-s_cityscapes_1536x768": 199.2,
    "hyperseg-s_camvid_768x576": 414.3,
    "hyperseg-l_camvid_1024x768": 186.5,
    "hyperseg-l_voc_512x512": 306.7,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tolerance", type=float, default=0.15,
                    help="allowed fractional shortfall vs the recorded claim")
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench_all import CONFIGS, fps_of
    from hyperseg_tpu.core import registry

    measured, failures = {}, []
    for name, spec, res, _base in CONFIGS:
        model = registry.parse_spec(spec).build()
        params = model.init(jax.random.PRNGKey(0))
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 and a.ndim >= 2 else a, params)
        fps = fps_of(model, params, res)
        measured[name] = round(fps, 2)
        want = EXPECTED.get(name)
        status = "?"
        if want is not None:
            floor = want * (1 - args.tolerance)
            status = "ok" if fps >= floor else "REGRESSION"
            if fps < floor:
                failures.append((name, fps, want))
        print(json.dumps({"config": name, "img_s": round(fps, 2),
                          "claimed": want, "status": status}), flush=True)

    if args.update:
        print("\nEXPECTED = {")
        for k, v in measured.items():
            print(f"    {k!r}: {v},")
        print("}")
    if failures:
        for name, fps, want in failures:
            print(f"FAIL {name}: {fps:.1f} img/s < "
                  f"{(1 - args.tolerance) * 100:.0f}% of claimed {want}",
                  file=sys.stderr)
        sys.exit(1)
    print("bench_check: all configs within tolerance of recorded claims")


if __name__ == "__main__":
    main()
