"""Real-data acceptance drill: released reference checkpoints -> mIoU table.

The north star (BASELINE.md) is val mIoU parity against the released `.pth`
checkpoints (reference acceptance table: /root/reference/README.md:25-33).
This environment has neither the checkpoints nor the datasets, so the drill
is wired and smoke-tested now (tests/test_cli.py::test_verify_release_drill
runs it end-to-end on synthetic stand-ins) and runs for real the moment the
artifacts appear:

    python tools/verify_release.py --weights <dir with released .pth/.npz> \
        --cityscapes data/cityscapes --camvid data/camvid --voc data/vocsbd

For each released config it converts the `.pth` if needed (cli/convert),
runs the exact shipped eval recipe (configs/test/<name>.py build_kwargs),
and prints measured vs target mIoU. Exit 1 if any evaluated config misses
its target by more than --tolerance (absolute mIoU points).
"""

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# config file -> (weights stem, dataset-root arg name, target val mIoU from
# BASELINE.md / reference README.md:25-31; HyperSeg-L CamVid has no released
# checkpoint and is excluded, matching the reference's release set)
RELEASED = [
    ("cityscapes_efficientnet_b1_hyperseg-m", "cityscapes", 76.2),
    ("cityscapes_efficientnet_b1_hyperseg-s", "cityscapes", 78.2),
    ("camvid_efficientnet_b1_hyperseg-s", "camvid", 78.4),
    ("vocsbd_efficientnet_b3_hyperseg-l", "voc", 80.6),
]


def load_config(name):
    path = os.path.join(os.path.dirname(__file__), "..", "configs", "test",
                        name + ".py")
    spec = importlib.util.spec_from_file_location(f"cfg_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def resolve_weights(weights_dir, stem):
    """Prefer a native .npz; convert a .pth beside it if that's all there is."""
    npz = os.path.join(weights_dir, stem + ".npz")
    if os.path.isfile(npz):
        return npz
    pth = os.path.join(weights_dir, stem + ".pth")
    if os.path.isfile(pth):
        from hyperseg_tpu.cli import convert
        convert.main(pth, npz)
        return npz
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights")
    ap.add_argument("--cityscapes", default="data/cityscapes")
    ap.add_argument("--camvid", default="data/camvid")
    ap.add_argument("--voc", default="data/vocsbd")
    ap.add_argument("--out", default="tests_out")
    ap.add_argument("--tolerance", type=float, default=0.5,
                    help="allowed absolute mIoU shortfall (points)")
    ap.add_argument("--only", nargs="*", help="subset of config names")
    args = ap.parse_args(argv)
    roots = {"cityscapes": args.cityscapes, "camvid": args.camvid,
             "voc": args.voc}

    from hyperseg_tpu.cli.test import main as run_eval

    rows, failures = [], []
    for name, root_key, target in RELEASED:
        if args.only and name not in args.only:
            continue
        weights = resolve_weights(args.weights, name)
        data_dir = roots[root_key]
        if weights is None or not os.path.isdir(data_dir):
            rows.append((name, None, target, "skipped (missing "
                         + ("weights" if weights is None else "dataset") + ")"))
            continue
        cfg = load_config(name)
        exp_dir = os.path.join(args.out, name)
        os.makedirs(exp_dir, exist_ok=True)
        miou = 100.0 * run_eval(
            exp_dir, **cfg.build_kwargs(data_dir=data_dir, model=weights))
        ok = miou >= target - args.tolerance
        rows.append((name, miou, target, "ok" if ok else "MISS"))
        if not ok:
            failures.append(name)

    print("\n| config | measured mIoU | target (reference) | status |")
    print("|---|---|---|---|")
    for name, miou, target, status in rows:
        m = f"{miou:.2f}" if miou is not None else "-"
        print(f"| {name} | {m} | {target} | {status} |")
    print(json.dumps({"results": [
        {"config": n, "miou": m, "target": t, "status": s}
        for n, m, t, s in rows]}))
    if failures:
        sys.exit(1)
    return rows


if __name__ == "__main__":
    main()
