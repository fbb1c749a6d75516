"""Checkpoint converter: reference .pth -> native .npz (with arch remap).

The resulting checkpoint is self-describing: the stored reference arch string
(hyperseg.models.*) resolves onto this framework through the registry alias
table, so test/test_fps can rebuild the model directly."""

from __future__ import annotations

import json
import os

import numpy as np


def main(src: str, dst: str = None):
    from hyperseg_tpu.core.torch_import import load_torch_checkpoint
    params, meta = load_torch_checkpoint(src)
    dst = dst or os.path.splitext(src)[0] + ".npz"
    np.savez(dst, **{k: np.asarray(v) for k, v in params.items()})
    with open(os.path.splitext(dst)[0] + ".json", "w") as f:
        json.dump({k: v for k, v in meta.items()}, f, indent=1, default=str)
    print(f"converted {src} -> {dst} ({len(params)} tensors; "
          f"arch={'yes' if 'arch' in meta else 'no'})")


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser("hyperseg_tpu pth->npz converter")
    p.add_argument("src")
    p.add_argument("dst", nargs="?")
    a = p.parse_args()
    main(a.src, a.dst)
