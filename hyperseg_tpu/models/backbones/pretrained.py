"""ImageNet-pretrained EfficientNet backbone bootstrapping.

Reference semantics: `EfficientNet.from_pretrained` fetches the lukemelas
release checkpoint and partial-loads it with `load_fc=False`
(reference efficientnet.py:416-447, efficientnet_utils.py:643-674). All five
shipped train recipes depend on this init to reach their published mIoU.

This build resolves a local `.pth` first (explicit path, then the search
dirs below), attempts a best-effort download when nothing is cached, and
**fails loudly** when `pretrained=True` cannot be satisfied — silently
training from random init would quietly miss the reference accuracy by a
wide margin.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

# Public lukemelas release files (reference efficientnet_utils.py:615-626).
URL_MAP = {
    f"efficientnet-b{i}":
        "https://github.com/lukemelas/EfficientNet-PyTorch/releases/"
        f"download/1.0/efficientnet-b{i}-{sha}.pth"
    for i, sha in enumerate(["355c32eb", "f1951068", "8bb594d6", "5fb5a3c3",
                             "6ed6700e", "b6417697", "c76e70fd", "dcc49843"])
}

ENV_DIR = "HYPERSEG_TPU_PRETRAINED_DIR"


def search_dirs():
    dirs = []
    if os.environ.get(ENV_DIR):
        dirs.append(os.environ[ENV_DIR])
    dirs.append(os.path.join(os.path.expanduser("~"), ".cache",
                             "hyperseg_tpu", "pretrained"))
    dirs.append("weights")
    return dirs


def resolve_pretrained(model_name: str, weights_path: Optional[str] = None) -> str:
    """Return a local checkpoint path for `model_name`, or raise RuntimeError.

    Resolution order: explicit path -> cached file named `<model_name>*.pth`
    or `<model_name>*.npz` in $HYPERSEG_TPU_PRETRAINED_DIR /
    ~/.cache/hyperseg_tpu/pretrained / ./weights -> best-effort download of
    the lukemelas release file into the user cache dir.
    """
    if weights_path is not None:
        if os.path.isfile(weights_path):
            return weights_path
        raise RuntimeError(
            f"pretrained weights_path '{weights_path}' does not exist")
    for d in search_dirs():
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if fn.startswith(model_name) and fn.endswith((".pth", ".npz")):
                return os.path.join(d, fn)
    url = URL_MAP.get(model_name)
    if url is not None:
        from hyperseg_tpu.utils.download import download_url
        dest = os.path.join(os.path.expanduser("~"), ".cache", "hyperseg_tpu",
                            "pretrained", os.path.basename(url))
        if download_url(url, dest):
            return dest
    raise RuntimeError(
        f"pretrained=True requested for '{model_name}' but no ImageNet "
        f"checkpoint is available: searched {search_dirs()} and download "
        f"failed (offline?). Place the lukemelas release file "
        f"({os.path.basename(url) if url else model_name + '.pth'}) in one "
        f"of those directories or set ${ENV_DIR}. Refusing to silently "
        "train from random init (reference efficientnet_utils.py:643-674).")


def load_imagenet_backbone(model_name: str,
                           weights_path: Optional[str] = None) -> Dict:
    """Resolve + convert an ImageNet checkpoint to this framework's flat
    param dict, with the reference's `load_fc=False` semantics: the
    classifier head is dropped (efficientnet.py:445,
    efficientnet_utils.py:669-674). Keys are backbone-relative (no prefix).
    """
    path = resolve_pretrained(model_name, weights_path)
    if path.endswith(".npz"):
        from hyperseg_tpu.core.checkpoint import load_params
        loaded, _ = load_params(path)
    else:
        from hyperseg_tpu.core.torch_import import load_torch_checkpoint
        loaded, _ = load_torch_checkpoint(path)
    return {k: v for k, v in loaded.items()
            if not k.startswith("_fc.")}


def stage_pretrained_backbone(model, model_name: str, pretrained) -> None:
    """Attach ImageNet backbone weights to a HyperGen (or bare EfficientNet)
    for application at `init()`. `pretrained` is False (no-op), True
    (resolve/download), or an explicit checkpoint path. Raises when
    unsatisfiable — never a silent random init."""
    if not pretrained:
        return
    path = pretrained if isinstance(pretrained, str) else None
    loaded = load_imagenet_backbone(model_name, path)
    if hasattr(model, "backbone"):  # HyperGen: keys live under 'backbone.'
        loaded = {f"backbone.{k}": v for k, v in loaded.items()}
    model._pretrained_backbone = loaded
