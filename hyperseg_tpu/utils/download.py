"""Minimal URL fetch with graceful offline behavior.

The reference downloads pretrained backbones and datasets on demand
(efficientnet_utils.py:643-674, voc_sbd.py:102-138). This environment may
have no network egress, so every fetch here is best-effort: callers get a
bool and decide whether missing data is fatal (pretrained weights: yes;
dataset bootstrap: no, skip cleanly).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.request


def _is_within(base: str, target: str) -> bool:
    base = os.path.abspath(base)
    return os.path.commonpath([base, os.path.abspath(target)]) == base


def safe_extract_tar(tar_path: str, dest: str) -> None:
    """extractall with path-traversal protection: archives arrive over plain
    HTTP (the reference's URLs), so a tampered member like `../../x` must not
    write outside `dest`. Uses the stdlib "data" filter where available."""
    import tarfile
    with tarfile.open(tar_path) as tar:
        try:
            tar.extractall(path=dest, filter="data")
        except TypeError:  # Python < 3.12 security backport absent
            for m in tar.getmembers():
                if not _is_within(dest, os.path.join(dest, m.name)):
                    raise RuntimeError(
                        f"unsafe tar member path: {m.name!r} in {tar_path}")
                # name checks alone don't stop writing through a symlink
                # member ('link' -> /elsewhere, then 'link/payload'); the
                # datasets these archives carry contain no links, so reject
                # them outright like the 'data' filter would
                if m.issym() or m.islnk():
                    raise RuntimeError(
                        f"link member not allowed: {m.name!r} in {tar_path}")
            tar.extractall(path=dest)


def safe_extract_zip(zip_path, dest: str) -> None:
    """ZipFile.extractall with explicit member-path validation (zipfile
    already sanitizes most traversal forms, but fail loud, not quietly)."""
    from zipfile import ZipFile
    owned = isinstance(zip_path, (str, os.PathLike))
    z = ZipFile(zip_path) if owned else zip_path
    try:
        for name in z.namelist():
            if name.startswith("/") or ".." in name.split("/"):
                raise RuntimeError(f"unsafe zip member path: {name!r}")
        z.extractall(dest)
    finally:
        if owned:  # never close a caller-supplied handle
            z.close()


def download_url(url: str, dest: str, *, timeout: float = 30.0,
                 progress: bool = True) -> bool:
    """Fetch `url` to `dest` atomically. Returns False on any network error
    (offline environments must not crash the caller); raises only on local
    filesystem errors."""
    if os.path.isfile(dest):
        return True
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    tmp_fd, tmp_path = tempfile.mkstemp(dir=os.path.dirname(
        os.path.abspath(dest)), suffix=".part")
    os.close(tmp_fd)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp_path, "wb") as f:
            total = int(r.headers.get("Content-Length") or 0)
            done = 0
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
                done += len(chunk)
                if progress and total:
                    print(f"\r  {os.path.basename(dest)}: "
                          f"{done / 1e6:.1f}/{total / 1e6:.1f} MB", end="")
        if progress:
            print()
        shutil.move(tmp_path, dest)
        return True
    except (OSError, ValueError) as e:  # URLError subclasses OSError
        print(f"=> download failed ({url}): {e}")
        return False
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
