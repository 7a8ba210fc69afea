"""Filesystem helpers that are transparent to ``gs://`` object-store paths.

The reference routed all IO through ``tf.io.gfile`` (reference utils.py:116-120,
run/train.py:53-60).  Here local paths use the stdlib; ``gs://`` paths are
delegated to ``tf.io.gfile`` only if TensorFlow happens to be importable —
the core framework carries no TF dependency.
"""

import glob as _glob
import os
import shutil
from typing import Iterable, List


def is_remote(path: str) -> bool:
    return isinstance(path, str) and path.startswith("gs://")


def _gfile():
    try:
        from tensorflow.io import gfile  # type: ignore

        return gfile
    except Exception as e:  # pragma: no cover - only hit without TF
        raise NotImplementedError(
            "gs:// paths require a GCS backend (tensorflow.io.gfile) which is unavailable"
        ) from e


def path_join(*paths: str) -> str:
    """Join paths; '/'-join for gs:// (reference utils.py:116-120)."""
    if paths and is_remote(paths[0]):
        return "/".join(p.rstrip("/") for p in paths)
    return os.path.join(*paths)


def open_file(path: str, mode: str = "r"):
    if is_remote(path):
        return _gfile().GFile(path, mode)
    return open(path, mode)


def glob(pattern: str) -> List[str]:
    if is_remote(pattern):
        return sorted(_gfile().glob(pattern))
    return sorted(_glob.glob(pattern))


def makedirs(path: str) -> None:
    if is_remote(path):
        _gfile().makedirs(path)
    else:
        os.makedirs(path, exist_ok=True)


def copy(src: str, dst: str, overwrite: bool = True) -> None:
    if is_remote(src) or is_remote(dst):
        _gfile().copy(src, dst, overwrite=overwrite)
    else:
        shutil.copy(src, dst)


def exists(path: str) -> bool:
    if is_remote(path):
        return _gfile().exists(path)
    return os.path.exists(path)
