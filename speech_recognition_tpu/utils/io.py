"""Filesystem helpers that are transparent to ``gs://`` object-store paths.

The reference routed all IO through ``tf.io.gfile`` (reference utils.py:116-120,
run/train.py:53-60).  Here local paths use the stdlib; ``gs://`` paths go to
the native TF-free GCS client (utils/gcs.py — JSON API over urllib) whenever
it can authenticate (emulator, explicit token, metadata server, ADC), with
``tf.io.gfile`` as a fallback for exotic auth setups.  The core framework
carries no TF dependency.
"""

import glob as _glob
import os
import shutil
from typing import Iterable, List


def is_remote(path: str) -> bool:
    return isinstance(path, str) and path.startswith("gs://")


def _gcs_native():
    """The native client module when it can authenticate, else None."""
    if os.environ.get("SRT_GCS_NATIVE", "1") != "1":
        return None
    from . import gcs

    return gcs if gcs.available() else None


def _gfile():
    try:
        from tensorflow.io import gfile  # type: ignore

        return gfile
    except Exception as e:  # pragma: no cover - only hit without TF
        raise NotImplementedError(
            "gs:// paths require GCS credentials for the native client "
            "(utils/gcs.py: STORAGE_EMULATOR_HOST / GCS_OAUTH_TOKEN / metadata "
            "server / application default credentials) or tensorflow.io.gfile"
        ) from e


def path_join(*paths: str) -> str:
    """Join paths; '/'-join for gs:// (reference utils.py:116-120)."""
    if paths and is_remote(paths[0]):
        return "/".join(p.rstrip("/") for p in paths)
    return os.path.join(*paths)


def open_file(path: str, mode: str = "r"):
    if is_remote(path):
        gcs = _gcs_native()
        if gcs is not None:
            return gcs.GFile(path, mode)
        return _gfile().GFile(path, mode)
    return open(path, mode)


def glob(pattern: str) -> List[str]:
    if is_remote(pattern):
        gcs = _gcs_native()
        if gcs is not None:
            return gcs.glob(pattern)
        return sorted(_gfile().glob(pattern))
    return sorted(_glob.glob(pattern))


def makedirs(path: str) -> None:
    if is_remote(path):
        gcs = _gcs_native()
        if gcs is not None:
            gcs.makedirs(path)
        else:
            _gfile().makedirs(path)
    else:
        os.makedirs(path, exist_ok=True)


def copy(src: str, dst: str, overwrite: bool = True) -> None:
    if is_remote(src) or is_remote(dst):
        gcs = _gcs_native()
        if gcs is not None:
            gcs.copy(src, dst, overwrite=overwrite)
        else:
            _gfile().copy(src, dst, overwrite=overwrite)
    else:
        shutil.copy(src, dst)


def exists(path: str) -> bool:
    if is_remote(path):
        gcs = _gcs_native()
        if gcs is not None:
            return gcs.exists(path)
        return _gfile().exists(path)
    return os.path.exists(path)


def walk_files(directory: str) -> List[str]:
    """All file paths under ``directory``, recursively (full paths).

    For gs:// this is one objects.list over the prefix (zero-byte directory
    marker objects are skipped); locally it is os.walk.
    """
    directory = directory.rstrip("/")
    if is_remote(directory):
        gcs = _gcs_native()
        if gcs is not None:
            from .gcs import _split  # noqa: local import to keep io TF-free

            bucket, prefix = _split(directory)
            # bucket root has an empty prefix; "/" would match nothing
            list_prefix = prefix + "/" if prefix else ""
            return sorted(
                f"gs://{bucket}/{name}"
                for name in gcs.list_objects(bucket, list_prefix)
                if not name.endswith("/")
            )
        gfile = _gfile()
        out = []
        for root, _dirs, files in gfile.walk(directory):
            out += [path_join(root, f) for f in files]
        return sorted(out)
    out = []
    for root, _dirs, files in os.walk(directory):
        out += [os.path.join(root, f) for f in files]
    return sorted(out)


def copy_tree(src: str, dst: str) -> None:
    """Recursively copy the file tree at ``src`` to ``dst``; either side may
    be local or gs://.  Replaces the Keras/gfile checkpoint upload path
    (reference run/train.py:208-212 checkpointed straight to gs:// through
    tf.io.gfile)."""
    src = src.rstrip("/")
    dst = dst.rstrip("/")
    if not is_remote(dst):
        os.makedirs(dst, exist_ok=True)
    for f in walk_files(src):
        rel = f[len(src) + 1 :]
        target = path_join(dst, rel)
        if not is_remote(target):
            os.makedirs(os.path.dirname(target), exist_ok=True)
        copy(f, target)
