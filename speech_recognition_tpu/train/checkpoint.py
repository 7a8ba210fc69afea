"""Checkpoint IO (Orbax), local and gs://.

Replaces Keras ModelCheckpoint/load_weights (reference run/train.py:152-154,
208-212; run/evaluate.py:78).  Checkpoints are weights-only pytrees
{'params', 'batch_stats'} saved per epoch under templated directory names,
mirroring the reference's naming scheme.  A separate converter
(speech_recognition_tpu/compat/tf_checkpoint.py) loads the reference's TF2
checkpoints into the same pytree layout.

gs:// parity: the reference trained with ``--output-path gs://...`` and
restored checkpoints remotely through tf.io.gfile (reference
run/train.py:208-212, run/evaluate.py:78, utils.py:116-120).  Here remote
checkpoints stage through a local temporary directory: save writes the
orbax tree locally then uploads it file-by-file via utils.io (native GCS
JSON-API client, no TF); restore downloads the tree then restores locally.
``latest_checkpoint`` lists either os.listdir (local) or the object store
(remote), ordering by the epoch number embedded in the templated name
(``model-{epoch}epoch...``) with mtime/object-updated as the fallback, so
``--auto-resume`` works against both backends.
"""

import os
import re
import shutil
import tempfile
from typing import Any, List, Optional

import jax
import numpy as np

from ..utils import io as uio

_EPOCH_RX = re.compile(r"model-(\d+)epoch")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_weights(path: str, variables: Any) -> None:
    """Save {'params': ..., 'batch_stats': ...} to ``path`` (a directory,
    local or gs://).

    Multi-process: EVERY process must call this (orbax synchronizes across
    processes inside ``save`` and only the primary host touches the
    filesystem; a process-0-only call blocks the primary at the barrier
    forever — pinned by tests/test_multihost_process.py).  For gs:// paths
    the upload itself is primary-host-only on top of that.
    """
    variables = jax.tree_util.tree_map(np.asarray, variables)
    if uio.is_remote(path):
        staging = tempfile.mkdtemp(prefix="srt-ckpt-save-")
        try:
            local = os.path.join(staging, "ckpt")
            _checkpointer().save(local, variables, force=True)
            if jax.process_index() == 0:
                uio.copy_tree(local, path)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return
    _checkpointer().save(os.path.abspath(path), variables, force=True)


def restore_weights(path: str, template: Optional[Any] = None) -> Any:
    """Restore a weights pytree from a local or gs:// directory; with
    ``template``, restores with matching structure/dtypes (recommended)."""
    if uio.is_remote(path):
        staging = tempfile.mkdtemp(prefix="srt-ckpt-restore-")
        try:
            local = os.path.join(staging, "ckpt")
            uio.copy_tree(path, local)
            return restore_weights(local, template)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    path = os.path.abspath(path)
    if template is not None:
        return _checkpointer().restore(path, item=jax.tree_util.tree_map(np.asarray, template))
    return _checkpointer().restore(path)


def _pick_latest(entries: List[tuple]) -> Optional[str]:
    """Pick the newest checkpoint among ``(path, timestamp)`` pairs.

    Templated names (``model-{N}epoch...``) order by epoch number — a
    lexicographic or mtime fallback would rank model-9epoch over
    model-10epoch after a clock skew.  A NON-templated entry that is
    strictly newer than the newest templated one still wins: a converted
    release checkpoint dropped into a resume directory must not be
    silently skipped in favor of an older templated save (round-4 advisor
    finding).  Entries with no usable timestamp carry ts 0.0 and can only
    win when nothing is templated."""
    if not entries:
        return None
    templated = [
        (int(m.group(1)), p, ts)
        for p, ts in entries
        for m in [_EPOCH_RX.search(os.path.basename(p))]
        if m
    ]
    if not templated:
        return max(entries, key=lambda e: (e[1], e[0]))[0]
    best_epoch, best_path, best_ts = max(templated)
    newer = [
        (ts, p)
        for p, ts in entries
        if not _EPOCH_RX.search(os.path.basename(p)) and ts > best_ts
    ]
    if newer:
        return max(newer)[1]
    return best_path


def _remote_latest(directory: str) -> Optional[str]:
    """List immediate child 'directories' of a gs:// prefix; newest by epoch
    number, falling back to the objects' ``updated`` timestamps."""
    from ..utils import gcs

    directory = directory.rstrip("/")
    bucket, prefix = gcs._split(directory)
    items = gcs.list_objects_meta(bucket, prefix + "/" if prefix else "")
    children = {}  # immediate child name -> newest `updated` below it
    strip = len(prefix) + 1 if prefix else 0
    for item in items:
        rel = item["name"][strip:]
        if "/" not in rel:
            continue  # plain file directly under the directory
        child = rel.split("/", 1)[0]
        ts = gcs.parse_rfc3339(item.get("updated", ""))
        children[child] = max(children.get(child, 0.0), ts)
    if not children:
        return None
    return _pick_latest([(f"{directory}/{c}", ts) for c, ts in children.items()])


def latest_checkpoint(directory: str) -> Optional[str]:
    """Return the newest checkpoint directory under ``directory`` (local or
    gs://), if any."""
    if uio.is_remote(directory):
        if uio._gcs_native() is not None:
            return _remote_latest(directory)
        gfile = uio._gfile()
        if not gfile.exists(directory):
            return None

        def _gfile_ts(p):
            try:
                return float(gfile.stat(p).mtime_nsec) / 1e9
            except Exception:
                return 0.0

        entries = [
            (path, _gfile_ts(path))
            for d in gfile.listdir(directory)
            for path in [uio.path_join(directory, d.rstrip("/"))]
            if gfile.isdir(path)
        ]
        return _pick_latest(entries)
    if not os.path.isdir(directory):
        return None
    entries = [
        (path, os.path.getmtime(path))
        for d in os.listdir(directory)
        for path in [os.path.join(directory, d)]
        if os.path.isdir(path)
    ]
    return _pick_latest(entries)
