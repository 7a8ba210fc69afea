"""Checkpoint IO (Orbax).

Replaces Keras ModelCheckpoint/load_weights (reference run/train.py:152-154,
208-212; run/evaluate.py:78).  Checkpoints are weights-only pytrees
{'params', 'batch_stats'} saved per epoch under templated directory names,
mirroring the reference's naming scheme.  A separate converter
(speech_recognition_tpu/compat/tf_checkpoint.py) loads the reference's TF2
checkpoints into the same pytree layout.
"""

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_weights(path: str, variables: Any) -> None:
    """Save {'params': ..., 'batch_stats': ...} to ``path`` (a directory)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.tree_util.tree_map(np.asarray, variables), force=True)


def restore_weights(path: str, template: Optional[Any] = None) -> Any:
    """Restore a weights pytree; with ``template``, restores with matching
    structure/dtypes (recommended)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if template is not None:
        restored = _checkpointer().restore(path, item=jax.tree_util.tree_map(np.asarray, template))
    else:
        restored = _checkpointer().restore(path)
    return restored


def latest_checkpoint(directory: str) -> Optional[str]:
    """Return the newest checkpoint directory under ``directory``, if any."""
    if not os.path.isdir(directory):
        return None
    entries = [
        os.path.join(directory, d)
        for d in os.listdir(directory)
        if os.path.isdir(os.path.join(directory, d))
    ]
    return max(entries, key=os.path.getmtime) if entries else None
