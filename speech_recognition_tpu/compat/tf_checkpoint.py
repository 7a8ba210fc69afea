"""Convert the reference's TF2 checkpoints into this framework's pytrees.

The reference publishes trained weights as ``tf.train.Checkpoint(model)``
saves (v0.0.1 LAS-small release; also tests/data/model-checkpoints).  This
module reads them with the TF checkpoint reader (TensorFlow is required only
for conversion, never at runtime) and emits {'params', 'batch_stats'}
pytrees matching our Flax module trees — possible because the recurrent
layers deliberately keep Keras parameter layout (ops/rnn.py).

Name mapping (reference attribute paths -> our module paths):
  listener/encoder_layers/N/{forward,backward}_rnn/cell/X
      -> listener/encoder_layerN/{forward,backward}_rnn/cell/X
  listener/projection/N -> listener/projectionN
  listener/batch_norm/N -> listener/batch_normalizationN (gamma->scale,
      beta->bias; moving stats -> batch_stats collection)
  attend_and_speller/decoder_layers/N/cell/X -> attend_and_speller/decoder_layerN/X
  attend_and_speller/embedding/embeddings -> .../embedding/embedding
  convolution/conv_layers/N -> convolution/convN
  recurrent/rnn_layers/N -> recurrent/reccurent_layerN
  recurrent/batch_norm/N -> recurrent/batch_normalizationN
"""

import re
from typing import Any, Dict

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def _map_name(name: str):
    """Map a TF checkpoint key -> (collection, our '/'-joined path)."""
    name = name[: -len(_SUFFIX)] if name.endswith(_SUFFIX) else name
    name = re.sub(r"encoder_layers/(\d+)", r"encoder_layer\1", name)
    name = re.sub(r"decoder_layers/(\d+)/cell", r"decoder_layer\1", name)
    name = re.sub(r"rnn_layers/(\d+)", r"reccurent_layer\1", name)
    name = re.sub(r"projection/(\d+)", r"projection\1", name)
    name = re.sub(r"batch_norm/(\d+)", r"batch_normalization\1", name)
    name = re.sub(r"conv_layers/(\d+)", r"conv\1", name)
    name = name.replace("embedding/embeddings", "embedding/embedding")

    collection = "params"
    if name.endswith("/gamma"):
        name = name[: -len("/gamma")] + "/scale"
    elif name.endswith("/beta"):
        name = name[: -len("/beta")] + "/bias"
    elif name.endswith("/moving_mean"):
        collection = "batch_stats"
        name = name[: -len("/moving_mean")] + "/mean"
    elif name.endswith("/moving_variance"):
        collection = "batch_stats"
        name = name[: -len("/moving_variance")] + "/var"
    return collection, name


def convert_tf_checkpoint(checkpoint_path: str) -> Dict[str, Any]:
    """Read a reference TF checkpoint -> {'params': ..., 'batch_stats': ...}."""
    try:
        from tensorflow.train import load_checkpoint  # type: ignore
    except Exception as e:  # pragma: no cover
        raise ImportError("TensorFlow is required to convert TF checkpoints") from e

    reader = load_checkpoint(checkpoint_path)
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for key in reader.get_variable_to_shape_map():
        if key == "_CHECKPOINTABLE_OBJECT_GRAPH":
            continue
        # bookkeeping keys written by tf.train.Checkpoint.save / Keras
        # ModelCheckpoint (save_counter, optimizer slots) are not model
        # weights and would break the exact-structure restore template
        if key.startswith(("save_counter", "optimizer/", "optimizer_")):
            continue
        collection, path = _map_name(key)
        node = out[collection]
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = reader.get_tensor(key)
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out


def convert_and_save(checkpoint_path: str, output_path: str) -> None:
    """Convert a TF checkpoint and save it as an Orbax weights checkpoint."""
    from ..train import save_weights

    save_weights(output_path, convert_tf_checkpoint(checkpoint_path))


if __name__ == "__main__":  # python -m speech_recognition_tpu.compat.tf_checkpoint in out
    import sys

    convert_and_save(sys.argv[1], sys.argv[2])
