from .tf_checkpoint import convert_tf_checkpoint, save_tf_checkpoint, to_tf_checkpoint

__all__ = ["convert_tf_checkpoint", "save_tf_checkpoint", "to_tf_checkpoint"]
