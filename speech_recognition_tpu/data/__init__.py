from .audio import decode_pcm, decode_wav, load_audio_file
from .dataset import (
    filter_example,
    get_dataset,
    get_tfrecord_dataset,
    map_stream,
    padded_batch,
    read_tsv_rows,
    shuffle_stream,
    slice_example,
)
from .tokenizer import SentencePieceTokenizer

__all__ = [
    "decode_pcm",
    "decode_wav",
    "load_audio_file",
    "filter_example",
    "get_dataset",
    "get_tfrecord_dataset",
    "map_stream",
    "padded_batch",
    "read_tsv_rows",
    "shuffle_stream",
    "slice_example",
    "SentencePieceTokenizer",
]
