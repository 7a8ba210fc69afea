"""MP3 decoding (gated).

MPEG-1 Layer III entropy/IMDCT decoding is host-side work the reference
delegated to tensorflow-io's bundled minimp3 (reference: speech_recognition/
data.py:106-107).  This build decodes mp3 through an external ``ffmpeg``
binary when present; otherwise raises with a clear message.  wav/flac/pcm
are decoded natively in-framework (see audio.py / flac.py).
"""

import shutil
import struct
import subprocess
from typing import Tuple

import numpy as np


def decode_mp3_file(path: str) -> Tuple[np.ndarray, int]:
    """Decode mp3 -> (float32 [n, channels], sample_rate)."""
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise NotImplementedError(
            "mp3 decoding requires an 'ffmpeg' binary on PATH in this build; "
            "wav/flac/pcm are decoded natively"
        )
    probe = subprocess.run(
        [ffmpeg, "-i", path, "-f", "f32le", "-acodec", "pcm_f32le", "-"],
        capture_output=True,
        check=True,
    )
    audio = np.frombuffer(probe.stdout, np.float32)
    # channel count / rate parsed from stderr metadata
    stderr = probe.stderr.decode("utf-8", "replace")
    channels = 2 if " stereo" in stderr else 1
    rate = 44100
    for token in stderr.split(","):
        token = token.strip()
        if token.endswith(" Hz"):
            rate = int(token[:-3])
            break
    usable = len(audio) // channels * channels
    return audio[:usable].reshape(-1, channels), rate
