from aps_tpu.io.audio import (AudioReader, SegmentAudioReader,
                              add_room_response, group_segments, read_audio,
                              write_audio)
from aps_tpu.io.base import BaseReader
from aps_tpu.io.text import NbestReader, TextReader, io_wrapper

__all__ = [
    "AudioReader", "SegmentAudioReader", "add_room_response",
    "group_segments", "read_audio", "write_audio", "BaseReader",
    "NbestReader", "TextReader", "io_wrapper"
]
