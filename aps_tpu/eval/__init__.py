from aps_tpu.eval.asr import TextPostProcessor, TextPreProcessor
from aps_tpu.eval.sse import ChunkStitcher
from aps_tpu.eval.wrapper import NnetEvaluator, load_checkpoint

__all__ = [
    "TextPostProcessor", "TextPreProcessor", "ChunkStitcher",
    "NnetEvaluator", "load_checkpoint"
]
