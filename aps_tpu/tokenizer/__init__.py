from aps_tpu.tokenizer.base import Tokenizer, TokenizerAbc

__all__ = ["Tokenizer", "TokenizerAbc"]
