#!/usr/bin/env python
"""Subword (sentencepiece) tokenizer.

Parity surface: /root/reference/aps/tokenizer/subword.py. The sentencepiece
package is optional in this image; construction raises a clear error when it
is absent."""

from typing import List, Union

from aps_tpu.libs import ApsRegisters
from aps_tpu.tokenizer.base import TokenizerAbc


@ApsRegisters.tokenizer.register("subword")
class SubwordTokenizer(TokenizerAbc):
    """Word-piece tokenizer backed by a trained sentencepiece model."""

    def __init__(self, spm: str = "", filter_words: List[str] = []):
        super(SubwordTokenizer, self).__init__()
        try:
            import sentencepiece as sp
        except ImportError as e:
            raise ImportError(
                "SubwordTokenizer requires the 'sentencepiece' package, "
                "which is not installed in this environment") from e
        if not spm:
            raise ValueError("SubwordTokenizer: pass spm=/path/to/model")
        self.sp_mdl = sp.SentencePieceProcessor(model_file=spm)
        self.filter_words = filter_words

    def encode(self, utt: Union[str, List[str]]) -> List[str]:
        if isinstance(utt, list):
            utt = " ".join([t for t in utt if t not in self.filter_words])
        return self.sp_mdl.encode(utt, out_type=str)

    def decode(self, utt: Union[str, List[str]]) -> List[str]:
        if isinstance(utt, str):
            utt = utt.split()
        return self.sp_mdl.decode(utt).split()
