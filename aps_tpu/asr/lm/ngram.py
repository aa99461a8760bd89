#!/usr/bin/env python
"""kenlm n-gram LM wrapper (parity: /root/reference/aps/asr/lm/ngram.py).
Used for nbest rescoring / shallow fusion on host; the kenlm package is
optional in this image."""

from typing import List


class NgramLM(object):
    """Query-mode wrapper over a kenlm binary/arpa model."""

    def __init__(self, lm: str, vocab_dict: dict) -> None:
        try:
            import kenlm
        except ImportError as e:
            raise ImportError(
                "NgramLM requires the 'kenlm' package, which is not "
                "installed in this environment") from e
        self.ngram_lm = kenlm.Model(lm)
        self.vocab_dict = {v: k for k, v in vocab_dict.items()}

    def score(self, hypos: List[int], sos: int = -1, eos: int = -1,
              **kwargs) -> float:
        """Score an id sequence (log10 -> ln to match NN LMs)."""
        import math
        sentence = " ".join(self.vocab_dict[i] for i in hypos)
        return self.ngram_lm.score(sentence) * math.log(10)
