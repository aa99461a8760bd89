#!/usr/bin/env python
"""Kaldi-feature AM dataloader (parity: /root/reference/aps/loader/am/kaldi.py,
registered "am@kaldi"). Reads feats.scp via our own kaldi binary matrix
reader; utt2dur counts feature frames; src_pad is N x T x F."""

from typing import Dict, Iterable, Optional

import numpy as np

from aps_tpu.libs import ApsRegisters
from aps_tpu.loader.am.utils import (CommonASRDataLoader, CommonASRDataset,
                                     asr_egs_collate)
from aps_tpu.loader.kaldi_io import ScriptReader
from aps_tpu.loader.utils import quantize_len


@ApsRegisters.loader.register("am@kaldi")
def DataLoader(train: bool = True,
               distributed: bool = False,
               feats_scp: str = "",
               text: str = "",
               utt2num_frames: str = "",
               vocab_dict: Optional[Dict] = None,
               tokenizer: str = "",
               tokenizer_kwargs: Dict = {},
               min_token_num: int = 1,
               max_token_num: int = 400,
               max_dur: float = 3000,
               min_dur: float = 40,
               adapt_dur: float = 800,
               adapt_token_num: int = 150,
               skip_utts: str = "",
               batch_mode: str = "adaptive",
               num_workers: int = 0,
               max_batch_size: int = 32,
               min_batch_size: int = 4) -> Iterable[Dict]:
    feats_reader = ScriptReader(feats_scp)
    dataset = CommonASRDataset(feats_reader,
                               text,
                               utt2num_frames,
                               vocab_dict,
                               tokenizer=tokenizer,
                               tokenizer_kwargs=tokenizer_kwargs,
                               max_dur=max_dur,
                               min_dur=min_dur,
                               dur_axis=0,
                               skip_utts=skip_utts,
                               min_token_num=min_token_num,
                               max_token_num=max_token_num)

    # feature matrices are T x F: pad along axis 0 (time)
    def collate(egs):
        src_q = lambda n: quantize_len(n, floor=50, multiple=8, factor=1.2)
        tgt_q = lambda n: quantize_len(n, multiple=8, factor=1.0)
        from aps_tpu.const import IGNORE_ID
        from aps_tpu.loader.utils import pad_seqs
        src = [np.asarray(eg["inp"], dtype=np.float32) for eg in egs]
        tgt = [np.asarray(eg["ref"], dtype=np.int64) for eg in egs]
        return {
            "#utt": len(egs),
            "#tok": sum(int(eg["len"]) + 1 for eg in egs),
            "src_pad": pad_seqs(src, value=0, axis=0, len_quantize=src_q),
            "tgt_pad": pad_seqs(tgt, value=IGNORE_ID, axis=-1,
                                len_quantize=tgt_q),
            "src_len": np.asarray([eg["dur"] for eg in egs], dtype=np.int64),
            "tgt_len": np.asarray([eg["len"] for eg in egs], dtype=np.int64),
        }

    return CommonASRDataLoader(dataset,
                               collate_fn=collate,
                               shuffle=train,
                               distributed=distributed,
                               num_workers=num_workers,
                               adapt_dur=adapt_dur,
                               adapt_token_num=adapt_token_num,
                               batch_mode=batch_mode,
                               max_batch_size=max_batch_size,
                               min_batch_size=min_batch_size)
