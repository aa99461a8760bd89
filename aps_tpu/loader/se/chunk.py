#!/usr/bin/env python
"""Audio-chunk dataloader for enhancement/separation training.

Parity surface: /root/reference/aps/loader/se/chunk.py (ScriptDataset:85,
ChunkSplitter:165, WaveChunkDataLoader:250, registered "se@chunk").
Fixed-size chunks are naturally static-shaped — ideal for XLA."""

import random
from typing import Dict, Iterable, Iterator, List, Union

import numpy as np

import aps_tpu.distributed as dist
from aps_tpu.io.audio import AudioReader
from aps_tpu.io.base import BaseReader
from aps_tpu.libs import ApsRegisters
from aps_tpu.loader.utils import derive_indices


@ApsRegisters.loader.register("se@chunk")
def DataLoader(train: bool = True,
               sr: int = 16000,
               mix_scp: str = "",
               doa_scp: str = "",
               ref_scp: str = "",
               emb_scp: str = "",
               chunk_size: int = 64000,
               max_batch_size: int = 16,
               distributed: bool = False,
               num_workers: int = 4) -> Iterable[Dict]:
    """Chunked waveform loader; scp args may be comma-separated lists for
    multiple speakers. Egs: {mix: N x (C x) S, ref: N x S or [N x S, ...]}."""
    if not mix_scp:
        raise RuntimeError("mix_scp can not be None")

    def parse_args(scp_str):
        if not scp_str:
            return scp_str
        token = scp_str.split(",")
        return token[0] if len(token) == 1 else list(token)

    dataset = ScriptDataset(sr=sr,
                            mix_scp=mix_scp,
                            emb_scp=emb_scp,
                            doa_scp=parse_args(doa_scp),
                            ref_scp=parse_args(ref_scp))
    return WaveChunkDataLoader(dataset,
                               train=train,
                               chunk_size=chunk_size,
                               batch_size=max_batch_size,
                               num_workers=num_workers,
                               distributed=distributed)


class NumpyReader(BaseReader):
    """Reader over an scp of .npy paths."""

    def _load(self, key: str) -> np.ndarray:
        return np.load(self.index_dict[key])


class ScriptDataset(object):
    """Dataset configured by (mix, ref, doa, emb) scp files."""

    def __init__(self,
                 mix_scp: str = "",
                 doa_scp: Union[str, List[str]] = "",
                 emb_scp: str = "",
                 ref_scp: Union[str, List[str]] = "",
                 sr: int = 16000) -> None:
        self.mix = AudioReader(mix_scp, sr=sr)
        if isinstance(ref_scp, list):
            self.ref = [AudioReader(ref, sr=sr) for ref in ref_scp]
            self.num_ref = len(ref_scp)
        elif ref_scp:
            self.ref = AudioReader(ref_scp, sr=sr)
            self.num_ref = 1
        else:
            self.ref, self.num_ref = None, 0
        if isinstance(doa_scp, list):
            self.doa = [
                BaseReader(doa, value_processor=lambda x: np.float32(x))
                for doa in doa_scp
            ]
            self.num_doa = len(doa_scp)
        elif doa_scp:
            self.doa = BaseReader(doa_scp,
                                  value_processor=lambda x: np.float32(x))
            self.num_doa = 1
        else:
            self.doa, self.num_doa = None, 0
        self.emb = NumpyReader(emb_scp) if emb_scp else None

    def _idx(self, key: str) -> Dict:
        eg = {}
        if self.ref is not None:
            eg["ref"] = (self.ref[key] if self.num_ref == 1 else
                         [r[key] for r in self.ref])
        if self.doa is not None:
            eg["doa"] = (self.doa[key] if self.num_doa == 1 else
                         [r[key] for r in self.doa])
        if self.emb is not None:
            eg["emb"] = self.emb[key]
        return eg

    def __getitem__(self, index: int) -> Dict:
        key = self.mix.index_keys[index]
        eg = self._idx(key)
        eg["mix"] = self.mix[key]
        return eg

    def __len__(self) -> int:
        return len(self.mix)

    def __iter__(self) -> Iterator[Dict]:
        for key, mix in self.mix:
            eg = self._idx(key)
            eg["mix"] = mix
            yield eg


class ChunkSplitter(object):
    """Split utterances into fixed-size chunks (pad short, hop long)."""

    def __init__(self, chunk_size: int, train: bool = True,
                 hop: int = 16000) -> None:
        self.chunk_size = chunk_size
        self.hop = hop
        self.train = train

    def _chunk(self, mat_or_seq, s: int):
        if isinstance(mat_or_seq, list):
            return [m[..., s:s + self.chunk_size] for m in mat_or_seq]
        return mat_or_seq[..., s:s + self.chunk_size]

    def _pad(self, mat_or_seq, pad_width: int):

        def pad1(mat):
            widths = [(0, 0)] * (mat.ndim - 1) + [(0, pad_width)]
            return np.pad(mat, widths, "constant")

        if isinstance(mat_or_seq, list):
            return [pad1(m) for m in mat_or_seq]
        return pad1(mat_or_seq)

    def _make_chunk(self, eg: Dict, s: int) -> Dict:
        chunk = {"mix": eg["mix"][..., s:s + self.chunk_size]}
        if "ref" in eg:
            chunk["ref"] = self._chunk(eg["ref"], s)
        for k in ("doa", "emb"):
            if k in eg:
                chunk[k] = eg[k]
        return chunk

    def split(self, eg: Dict) -> List[Dict]:
        N = eg["mix"].shape[-1]
        if N < self.hop:
            return []
        chunks = []
        if N < self.chunk_size:
            P = self.chunk_size - N
            chunk = {"mix": self._pad(eg["mix"], P)}
            if "ref" in eg:
                chunk["ref"] = self._pad(eg["ref"], P)
            for k in ("doa", "emb"):
                if k in eg:
                    chunk[k] = eg[k]
            chunks.append(chunk)
        else:
            s = random.randint(0, N % self.hop) if self.train else 0
            while s + self.chunk_size <= N:
                chunks.append(self._make_chunk(eg, s))
                s += self.hop
        return chunks


def _default_collate(chunks: List[Dict]) -> Dict:
    """Stack a list of chunk dicts into batched numpy arrays."""
    out = {}
    peek = chunks[0]
    for k in peek:
        if isinstance(peek[k], list):
            out[k] = [
                np.stack([np.asarray(c[k][i]) for c in chunks]).astype(
                    np.float32) for i in range(len(peek[k]))
            ]
        elif isinstance(peek[k], np.ndarray):
            out[k] = np.stack([c[k] for c in chunks]).astype(np.float32)
        else:
            out[k] = np.asarray([c[k] for c in chunks])
    return out


class WaveChunkDataLoader(object):
    """Chunk-splitting dataloader: iterates utterances (rank-sharded and
    epoch-shuffled), splits into fixed chunks, emits full batches."""

    def __init__(self,
                 dataset,
                 num_workers: int = 4,
                 chunk_size: int = 64000,
                 batch_size: int = 16,
                 distributed: bool = False,
                 train: bool = True) -> None:
        self.dataset = dataset
        self.train = train
        self.batch_size = batch_size
        self.distributed = distributed
        self.splitter = ChunkSplitter(chunk_size, train=train,
                                      hop=chunk_size // 2)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return 0

    def _utt_indices(self):
        n = len(self.dataset)
        world = dist.world_size() if self.distributed else 1
        return derive_indices(n // world if self.distributed else n,
                              seed=self.epoch,
                              shuffle=self.train,
                              distributed=self.distributed)

    def __iter__(self) -> Iterator[Dict]:
        chunk_list = []
        for idx in self._utt_indices():
            eg = self.dataset[idx]
            if isinstance(eg, list):
                for sub in eg:
                    chunk_list += self.splitter.split(sub)
            else:
                chunk_list += self.splitter.split(eg)
            while len(chunk_list) >= self.batch_size:
                if self.train:
                    random.shuffle(chunk_list)
                batch, chunk_list = (chunk_list[:self.batch_size],
                                     chunk_list[self.batch_size:])
                obj = _default_collate(batch)
                obj["#utt"] = self.batch_size
                yield obj
