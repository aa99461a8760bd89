#!/usr/bin/env python
"""Host-side dataloader machinery shared by all loaders.

Parity surface: /root/reference/aps/loader/am/utils.py (derive_indices:17,
BatchSampler:208, CommonASRDataLoader:313) — re-built without torch:
datasets are plain python objects, batching/sharding is identical
(deterministic rank-strided index lists seeded by epoch), and a thread pool
replaces torch DataLoader workers.

TPU-specific addition: shape bucketing. XLA compiles one program per input
shape, so collate pads sequence lengths up to a geometric bucket grid
(quantize_len) instead of the batch max — this bounds the number of compiled
programs while wasting <25% padding FLOPs worst-case."""

import queue
import threading
from typing import Callable, Iterable, List, Optional

import numpy as np

import aps_tpu.distributed as dist


def derive_indices(num_batches: int,
                   seed: int = 0,
                   shuffle: bool = True,
                   distributed: bool = False) -> List[int]:
    """Deterministic (seeded) shuffled batch order; in distributed mode each
    process takes a rank-strided subset of the global order."""
    if distributed:
        rank = dist.rank()
        world_size = dist.world_size()
        num_batches = num_batches * world_size
    if shuffle:
        g = np.random.default_rng(seed)
        indices = g.permutation(num_batches).tolist()
    else:
        indices = list(range(num_batches))
    if distributed:
        return indices[rank:num_batches:world_size]
    return indices


def quantize_len(n: int,
                 floor: int = 1,
                 multiple: int = 1,
                 factor: float = 1.25) -> int:
    """Round n up onto a bounded geometric grid: the smallest value
    >= n of the form ceil(floor * factor^k) rounded up to `multiple`."""
    roundup = lambda x: -(-x // multiple) * multiple
    if factor <= 1.0:
        # plain round-up-to-multiple
        return roundup(max(n, floor))
    v = max(floor, multiple)
    r = roundup(v)
    while r < n:
        v = max(int(v * factor), v + 1)
        r = roundup(v)
    return r


def pad_seqs(seqs: List[np.ndarray],
             value: float = 0,
             axis: int = -1,
             max_len: Optional[int] = None,
             len_quantize: Optional[Callable[[int], int]] = None,
             dtype=None) -> np.ndarray:
    """Stack variable-length arrays into a padded batch along `axis`
    (the sequence axis). Other dims must agree."""
    lens = [s.shape[axis] for s in seqs]
    tgt = max(lens) if max_len is None else max_len
    if len_quantize is not None:
        tgt = len_quantize(tgt)
    out_shape = list(seqs[0].shape)
    out_shape[axis] = tgt
    out = np.full([len(seqs)] + out_shape,
                  value,
                  dtype=dtype or seqs[0].dtype)
    for i, s in enumerate(seqs):
        sl = [slice(None)] * s.ndim
        sl[axis if axis >= 0 else s.ndim + axis] = slice(0, s.shape[axis])
        out[(i, *sl)] = s
    return out


class BatchSampler(object):
    """Adaptive/constraint batch index sampler over a length-sorted dataset.

    adaptive: cur_bz = max(min_bz, max_bz // (1 + factor)),
              factor = max(dur // adapt_dur, (len-1) // adapt_token_num)
    constraint: sum of durations per batch <= max_batch_size."""

    def __init__(self,
                 dataset,
                 max_batch_size: int,
                 shuffle: bool = False,
                 batch_mode: str = "adaptive",
                 adapt_dur: float = 800,
                 adapt_token_num: int = 150,
                 min_batch_size: int = 4,
                 distributed: bool = False) -> None:
        if batch_mode not in ("adaptive", "constraint"):
            raise ValueError(f"Unsupported batch mode: {batch_mode}")
        stats = [dataset.token_reader[i] for i in range(len(dataset))]
        if batch_mode == "adaptive":
            batches = self._adapt(stats, adapt_dur, adapt_token_num,
                                  max_batch_size, min_batch_size)
        else:
            batches = self._const(stats, max_batch_size)
        self.epoch = 0
        self.batches = batches
        self.shuffle = shuffle
        self.world_size = dist.world_size() if distributed else 1
        self.distributed = distributed
        self.num_batches = len(batches) // self.world_size

    def _const(self, stats, max_batch_size):
        beg, cur_dur, out = 0, 0, []
        if stats and stats[0]["dur"] > max_batch_size:
            raise ValueError("batch_size is smaller than the longest utt")
        for idx, cur in enumerate(stats):
            if cur_dur < max_batch_size:
                cur_dur += cur["dur"]
            else:
                out.append((beg, idx))
                cur_dur = cur["dur"]
                beg = idx
        if len(stats) - beg > 1:
            out.append((beg, len(stats)))
        return out

    def _adapt(self, stats, adapt_dur, adapt_num, max_bz, min_bz):
        beg, out = 0, []
        tot = len(stats)
        while beg < tot:
            cur = stats[beg]
            factor = max(int(cur["dur"] // adapt_dur),
                         (cur["len"] - 1) // adapt_num)
            cur_bz = int(max(min_bz, max_bz // (1 + factor)))
            out.append((beg, min(beg + cur_bz, tot)))
            beg += cur_bz
        return out

    def __iter__(self):
        indices = derive_indices(self.num_batches,
                                 seed=self.epoch,
                                 shuffle=self.shuffle,
                                 distributed=self.distributed)
        for i in indices:
            beg, end = self.batches[i]
            yield list(range(beg, end))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.num_batches


class SimpleDataLoader(object):
    """Map batches of dataset items through a collate function, optionally
    prefetching with a worker pool (keeps the TPU fed while the host
    decodes/simulates audio).

    num_workers <= 0 runs inline; 1 uses a single background prefetch
    thread; >= 2 builds batches concurrently on a thread pool while
    preserving batch order (a bounded window of in-flight futures).
    Threads — not processes — are the right pool here: the hot host work
    (audio decode, fftconvolve RIRs, np.pad/stack collate) releases the
    GIL, and thread workers share the dataset/sampler state that
    process workers would have to re-pickle every epoch."""

    def __init__(self,
                 dataset,
                 sampler,
                 collate_fn: Callable,
                 num_workers: int = 0,
                 prefetch: int = 4):
        self.dataset = dataset
        self.sampler = sampler
        self.collate_fn = collate_fn
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 2)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.sampler)

    def _build(self, batch_indices):
        return self.collate_fn([self.dataset[i] for i in batch_indices])

    def _produce(self):
        for batch_indices in self.sampler:
            yield self._build(batch_indices)

    def _iter_pool(self):
        """Ordered pipeline over a thread pool: up to num_workers batches
        build concurrently, at most num_workers + prefetch in flight."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        window = self.num_workers + self.prefetch
        with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
            pending = deque()
            it = iter(self.sampler)
            try:
                for batch_indices in it:
                    pending.append(ex.submit(self._build, batch_indices))
                    if len(pending) >= window:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
            finally:
                for f in pending:  # consumer bailed early / worker raised
                    f.cancel()

    def __iter__(self):
        if self.num_workers <= 0:
            yield from self._produce()
            return
        if self.num_workers >= 2:
            yield from self._iter_pool()
            return
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []

        def worker():
            try:
                for item in self._produce():
                    q.put(item)
            except Exception as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]
