#!/usr/bin/env python
"""Host-IO pipelining for the inference CLIs.

The reference's inference tools read, compute and write strictly in
sequence inside the utterance loop (/root/reference/cmd/separate.py:20-168,
cmd/decode.py) — on TPU that serializes cheap host file IO behind device
compute that runs thousands of times faster than real time. Here:

  * prefetch_iter: a bounded background-thread reader so the NEXT
    utterance's wav decode overlaps the current batch's device compute
    (JAX dispatch is async: the main thread can enqueue work while the
    reader thread blocks on disk).
  * AsyncWriter: a small thread pool for the output side (device->host
    transfer + wav/npy encode + file write happen off the main thread);
    errors are re-raised on close so failures are not silent.

Measured on the bench config (BENCHMARKS.md "inference IO pipelining")
this lifts the full separate.py CLI from ~13x to >=50x real time while
producing byte-identical outputs.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch_iter(it: Iterable, depth: int = 8) -> Iterator:
    """Iterate `it` on a background thread, `depth` items ahead.
    Exceptions raised by the underlying iterator re-raise at the
    consuming site (wrapped), preserving fail-fast semantics. If the
    consumer abandons the generator early (GeneratorExit / exception in
    the consuming loop), the producer is signalled to stop instead of
    blocking forever on a full queue with its readers held open."""
    q = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()

    def _produce():
        try:
            for item in it:
                # bounded put, re-checking the stop flag: the consumer
                # may have gone away while the queue was full
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as exc:  # noqa: B036 - relayed to consumer
            if not stop.is_set():
                q.put((_SENTINEL, exc))
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=_produce, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, tuple) and len(item) == 2 and \
                    item[0] is _SENTINEL:
                raise item[1]
            yield item
    finally:
        stop.set()
        # unblock a producer waiting on a full queue, then let it exit
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        thread.join(timeout=5.0)


class AsyncWriter(object):
    """Thread-pool writer: submit(fn, *args) runs fn off-thread; close()
    drains and re-raises the first failure."""

    def __init__(self, workers: int = 4):
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._futures = []

    def submit(self, fn, *args, **kwargs) -> None:
        self._futures.append(self._pool.submit(fn, *args, **kwargs))

    def close(self) -> None:
        try:
            for fut in self._futures:
                fut.result()  # re-raise worker exceptions here
        finally:
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        # on error paths still drain the pool, but don't mask the
        # original exception with a worker one
        if exc_type is None:
            self.close()
        else:
            self._pool.shutdown(wait=False, cancel_futures=True)
        return False
