"""Asynchronous double-buffered host -> device ingest.

The reference's pipeline-parallel analogue is its read -> compute -> plot
stages split across Qt threads (SURVEY.md section 2.3, PP row). Here the
host IO stage and the device compute stage overlap explicitly: a reader
thread prefetches and assembles block k+1 (HDF5 read + native plane
packing + ``jax.device_put``) while the device computes block k. Because
JAX dispatch is async, the device_put of the next block overlaps the
in-flight computation without any further machinery.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class PrefetchFeeder:
    """Iterator wrapper: runs ``produce(i)`` for i in [0, n_blocks) on a
    background thread, keeping up to ``depth`` results (already
    device_put) queued ahead of the consumer.

    ``produce`` does the host work (read + assemble) and returns any
    pytree; arrays are device_put before queueing so the transfer also
    overlaps compute.
    """

    _SENTINEL = object()

    def __init__(self, produce: Callable[[int], object], n_blocks: int,
                 depth: int = 2, device_put: bool = True):
        self.produce = produce
        self.n_blocks = n_blocks
        self.device_put = device_put
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        try:
            import jax

            for i in range(self.n_blocks):
                if self._stop.is_set():
                    break
                item = self.produce(i)
                if self.device_put:
                    item = jax.tree_util.tree_map(
                        lambda a: jax.device_put(a)
                        if isinstance(a, np.ndarray) else a,
                        item,
                    )
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(self._SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def stream_blocks(
    ds,
    chan: str,
    start_sample: int,
    block_len: int,
    n_blocks: int,
    depth: int = 2,
):
    """Prefetching iterator of plane-major device blocks from a dataset:
    yields (nsub*2, block_len) float32/int16 arrays on device, feeding
    models.streaming.StreamingSti.push.
    """
    from pyspectrogram_tpu.models.sti import _assemblable
    from pyspectrogram_tpu.native import ingest as native_ingest

    def produce(i: int):
        s = start_sample + i * block_len
        raw = ds.reader.read_vector_raw(s, block_len, chan)
        raw = _assemblable(raw)
        return native_ingest.assemble_plane_major(
            raw, np.asarray([0], np.int64), block_len
        )

    return PrefetchFeeder(produce, n_blocks, depth=depth)
