"""Batching, shuffling, dual-domain pairing, and device prefetch.

Replaces the reference's torch DataLoader + WrapperDataset combination
(training/base_trainer.py:275-359, datasets/wrapper_dataloader.py:4-111):

- ``BatchLoader``: map-style dataset -> shuffled, drop-last batches, with a
  thread pool for parallel ``__getitem__`` (numpy/h5py release the GIL on IO
  and memcpy, so threads scale like the reference's worker processes without
  the pickling overhead).
- ``PairedLoader``: iterates the longer of two loaders, restarting the
  shorter one on exhaustion — WrapperDataset's pairing rule
  (wrapper_dataloader.py:33-63).
- ``prefetch_to_device``: double-buffered host->HBM pipeline; the next batch
  is transferred (and optionally sharded across the mesh) while the current
  step runs, so ingest never stalls the TPU.
- Multi-host: each process constructs its loader over a disjoint index shard
  (``shard_index``/``num_shards``) — global-batch data parallelism.
"""

from __future__ import annotations

import collections
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np


def _collate(samples: list, out: Optional[Dict[str, np.ndarray]] = None
             ) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts into batch arrays.

    ``out``: optional preallocated destination dict (same keys/shapes) —
    copying into warm pages instead of np.stack's fresh allocations; on
    hosts with slow page-zeroing (measured ~100 MB/s in this sandbox vs
    multi-GB/s warm memcpy) that is the difference between the collate
    being free and it dominating the loader.

    Ghost-folded record batches ("band_offsets" present) may mix record
    capacities when a pathological sample overflowed the default margin
    and the binner grew it to the next quantized level — those keys pad
    up to the batch max (zero records / False validity are inert in the
    fold-free kernel), so collation never fails on capacity skew.
    """
    folded = "band_offsets" in samples[0]
    if out is not None:
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]):
                dst = out[key]
                if (folded and key in ("raw_events", "valid")
                        and any(v.shape != dst.shape[1:] for v in vals)):
                    out[key] = _stack_padded(vals)
                    continue
                for i, v in enumerate(vals):
                    dst[i] = v
            else:
                out[key] = vals
        return out
    result = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if not (isinstance(vals[0], np.ndarray) or np.isscalar(vals[0])):
            result[key] = vals
        elif (folded and key in ("raw_events", "valid")
                and isinstance(vals[0], np.ndarray)
                and len({v.shape for v in vals}) > 1):
            result[key] = _stack_padded(vals)
        else:
            result[key] = np.stack(vals)
    return result


def _stack_padded(vals: list) -> np.ndarray:
    """np.stack of (T, cap[, 4]) arrays whose capacity axis (1) differs:
    zero-pad each to the batch max. Used for ghost-folded record batches
    where zero-weight padding records are inert by construction."""
    cap = max(v.shape[1] for v in vals)
    out = np.zeros((len(vals), vals[0].shape[0], cap) + vals[0].shape[2:],
                   vals[0].dtype)
    for i, v in enumerate(vals):
        out[i, :, :v.shape[1]] = v
    return out


def _alloc_like(samples: list) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        v = samples[0][key]
        if isinstance(v, np.ndarray):
            out[key] = np.empty((len(samples),) + v.shape, v.dtype)
        elif np.isscalar(v):
            out[key] = np.empty((len(samples),), np.asarray(v).dtype)
    return out


class BatchLoader:
    """Shuffled, drop-last batch iterator over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 6,
        shard_index: int = 0,
        num_shards: int = 1,
        collate_buffers: int = 0,
        prefetch_size: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.rng = np.random.default_rng(seed)
        self.shard_index = shard_index
        self.num_shards = num_shards
        # ring of preallocated collate destinations. 0 (default) = fresh
        # np.stack per batch — always safe. N > 0 recycles each buffer
        # after N batches: only enable when the consumer provably finishes
        # with a batch (device_put complete, no references held) within
        # N-1 subsequent batches; prefetch depth + in-flight H2D must fit.
        if collate_buffers:
            # prefetch_to_device(size=d) holds d device-bound batches plus
            # one mid-transfer, so a recycled buffer may still be read until
            # d+1 batches later. ``prefetch_size`` declares the consumer's
            # actual d (pass it alongside collate_buffers); minimum safe
            # ring is d + 2.
            assert collate_buffers >= prefetch_size + 2, (
                "collate_buffers ring too shallow: a buffer is rewritten "
                "after N batches while prefetch keeps prefetch_size+1 "
                "batches in flight; use N >= prefetch_size + 2 or 0 for "
                "fresh allocations")
        self.collate_buffers = collate_buffers
        self._ring: list = []
        self._ring_i = 0

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx[self.shard_index:: self.num_shards]

    def __len__(self) -> int:
        # NO _indices() here: computing the length must not advance the
        # shuffle RNG (Trainer/PairedLoader call len() for bookkeeping and
        # data order has to be independent of how often they do)
        n = len(range(self.shard_index, len(self.dataset), self.num_shards))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        n_batches = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        with ThreadPoolExecutor(self.num_workers) as pool:
            for b in range(n_batches):
                chunk = idx[b * self.batch_size: (b + 1) * self.batch_size]
                samples = list(pool.map(self.dataset.__getitem__, chunk))
                out = None
                if self.collate_buffers and len(chunk) == self.batch_size:
                    if len(self._ring) < self.collate_buffers:
                        self._ring.append(_alloc_like(samples))
                    out = self._ring[self._ring_i]
                    self._ring_i = (self._ring_i + 1) % self.collate_buffers
                yield _collate(samples, out)


class PairedLoader:
    """Pairs a sensor-A and a sensor-B loader into one stream.

    Iterates for ``max(len(a), len(b))`` steps; the shorter loader restarts
    when exhausted (wrapper_dataloader.py:43-63). Yields (batch_a, batch_b).
    """

    def __init__(self, loader_a, loader_b):
        self.loader_a = loader_a
        self.loader_b = loader_b

    def __len__(self) -> int:
        return max(len(self.loader_a), len(self.loader_b))

    def __iter__(self):
        it_a, it_b = iter(self.loader_a), iter(self.loader_b)
        for _ in range(len(self)):
            try:
                a = next(it_a)
            except StopIteration:
                it_a = iter(self.loader_a)
                a = next(it_a)
            try:
                b = next(it_b)
            except StopIteration:
                it_b = iter(self.loader_b)
                b = next(it_b)
            yield a, b


def prefetch_to_device(iterator, *, size: int = 2, sharding=None):
    """Double-buffered host->device prefetch.

    Wraps any batch iterator: a background thread moves the next ``size``
    batches to the device (optionally with a NamedSharding for DP) while the
    TPU computes on the current one.

    When the source is a ``BatchLoader(collate_buffers=N)`` ring, N must be
    at least ``size + 2``: up to ``size`` queued batches plus one
    mid-``device_put`` may still be reading their host buffers.
    """
    import jax

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
