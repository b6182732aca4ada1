"""Input pipeline: host batcher + double-buffered device prefetch.

The reference feeds the GPU with a synchronous torch DataLoader
(main.py:245-246, num_workers=0 — every batch normalizes on host, then blocks
on .to(device)). The TPU pipeline instead:

* serves RAW batches (normalization runs fused on device inside the jitted
  train step — zero host math per step),
* prefetches the next batch to HBM while the current step runs
  (``prefetch_to_device``), so host slicing overlaps device compute,
* shards the batch across a mesh's ``data`` axis when one is given, putting
  each shard directly on its device (no single-host bottleneck array).
"""

from __future__ import annotations

import collections
import itertools
from typing import Iterator, Optional, Tuple

import jax
import numpy as np


class SequenceLoader:
    """Epoch iterator over a dataset subset: yields raw NHWC (x, y) numpy
    batches. Shuffles with a per-epoch seeded rng (deterministic across
    restarts; replaces the reference's torch loader shuffle)."""

    def __init__(self, dataset, indices: np.ndarray, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 drop_remainder: bool = False):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = self.indices
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(order)
        self.epoch += 1
        stop = (len(order) // self.batch_size * self.batch_size
                if self.drop_remainder else len(order))
        for i in range(0, stop, self.batch_size):
            batch_idx = np.sort(order[i:i + self.batch_size])  # sorted gather is faster
            yield self.dataset.get_batch_raw(batch_idx)


def pad_batch(x: np.ndarray, y: np.ndarray, batch_size: int):
    """Pad a ragged tail batch up to ``batch_size`` (static shapes keep XLA
    from recompiling); returns (x, y, n_real)."""
    n = x.shape[0]
    if n == batch_size:
        return x, y, n
    pad = batch_size - n
    x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    y = np.concatenate([y, np.zeros((pad,) + y.shape[1:], y.dtype)])
    return x, y, n


def prefetch_to_device(iterator, size: int = 2,
                       sharding: Optional[jax.sharding.Sharding] = None):
    """Move batches to HBM ``size`` steps ahead of consumption.

    With a ``sharding`` (e.g. batch sharded over the mesh 'data' axis) each
    element is placed directly into its per-device layout; transfers are
    async, so the queue overlaps host IO with device compute — the TPU
    replacement for pin_memory+blocking .to(device) (reference main.py:89).
    """
    queue = collections.deque()

    def _put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, batch)
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, sharding), batch)

    it = iter(iterator)
    for batch in itertools.islice(it, size):
        queue.append(_put(batch))
    while queue:
        yield queue.popleft()
        for batch in itertools.islice(it, 1):
            queue.append(_put(batch))


class _GrainSource:
    """Module-level (picklable) grain data source — worker_count>0 forks
    child processes that must pickle the source. Pickling ships only the
    npz PATH + stats manifest, never the X/Y arrays: serializing the
    dataset itself would copy the full (potentially tens-of-GB) arrays
    into every worker, defeating the large-dataset case; each worker
    reopens the npz memory-mapped instead."""

    def __init__(self, dataset, indices: np.ndarray):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __getstate__(self):
        return {"npz_path": self.dataset.npz_path,
                "stats": self.dataset.stats.to_dict(),
                "indices": self.indices}

    def __setstate__(self, st):
        from .npz_dataset import NPZSequenceDataset
        from ..ops.normalize import NormStats

        self.indices = st["indices"]
        # mmap=True: workers page samples in on demand via the sidecars
        self.dataset = NPZSequenceDataset(
            st["npz_path"], stats=NormStats.from_dict(st["stats"]),
            mmap=True)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        x, y = self.dataset.get_batch_raw(self.indices[i:i + 1])
        return {"x": x[0], "y": y[0]}


def make_grain_loader(dataset, indices: np.ndarray, batch_size: int,
                      shuffle: bool = True, seed: int = 0,
                      worker_count: int = 0, num_epochs: int = 1):
    """Grain-backed loader (the production input pipeline SURVEY.md §7
    calls for): multi-worker sample fetch + batching over the dataset's raw
    arrays, yielding the same NHWC (x, y) batches as SequenceLoader.

    worker_count > 0 moves sample gather into child processes — useful on
    many-core hosts feeding fast chips; 0 stays in-process.
    """
    import grain.python as grain

    indices = np.asarray(indices)
    source = _GrainSource(dataset, indices)

    sampler = grain.IndexSampler(
        num_records=len(indices),
        shuffle=shuffle,
        seed=seed,
        shard_options=grain.NoSharding(),
        num_epochs=num_epochs,
    )
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size,
                                drop_remainder=False)],
        worker_count=worker_count,
    )

    def _iter():
        for rec in loader:
            yield rec["x"], rec["y"]

    return _iter()
