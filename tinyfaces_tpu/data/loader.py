"""Threaded prefetching batch loader.

TPU-native equivalent of the reference's `DataLoader(num_workers=8,
pin_memory=True)` (datasets/__init__.py:46-50): worker threads decode and
augment samples (PIL JPEG decode releases the GIL) while the device runs
the previous step; assembled batches are handed over through a bounded
queue so host input prep overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

_STOP = object()


def _collate(items: list[dict]) -> dict:
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        out[k] = np.stack(vals) if np.ndim(vals[0]) else np.array(vals)
    return out


def _pack_yuv(item: dict) -> dict:
    """Replace a sample's RGB canvas with planar YCbCr 4:2:0 (1.5 B/px):
    halves train-input H2D bytes; build_targets unpacks on device. Runs in
    the worker pool (PIL's converter drops the GIL)."""
    from tinyfaces_tpu.data.targets import rgb_to_yuv420

    item = dict(item)
    y, u, v = rgb_to_yuv420(item.pop("image")[None])
    item["image_y"], item["image_u"], item["image_v"] = y[0], u[0], v[0]
    return item


class PrefetchLoader:
    """Iterable over device-ready batches with background workers.

    Drops the trailing partial batch (like the reference's training loop
    semantics with fixed batch shapes — static shapes are mandatory under
    jit anyway).
    """

    def __init__(self, dataset, batch_size: int, workers: int = 8,
                 prefetch: int = 4, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, epoch: int = 0,
                 rank: int = 0, world: int = 1, pack: str = "rgb"):
        """`epoch`: starting epoch for the (seed, epoch)-derived shuffle and
        augmentation streams — pass the true training epoch when a fresh
        loader is built per epoch (Trainer does), so each epoch draws fresh
        augmentations yet remains exactly reproducible.

        `rank`/`world`: multi-host SPMD input feeding. `batch_size` stays the
        GLOBAL batch; every process computes the identical (seed, epoch)
        shuffle and decodes only its `batch_size // world` row slice of each
        global batch (rows [rank*per, (rank+1)*per)). Feed the result through
        parallel.distributed.host_local_batch to assemble the global array
        without cross-host data movement."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.workers = max(1, workers)
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = epoch
        if world > 1 and batch_size % world:
            raise ValueError(f"batch_size {batch_size} not divisible by world {world}")
        if world > 1 and not drop_last:
            # the trailing partial batch would yield unequal/empty per-rank
            # slices and inconsistent global shapes across processes
            raise ValueError("multi-host slicing (world > 1) requires drop_last")
        if pack not in ("rgb", "yuv420", "jpegdct"):
            raise ValueError(f"unknown pack mode {pack!r}")
        self.rank = rank
        self.world = world
        self.pack = pack

    def _load_one(self, i: int) -> dict:
        if self.pack == "jpegdct":
            # No host pixel decode at all: entropy decode (C++, GIL-free,
            # cached across epochs) + coefficient crop + pack; the device
            # augments (data/dct_train.py).
            return self.dataset.getitem_train_dct(int(i))
        item = self.dataset[int(i)]
        return _pack_yuv(item) if self.pack == "yuv420" else item

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _begin_epoch(self) -> np.ndarray:
        """Per-epoch deterministic state: shuffle order is a pure function of
        (seed, epoch), and the dataset's per-sample augmentation generators
        are rebased on the same epoch. Two same-seed loaders therefore
        produce identical batches regardless of worker-thread scheduling."""
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(
                np.random.SeedSequence((self.seed, self.epoch))
            ).shuffle(order)
        self.epoch += 1
        return order

    def _batch_indices(self, order: np.ndarray, b: int) -> np.ndarray:
        """Global batch b's sample indices, restricted to this process's
        row slice under multi-host feeding (identity when world == 1)."""
        idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
        if self.world > 1:
            per = self.batch_size // self.world
            idxs = idxs[self.rank * per : (self.rank + 1) * per]
        return idxs

    def _pipeline(self, order: np.ndarray, load_fn) -> Iterator[dict]:
        """Producer-thread scaffolding shared by every loader variant: a
        bounded queue of collated batches, worker-pool loading via
        `load_fn(index)`, and exception forwarding to the consumer."""
        nb = len(self)
        if nb == 0:
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def produce():
            try:
                with ThreadPoolExecutor(self.workers) as pool:
                    for b in range(nb):
                        idxs = [int(i) for i in self._batch_indices(order, b)]
                        q.put(_collate(list(pool.map(load_fn, idxs))))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
                return
            q.put(_STOP)

        threading.Thread(target=produce, daemon=True).start()

        while True:
            item = q.get()
            if item is _STOP:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def __iter__(self) -> Iterator[dict]:
        return self._pipeline(self._begin_epoch(), self._load_one)


class NativePrefetchLoader(PrefetchLoader):
    """PrefetchLoader variant that runs the augmentation chain in the C++
    engine (native/): each worker thread decodes a JPEG and immediately
    augments it via a per-sample native call (the ctypes call drops the GIL,
    so decode and C++ augmentation of different samples pipeline freely).
    Falls back implicitly if the caller checked data.native.is_available()."""

    def __iter__(self) -> Iterator[dict]:
        from tinyfaces_tpu.data import native

        if self.pack == "jpegdct":
            # The dct wire never decodes pixels, so there is nothing for
            # the native pixel-augmentation engine to do.
            return super().__iter__()

        order = self._begin_epoch()
        cfg = self.dataset.cfg
        # Same (seed, epoch)-derived scheme as the Python path so the native
        # loader is reproducible per epoch too.
        base_seed = int(
            np.random.default_rng(
                np.random.SeedSequence((self.seed, self.epoch - 1, 0xC0FFEE))
            ).integers(0, 2**62)
        )

        def decode_and_augment(i: int):
            sample = self.dataset.samples[i]
            img = self.dataset._decode(i)
            item = native.native_augment_sample(
                img, sample.bboxes.astype(np.float32), cfg.input_size,
                cfg.neg_thresh, cfg.max_gt,
                seed=base_seed + int(i) * 0x9E3779B9,
            )
            return _pack_yuv(item) if self.pack == "yuv420" else item

        return self._pipeline(order, decode_and_augment)
