"""Dataset registry + dataloader (parity: pcdet/datasets/__init__.py:14-76).

The reference wraps torch DataLoader + DistributedSampler; here a dependency-
free loader with an epoch-seeded deterministic permutation (same contract as
the reference's custom DistributedSampler, datasets/__init__.py:24-44:
pad-to-divisible then rank-strided slice). Prefetch modes:

  * workers=0: a single background thread (cheap pipelines, tests).
  * workers>0: a process pool, the analogue of torch DataLoader
    num_workers (reference train.py --workers). gt-sampling copy-paste +
    augmentation are host-python and would otherwise input-bind the chip
    (SURVEY.md §7.4 hard part 6). Each batch is loaded + collated inside
    one worker; at most `prefetch * workers` batches are in flight.

    The pool uses the `forkserver` start method: by the time the first
    epoch runs, JAX/libtpu has already spun up device threads in the
    parent, and fork()ing a multi-threaded process can deadlock the child
    (only the forking thread survives, with every lock in whatever state
    it was). The forkserver process is spawned before it ever holds such
    state, so workers are clean; the dataset ships to it once by pickle
    at pool creation, and the pool persists across epochs. If the dataset
    cannot pickle, we fall back to fork with a warning. Worker results
    carry a timeout so a dead worker fails the epoch instead of hanging.

Per-sample numpy RNG is seeded from (seed, epoch, sample index) in BOTH
paths, so the augmentation stream is identical regardless of worker count
or scheduling — a documented improvement over the reference's per-worker
seeding.
"""
from __future__ import annotations

import multiprocessing
import queue
import threading

import numpy as np

from .dataset import DatasetTemplate
from .kitti.kitti_dataset import KittiDataset
from .waymo.waymo_dataset import WaymoDataset
from .nuscenes.nuscenes_dataset import NuScenesDataset
from .lyft.lyft_dataset import LyftDataset
from .pandaset.pandaset_dataset import PandasetDataset

__all__ = {
    "DatasetTemplate": DatasetTemplate,
    "KittiDataset": KittiDataset,
    "WaymoDataset": WaymoDataset,
    "NuScenesDataset": NuScenesDataset,
    "LyftDataset": LyftDataset,
    "PandasetDataset": PandasetDataset,
}


class DataLoader:
    """Deterministic epoch-shuffled batch loader with thread prefetch.

    For multi-host data parallelism, `num_shards`/`shard_id` reproduce the
    reference sampler's pad-to-divisible + strided-slice behavior so every
    host sees a disjoint, equally-sized slice.
    """

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False,
                 seed=0, num_shards=1, shard_id=0, prefetch=2, workers=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
        self.workers = workers
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch, seed=self.seed)

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            g = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch]))
            idx = g.permutation(n)
        else:
            idx = np.arange(n)
        if self.num_shards > 1:
            total = -(-n // self.num_shards) * self.num_shards
            idx = np.concatenate([idx, idx[: total - n]])
            idx = idx[self.shard_id :: self.num_shards]
        return idx

    def __len__(self):
        per_shard = len(self._indices())
        if self.drop_last:
            return per_shard // self.batch_size
        return -(-per_shard // self.batch_size)

    def __iter__(self):
        idx = self._indices()
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.workers > 0:
            yield from self._iter_pool(batches)
            return

        if self.prefetch <= 0:
            for b in batches:
                yield self._load(b)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._load(b))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def _get_pool(self):
        if getattr(self, "_pool", None) is not None:
            return self._pool
        try:
            ctx = multiprocessing.get_context("forkserver")
            self._pool = ctx.Pool(
                self.workers, initializer=_pool_init, initargs=(self.dataset,)
            )
        except Exception:  # unpicklable dataset -> COW fork fallback
            import warnings

            warnings.warn(
                "dataset not picklable for forkserver workers; falling back "
                "to fork() — hazardous after JAX/libtpu initialization"
            )
            ctx = multiprocessing.get_context("fork")
            self._pool = ctx.Pool(
                self.workers, initializer=_pool_init, initargs=(self.dataset,)
            )
        return self._pool

    def close(self):
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.terminate()
            self._pool = None

    def _iter_pool(self, batches):
        """Persistent process-pool prefetch; results yielded in order with
        a bounded in-flight window and a liveness timeout."""
        pool = self._get_pool()
        window = max(self.prefetch, 1) * self.workers
        pending = []
        it = iter(batches)
        while True:
            while len(pending) < window:
                b = next(it, None)
                if b is None:
                    break
                pending.append(pool.apply_async(
                    _pool_load, (np.asarray(b), self.seed, self.epoch)
                ))
            if not pending:
                break
            # a dead/hung worker raises instead of blocking forever
            yield pending.pop(0).get(timeout=600)

    def _load(self, index_batch):
        samples = []
        for i in index_batch:
            _seed_for_sample(self.dataset, self.seed, self.epoch, int(i))
            samples.append(self.dataset[int(i)])
        return self.dataset.collate_batch(samples)


_POOL_STATE = {}


def _pool_init(dataset):
    _POOL_STATE["dataset"] = dataset


def _seed_for_sample(ds, seed, epoch, index):
    """Deterministic per-(seed, epoch, index) stream, independent of worker
    count and scheduling: reseed the dataset's Generator (the pipeline's
    RNG) and the legacy global state any stray np.random caller sees."""
    ss = np.random.SeedSequence([seed, epoch, index])
    ds.rng = np.random.default_rng(ss)
    np.random.seed(ss.generate_state(1)[0])


def _pool_load(index_batch, seed, epoch):
    ds = _POOL_STATE["dataset"]
    samples = []
    for i in index_batch:
        _seed_for_sample(ds, seed, epoch, int(i))
        samples.append(ds[int(i)])
    return ds.collate_batch(samples)


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=4, seed=None, logger=None,
                     training=True, merge_all_iters_to_one_epoch=False,
                     total_epochs=0, num_shards=1, shard_id=0):
    """Parity: pcdet/datasets/__init__.py:47-76 (same signature modulo the
    torch-specific args)."""
    dataset = __all__[dataset_cfg.DATASET](
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        root_path=root_path,
        training=training,
        logger=logger,
    )
    if merge_all_iters_to_one_epoch:
        dataset.merge_all_iters_to_one_epoch(merge=True, epochs=total_epochs)

    dataloader = DataLoader(
        dataset, batch_size=batch_size, shuffle=training,
        drop_last=training, seed=seed or 0,
        num_shards=num_shards, shard_id=shard_id, workers=workers,
    )
    return dataset, dataloader, dataloader
