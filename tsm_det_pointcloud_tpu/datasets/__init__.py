"""Dataset registry + dataloader (parity: pcdet/datasets/__init__.py:14-76).

The reference wraps torch DataLoader + DistributedSampler; here a dependency-
free loader with an epoch-seeded deterministic permutation (same contract as
the reference's custom DistributedSampler, datasets/__init__.py:24-44:
pad-to-divisible then rank-strided slice) and background-thread prefetch.
"""
from __future__ import annotations

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
                 seed=0, num_shards=1, shard_id=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
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

    def _load(self, index_batch):
        samples = [self.dataset[int(i)] for i in index_batch]
        return self.dataset.collate_batch(samples)


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
        num_shards=num_shards, shard_id=shard_id,
    )
    return dataset, dataloader, dataloader
