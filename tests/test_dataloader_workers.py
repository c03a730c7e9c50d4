"""Process-pool DataLoader (workers>0) vs in-process loading: same batches,
same determinism across runs (parity target: torch DataLoader num_workers,
reference train.py --workers)."""
import numpy as np

from tsm_det_pointcloud_tpu.datasets import DataLoader


class _ArrayDataset:
    """Minimal DatasetTemplate-shaped dataset: __getitem__ + collate_batch."""

    def __init__(self, n=13, d=5):
        rng = np.random.RandomState(0)
        self.data = rng.randn(n, d).astype(np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        # include a np.random draw so worker seeding determinism is exercised
        noise = np.random.randn(self.data.shape[1]).astype(np.float32)
        return {"x": self.data[i], "noise": noise, "idx": np.int64(i)}

    @staticmethod
    def collate_batch(samples):
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }


def _collect(loader):
    return [
        {k: v.copy() for k, v in b.items()} for b in loader
    ]


def test_pool_loader_matches_indices_and_is_deterministic():
    ds = _ArrayDataset()
    pool_loader = DataLoader(ds, batch_size=4, shuffle=True, seed=7,
                             workers=2)
    pool_loader.set_epoch(3)
    run1 = _collect(pool_loader)
    run2 = _collect(pool_loader)
    assert len(run1) == len(pool_loader) == 4  # ceil(13/4)

    # identical across runs (per-sample seeding, not worker-order seeding)
    for b1, b2 in zip(run1, run2):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k])

    # same index order as the in-process loader
    thread_loader = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    thread_loader.set_epoch(3)
    ref = _collect(thread_loader)
    for b1, b2 in zip(run1, ref):
        np.testing.assert_array_equal(b1["idx"], b2["idx"])
        np.testing.assert_array_equal(b1["x"], b2["x"])


def test_pool_loader_shards_are_disjoint():
    ds = _ArrayDataset(n=12)
    seen = []
    for shard in range(2):
        dl = DataLoader(ds, batch_size=3, shuffle=False, workers=2,
                        num_shards=2, shard_id=shard)
        for b in dl:
            seen.extend(b["idx"].tolist())
    assert sorted(seen) == list(range(12))
