"""Shared-memory sample cache (parity: the reference's SharedArray usage —
waymo_dataset.py:77-120 `load_data_to_shared_memory`/`clean_shared_memory`,
database_sampler.py:71-89 global-npy gt database).

The SharedArray package pins raw arrays in /dev/shm so every dataloader
worker on the host maps one copy. The same effect here with zero
dependencies: each cached array is an .npy file under /dev/shm, written
atomically (tmp + rename) and re-opened with np.load(mmap_mode='r') — the
page cache backs it with shared physical pages across processes.

Multi-host TPU pods shard the preload across processes the same way the
reference shards across ranks (process_index()::process_count()); each host
only caches what it will read.
"""
from __future__ import annotations

import os
import re
from pathlib import Path

import numpy as np

SHM_ROOT = Path(os.environ.get("TSM_SHM_DIR", "/dev/shm"))


def _path(key: str) -> Path:
    return SHM_ROOT / (re.sub(r"[^\w.\-]", "_", key) + ".npy")


def available() -> bool:
    return SHM_ROOT.is_dir() and os.access(SHM_ROOT, os.W_OK)


def sa_exists(key: str) -> bool:
    return _path(key).exists()


def sa_create(key: str, arr: np.ndarray) -> None:
    """Idempotent atomic publish (concurrent creators race benignly)."""
    dst = _path(key)
    if dst.exists():
        return
    tmp = dst.with_suffix(f".tmp{os.getpid()}.npy")
    np.save(tmp, np.ascontiguousarray(arr))
    os.replace(tmp, dst)


def sa_attach(key: str, copy: bool = True) -> np.ndarray:
    """Map the cached array; copy=True hands back a private writable copy
    (the reference's .copy() after SharedArray.attach)."""
    out = np.load(_path(key), mmap_mode="r")
    return np.array(out) if copy else out


def sa_delete(key: str) -> None:
    _path(key).unlink(missing_ok=True)
