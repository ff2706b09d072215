"""Dataset + threaded loader.

Replaces mmdet's build_dataloader (apis/train.py:208-220): a
NuScenesDataset over info files with optional CBGS resampling, a
thread-pool prefetching loader (the pipeline is numpy/PIL-bound, which
releases the GIL for image decode), and seeded per-sample RNG for
deterministic augmentation.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from ..config import OcRFDetConfig
from . import infos as INF
from .pipeline import collate, prepare_sample


class NuScenesDataset:
    def __init__(self, cfg: OcRFDetConfig, info_path: str,
                 is_train: bool = True, cbgs: bool = True):
        self.cfg = cfg
        self.is_train = is_train
        self.infos = INF.load_infos(info_path)
        if is_train and cbgs:
            self.indices = INF.cbgs_indices(
                self.infos, num_classes=len(cfg.class_names),
                seed=cfg.seed)
        else:
            self.indices = np.arange(len(self.infos))

    def __len__(self):
        return len(self.indices)

    def sample(self, i: int, epoch: int = 0) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            (self.cfg.seed * 1_000_003 + epoch * 997 + int(i)) % (2 ** 63))
        return prepare_sample(self.cfg, self.infos, int(self.indices[i]),
                              rng, is_train=self.is_train)


class Loader:
    """Shuffling, batching, thread-prefetching iterator."""

    def __init__(self, dataset: NuScenesDataset, batch_size: int,
                 shuffle: bool = True, num_workers: int = 8,
                 drop_last: bool = True, prefetch: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng(self.ds.cfg.seed + epoch).shuffle(order)
        n_batches = len(self)
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = [self.ds.sample(i, epoch) for i in idxs]
                    q.put(collate(samples))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    break
                yield b
        finally:
            stop.set()
