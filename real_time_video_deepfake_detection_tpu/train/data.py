"""Host-side data pipeline: directory scan, balanced sampling, threaded
JPEG decode feeding uint8 batches to the device augmentation step.

Reference equivalents: DeepfakeDataset directory layout
(train.py:442-462: data_dir/split/{real,fake}/*.jpg), balanced
WeightedRandomSampler downsampled to 2x the minority class per epoch
(train.py:519-540), DataLoader prefetch workers (train.py:829-838).

Division of labor (TPU-first): the host ONLY decodes and resizes to the
(size+20) canvas; all augmentation randomness runs batched on device
(train/augment.py)."""

from __future__ import annotations

import concurrent.futures as cf
import os
import threading
from pathlib import Path
from queue import Queue
from typing import Iterator, List, Optional, Tuple

import numpy as np


class DeepfakeDataset:
    def __init__(self, data_dir: str, split: str = "train", image_size: int = 224):
        self.dir = Path(data_dir) / split
        self.split = split
        self.image_size = image_size
        self.samples: List[Tuple[str, int]] = []
        for p in sorted((self.dir / "real").glob("*.jpg")):
            self.samples.append((str(p), 0))
        for p in sorted((self.dir / "fake").glob("*.jpg")):
            self.samples.append((str(p), 1))
        # also accept png (the tooling writes jpg; users may add png)
        for label, sub in ((0, "real"), (1, "fake")):
            for p in sorted((self.dir / sub).glob("*.png")):
                self.samples.append((str(p), label))
        self.labels = np.array([l for _, l in self.samples], np.int64)

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def class_counts(self) -> np.ndarray:
        return np.bincount(self.labels, minlength=2)

    def load_size(self) -> int:
        # train loads onto the +20 canvas for device random crop
        return self.image_size + (20 if self.split == "train" else 0)

    def load_image(self, idx: int) -> np.ndarray:
        import cv2
        path, _ = self.samples[idx]
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(path)
        s = self.load_size()
        img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
        return img[..., ::-1].copy()   # BGR -> RGB u8


def balanced_epoch_indices(labels: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """2x-minority weighted sample with replacement (train.py:519-540)."""
    counts = np.bincount(labels, minlength=2)
    if counts[0] == 0 or counts[1] == 0:
        missing = "fake" if counts[1] == 0 else "real"
        raise RuntimeError(f"Training set has 0 {missing} samples!")
    w = (1.0 / counts)[labels]
    w = w / w.sum()
    n = 2 * int(counts.min())
    return rng.choice(len(labels), size=n, replace=True, p=w)


class BatchLoader:
    """Threaded prefetching batch iterator yielding (u8 RGB batch, labels).
    Drops the last partial batch in training (static shapes under jit)."""

    def __init__(self, dataset: DeepfakeDataset, batch_size: int,
                 shuffle: bool, seed: int = 0, num_workers: int = 8,
                 prefetch: int = 4, balanced: bool = False,
                 drop_last: Optional[bool] = None):
        self.ds = dataset
        self.bs = batch_size
        self.shuffle = shuffle
        self.balanced = balanced
        self.rng = np.random.default_rng(seed)
        self.workers = num_workers
        self.prefetch = prefetch
        self.drop_last = shuffle if drop_last is None else drop_last

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if self.balanced:
            idx = balanced_epoch_indices(self.ds.labels, self.rng)
        else:
            idx = np.arange(len(self.ds))
            if self.shuffle:
                self.rng.shuffle(idx)
        nb = len(idx) // self.bs if self.drop_last else -(-len(idx) // self.bs)
        batches = [idx[i * self.bs:(i + 1) * self.bs] for i in range(nb)]

        q: Queue = Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with cf.ThreadPoolExecutor(self.workers) as pool:
                for b in batches:
                    if stop.is_set():
                        break
                    imgs = list(pool.map(self._safe_load, b))
                    x = np.stack(imgs)
                    y = self.ds.labels[b].astype(np.float32)
                    q.put((x, y))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def _safe_load(self, i: int) -> np.ndarray:
        # corrupt file -> random other sample (train.py:512-513)
        for _ in range(10):
            try:
                return self.ds.load_image(int(i))
            except Exception:
                i = self.rng.integers(0, len(self.ds))
        s = self.ds.load_size()
        return np.zeros((s, s, 3), np.uint8)

    def __len__(self) -> int:
        if self.balanced:
            n = 2 * int(self.ds.class_counts.min())
        else:
            n = len(self.ds)
        return n // self.bs if self.drop_last else -(-n // self.bs)
