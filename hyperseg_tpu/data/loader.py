"""Host-side data loading with threaded workers and device prefetch.

The reference uses torch DataLoader worker *processes* with pinned memory
(train.py:194-197). For TPU feeding, the equivalent is: PIL/numpy transforms
on host threads (the transforms release the GIL in PIL/numpy), batches
collated into numpy, and a small prefetch queue that uploads the next batch to
device (optionally sharded over a mesh) while the current step runs.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np


class RandomSampler:
    """With-replacement sampler of fixed length (the reference's
    RandomSampler(replacement=True, num_samples=train_iterations),
    train.py:194)."""

    def __init__(self, dataset, num_samples: int, seed: Optional[int] = None,
                 weights=None):
        self.n = len(dataset)
        self.num_samples = num_samples
        self.rng = np.random.RandomState(seed)
        self.weights = None
        if weights is not None:
            w = np.asarray(weights, np.float64)
            self.weights = w / w.sum()

    def __len__(self):
        return self.num_samples

    def __iter__(self):
        yield from self.rng.choice(self.n, size=self.num_samples,
                                   replace=True, p=self.weights)


class SequentialSampler:
    def __init__(self, dataset):
        self.n = len(dataset)

    def __len__(self):
        return self.n

    def __iter__(self):
        return iter(range(self.n))


class ShuffleSampler:
    def __init__(self, dataset, seed: Optional[int] = None):
        self.n = len(dataset)
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return self.n

    def __iter__(self):
        return iter(self.rng.permutation(self.n))


def default_collate(samples):
    imgs, lbls = zip(*samples)
    if isinstance(imgs[0], (list, tuple)):  # pyramid batches
        batched = [np.stack([im[i] for im in imgs]) for i in range(len(imgs[0]))]
        return {"image": batched, "label": np.stack(lbls)}
    return {"image": np.stack(imgs), "label": np.stack(lbls)}


class DataLoader:
    """Map-style loader: threaded sample fetch, batch collate, bounded
    prefetch. `device_put` (optional) uploads batches (e.g. sharded onto a
    mesh) inside the prefetch thread."""

    def __init__(self, dataset, batch_size=1, sampler=None, shuffle=False,
                 drop_last=False, workers=4, prefetch=2, seed=None,
                 collate_fn=default_collate, pad_last=False, pad_label=255,
                 device_put: Optional[Callable] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        # pad_last: fill the final partial batch with copies of its last
        # sample whose labels are all `pad_label` (=ignore), so static batch
        # shapes / sharding divisibility hold while metrics stay exact
        self.pad_last = pad_last
        self.pad_label = pad_label
        self.collate_fn = collate_fn
        self.device_put = device_put
        self.workers = max(1, workers)
        self.prefetch = prefetch
        if sampler is None:
            sampler = ShuffleSampler(dataset, seed) if shuffle else SequentialSampler(dataset)
        self.sampler = sampler

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator[list]:
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def produce():
            try:
                with ThreadPoolExecutor(self.workers) as pool:
                    for batch_idx in self._batches():
                        samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                        if self.pad_last and len(samples) < self.batch_size:
                            img, lbl = samples[-1]
                            filler_lbl = np.full_like(np.asarray(lbl),
                                                      self.pad_label)
                            samples += [(img, filler_lbl)] * (
                                self.batch_size - len(samples))
                        b = self.collate_fn(samples)
                        if self.device_put is not None:
                            b = self.device_put(b)
                        q.put(b)
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
                return
            q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
