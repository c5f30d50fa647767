"""Host-side input pipeline: threaded sample assembly + device prefetch.

Replaces torch DataLoader workers (ref: scripts/train_usot.py:337-344) with
a thread pool (cv2/np release the GIL for the heavy ops) and an async
device-put queue so the TPU never waits on the host.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def collate(samples: list[dict]) -> dict:
    out = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples])
    return out


class DataLoader:
    """Iterates batches of collated numpy dicts; drop_last semantics."""

    def __init__(self, dataset, batch_size: int, num_workers: int = 4,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        n_batches = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        break
                    idx = range(b * self.batch_size,
                                (b + 1) * self.batch_size)
                    samples = list(pool.map(self.dataset.__getitem__, idx))
                    q.put(collate(samples))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
