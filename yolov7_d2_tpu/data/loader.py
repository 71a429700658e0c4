"""Batched data loader with background workers + device prefetch.

The counterpart of d2's ``build_detection_train_loader`` /
``build_detection_test_loader`` (consumed at /root/reference/train_det.py:32).

TPU-first design: mappers emit static-shape numpy samples, a thread pool maps
records (cv2 releases the GIL), batches are stacked and (optionally)
transferred to device asynchronously so host aug overlaps TPU compute —
the double-buffered host->HBM pipeline from BASELINE's north star.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def stack_batch(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class DataLoader:
    """Infinite (train) or single-pass (eval) batched loader."""

    def __init__(
        self,
        records: List[dict],
        mapper: Callable[[dict], Dict[str, np.ndarray]],
        batch_size: int,
        shuffle: bool = True,
        infinite: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        drop_last: bool = True,
    ):
        if not records:
            raise ValueError("empty dataset")
        self.records = records
        self.mapper = mapper
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.infinite = infinite
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def _index_stream(self) -> Iterator[int]:
        n = len(self.records)
        while True:
            order = (
                self.rng.permutation(n) if self.shuffle else np.arange(n)
            )
            yield from order.tolist()
            if not self.infinite:
                return

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Producer thread + a mapper thread pool (cv2 and large-array numpy
        release the GIL, so mapping parallelizes across ``num_workers``
        threads — the counterpart of d2's dataloader worker processes).
        Batches preserve the index-stream order."""
        from concurrent.futures import ThreadPoolExecutor

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def safe_map(idx):
            try:
                return self.mapper(self.records[idx])
            except FileNotFoundError:
                return None

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                    batch: List[Dict[str, np.ndarray]] = []
                    # keep ~2 batches of map futures in flight
                    window = max(self.batch_size * 2, self.num_workers * 2)
                    pending = []
                    stream = self._index_stream()
                    exhausted = False
                    while not stop.is_set():
                        while not exhausted and len(pending) < window:
                            try:
                                idx = next(stream)
                            except StopIteration:
                                exhausted = True
                                break
                            pending.append(ex.submit(safe_map, idx))
                        if not pending:
                            break
                        sample = pending.pop(0).result()
                        if sample is None:
                            continue
                        batch.append(sample)
                        if len(batch) == self.batch_size:
                            out_q.put(stack_batch(batch))
                            batch = []
                    if batch and not self.drop_last and not stop.is_set():
                        out_q.put(stack_batch(batch))
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def build_detection_train_loader(cfg, records: List[dict], mapper, seed: int = 0):
    return DataLoader(
        records,
        mapper,
        batch_size=cfg.SOLVER.IMS_PER_BATCH,
        shuffle=cfg.DATALOADER.SHUFFLE,
        infinite=True,
        num_workers=cfg.DATALOADER.NUM_WORKERS,
        prefetch=cfg.DATALOADER.PREFETCH_BUFFER,
        seed=seed,
    )


def build_detection_test_loader(
    cfg, records: List[dict], mapper, batch_size: Optional[int] = None
):
    return DataLoader(
        records,
        mapper,
        batch_size=batch_size or cfg.SOLVER.IMS_PER_BATCH,
        shuffle=False,
        infinite=False,
        drop_last=False,
    )


def device_prefetch(iterator, size: int = 2):
    """Move batches to device ahead of consumption (double buffering)."""
    import jax

    buf: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        for item in iterator:
            buf.put(jax.device_put(item))
        buf.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = buf.get()
        if item is sentinel:
            return
        yield item
