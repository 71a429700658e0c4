"""Multi-process data loader — the scaling path for CPU-bound augmentation.

The reference gets parallelism from d2's dataloader worker *processes*
(SURVEY.md §3.1 "WORKER-PROCESS BOUNDARY"); python threads can't scale the
mosaic pipeline because its many small numpy ops hold the GIL (measured:
16 threads are slower than 1). This loader spawns ``num_workers`` OS
processes, each owning its own mapper instance — so the stateful mosaic
pool is per-worker exactly like the reference (dataset_mapper.py:85-87) —
and streams mapped samples back over an mp.Queue; the parent assembles
batches in arrival order.

``spawn`` start method: fork is unsafe once a TPU client exists in the
parent.
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
from typing import Callable, Dict, Iterator, List

import numpy as np

# Spawned workers must never create a TPU client (they only run numpy/cv2;
# a per-worker TPU handshake would serialize on the device). The platform
# is pinned to cpu the moment this module loads in a child process.
if mp.parent_process() is not None:  # pragma: no cover - child-only path
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from yolov7_d2_tpu.data.loader import stack_batch


def _worker_loop(
    worker_id: int,
    num_workers: int,
    records: List[dict],
    mapper_factory: Callable[[int], Callable],
    out_q,
    stop_evt,
    infinite: bool,
    shuffle: bool,
    seed: int,
):
    mapper = mapper_factory(worker_id)
    rng = np.random.default_rng(seed + worker_id)
    n = len(records)
    epoch = 0
    while not stop_evt.is_set():
        order = rng.permutation(n) if shuffle else np.arange(n)
        # contiguous shard per worker (epoch-reshuffled)
        shard = order[worker_id::num_workers]
        for idx in shard:
            if stop_evt.is_set():
                return
            try:
                sample = mapper(records[int(idx)])
            except FileNotFoundError:
                continue
            while not stop_evt.is_set():
                try:
                    out_q.put(sample, timeout=0.5)
                    break
                except queue_mod.Full:
                    continue
        epoch += 1
        if not infinite:
            break
    try:
        out_q.put(None, timeout=5)
    except Exception:
        pass


class MultiProcessDataLoader:
    """Infinite (train) batched loader with process workers.

    ``mapper_factory(worker_id) -> mapper`` builds one mapper per worker
    (give each a distinct seed for decorrelated augmentation streams).
    """

    def __init__(
        self,
        records: List[dict],
        mapper_factory: Callable[[int], Callable],
        batch_size: int,
        num_workers: int = 4,
        shuffle: bool = True,
        infinite: bool = True,
        seed: int = 0,
        queue_size: int = 64,
    ):
        if not records:
            raise ValueError("empty dataset")
        self.records = records
        self.mapper_factory = mapper_factory
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.infinite = infinite
        self.seed = seed
        self.queue_size = queue_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        ctx = mp.get_context("spawn")
        out_q = ctx.Queue(maxsize=self.queue_size)
        stop_evt = ctx.Event()
        procs = [
            ctx.Process(
                target=_worker_loop,
                args=(w, self.num_workers, self.records,
                      self.mapper_factory, out_q, stop_evt,
                      self.infinite, self.shuffle, self.seed),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        finished = 0
        batch: List[Dict[str, np.ndarray]] = []
        try:
            while finished < self.num_workers:
                sample = out_q.get()
                if sample is None:
                    finished += 1
                    continue
                batch.append(sample)
                if len(batch) == self.batch_size:
                    yield stack_batch(batch)
                    batch = []
            if batch:
                yield stack_batch(batch)
        finally:
            stop_evt.set()
            for p in procs:
                p.join(timeout=2)
                if p.is_alive():
                    p.terminate()
