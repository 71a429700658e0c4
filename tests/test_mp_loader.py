"""Multi-process loader: spawn workers, per-worker mappers, batch contract.

(This container has 1 CPU core, so no speedup is asserted — only
correctness; the MP design is the scaling path for real multi-core hosts.)
"""

import numpy as np

from yolov7_d2_tpu.data.mp_loader import MultiProcessDataLoader


def _records(n=12):
    return [{"id": i} for i in range(n)]


def _identity_mapper_factory(worker_id):
    def mapper(record):
        return {
            "value": np.full((4,), record["id"], np.int32),
            "worker": np.asarray(worker_id, np.int32),
        }

    return mapper


def test_mp_loader_single_pass_covers_dataset():
    loader = MultiProcessDataLoader(
        _records(12), _identity_mapper_factory, batch_size=4,
        num_workers=2, shuffle=False, infinite=False, seed=0,
    )
    seen = []
    workers = set()
    for batch in loader:
        assert batch["value"].shape[1] == 4
        seen.extend(batch["value"][:, 0].tolist())
        workers.update(batch["worker"].tolist())
    assert sorted(seen) == list(range(12))   # every record exactly once
    assert workers == {0, 1}                 # both workers produced


def test_mp_loader_infinite_stream():
    loader = MultiProcessDataLoader(
        _records(6), _identity_mapper_factory, batch_size=3,
        num_workers=2, shuffle=True, infinite=True, seed=1,
    )
    it = iter(loader)
    batches = [next(it) for _ in range(5)]   # more than one epoch
    assert all(b["value"].shape == (3, 4) for b in batches)
