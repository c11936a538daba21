"""Multi-worker prefetch iterator: ordering, staging, failure paths.

The reference hides frame decode behind a torch DataLoader with
num_workers: 4 (coslam.py:651, configs/Replica/replica.yaml); our
PrefetchIterator must deliver the same strict frame order with the
transform applied serially, whatever the worker count.
"""

import threading
import time

import pytest

from coslam_tpu.data.prefetch import PrefetchIterator


class SlowDataset:
    """Variable-latency loads to force out-of-order completion."""

    def __init__(self, n=24):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        # Earlier frames are SLOWER: with 4 workers, frame i+1 often
        # finishes before frame i — the resequencer must reorder.
        time.sleep(0.002 if i % 3 == 0 else 0.0)
        return {"frame_id": i, "payload": i * 10}


@pytest.mark.parametrize("workers", [1, 4])
def test_order_and_content(workers):
    ds = SlowDataset()
    out = list(PrefetchIterator(ds, workers=workers))
    assert [i for i, _ in out] == list(range(len(ds)))
    assert [b["payload"] for _, b in out] == [i * 10 for i in range(len(ds))]


def test_start_and_n_frames():
    ds = SlowDataset()
    out = list(PrefetchIterator(ds, n_frames=10, start=3, workers=4))
    assert [i for i, _ in out] == list(range(3, 10))


def test_transform_runs_serially_in_order():
    ds = SlowDataset()
    seen = []
    tids = set()

    def transform(i, batch):
        seen.append(i)
        tids.add(threading.get_ident())
        batch["staged"] = True
        return batch

    out = list(PrefetchIterator(ds, workers=4, transform=transform))
    assert seen == list(range(len(ds)))  # strict frame order
    assert len(tids) == 1                # ONE stage thread (cache safety)
    assert all(b["staged"] for _, b in out)


@pytest.mark.parametrize("workers", [1, 4])
def test_loader_exception_propagates(workers):
    class Failing(SlowDataset):
        def __getitem__(self, i):
            if i == 7:
                raise RuntimeError("decode failed")
            return super().__getitem__(i)

    it = iter(PrefetchIterator(Failing(), workers=workers))
    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for i, _ in it:
            got.append(i)
    assert got == list(range(7))  # frames before the failure all arrive


def test_transform_exception_propagates():
    def transform(i, batch):
        if i == 5:
            raise ValueError("stage failed")
        return batch

    it = iter(PrefetchIterator(SlowDataset(), workers=4,
                               transform=transform))
    with pytest.raises(ValueError, match="stage failed"):
        list(it)


def test_slow_consumer_bounded_lookahead():
    """A stalled consumer must not let loaders run to the end of the
    dataset (memory bound = workers + 2*depth frames)."""
    loaded = []

    class Tracking(SlowDataset):
        def __getitem__(self, i):
            loaded.append(i)
            return super().__getitem__(i)

    it = iter(PrefetchIterator(Tracking(n=100), workers=4, depth=2))
    next(it)
    time.sleep(0.1)  # consumer stalls; loaders must hit the budget
    assert len(loaded) <= 4 + 2 * 2 + 1
