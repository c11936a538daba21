"""Background frame prefetcher: overlap disk IO/decode with device compute.

The SLAM loop is a strict frame sequence, but loading frame i+1 (imread,
jpeg/png decode, resize) is independent of processing frame i — a single
worker thread keeps a small queue ahead of the consumer, hiding host IO
behind the jitted tracking/mapping dispatches (the reference uses a
torch DataLoader with num_workers for the same effect, coslam.py:651).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional


class PrefetchIterator:
    """Iterate ``(i, dataset[i])`` for i in [0, n_frames) with lookahead.

    Loading happens on a daemon worker thread; a queue of ``depth``
    pre-loaded frames stays ahead of the consumer. Exceptions raised by
    the loader are re-raised at the consumer's next ``__next__``.

    ``transform(i, batch) -> batch`` (optional) runs in the WORKER
    thread right after the load — the SLAM loop uses it to stage
    host->device uploads (frame blocks, tracking rays) a frame early so
    the transfer latency hides behind the previous frame's device
    compute. It must not touch consumer-thread state.
    """

    def __init__(self, dataset, n_frames: Optional[int] = None,
                 depth: int = 2, start: int = 0, transform=None):
        self.dataset = dataset
        total = len(dataset)
        self.total = total if n_frames is None else min(n_frames, total)
        self.start = min(max(int(start), 0), self.total)
        self.transform = transform
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._thread: Optional[threading.Thread] = None

    def __len__(self):
        return self.total

    def _worker(self):
        try:
            for i in range(self.start, self.total):
                batch = self.dataset[i]
                if self.transform is not None:
                    batch = self.transform(i, batch) or batch
                self._q.put((i, batch))
            self._q.put(None)  # end-of-sequence
        except BaseException as e:  # surfaced at the consumer
            self._q.put(e)

    def __iter__(self):
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item
