"""Background-prefetch loader: overlap host tokenization with device compute.

The reference leans on torch DataLoader worker processes
(``num_workers=2..4``, reference eval_sparse.py:94-96, :136-141). In a
single-process JAX pipeline the equivalent is a bounded producer thread: the
collator (HF tokenizers releases the GIL) prepares the next batches while the
chip encodes the current one. On a corpus encode this hides most of the
tokenization cost behind the forward pass.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class PrefetchLoader:
    """Wrap any batch iterable with an N-deep background prefetch queue."""

    _SENTINEL = object()

    def __init__(self, loader: Iterable, depth: int = 4):
        self.loader = loader
        self.depth = depth
        self.batch_size = getattr(loader, "batch_size", None)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.loader)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err: list = []

        def produce():
            try:
                for batch in self.loader:
                    q.put(batch)
            except BaseException as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]
