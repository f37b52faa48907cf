"""Background prefetching of host-side query batches.

SURVEY §7 hard part #4: section-content fetch + tokenization stay host work; TPU
steps are synchronous, so the host must prepare batch t+1 while the device runs
step t. The reference pays this with 8 torch DataLoader worker processes; here a
daemon thread + bounded queue double-buffers the (much lighter) query-side
tokenization.
"""

from __future__ import annotations

import queue
import threading
import typing as typ

_SENTINEL = object()


def prefetch_iterator(it: typ.Iterable, size: int = 2) -> typ.Iterator:
    """Wrap an iterator so items are produced ahead of consumption."""
    q: queue.Queue = queue.Queue(maxsize=size)
    err: list[BaseException] = []

    def worker() -> None:
        try:
            for item in it:
                q.put(item)
        except BaseException as exc:  # noqa: BLE001 - surfaced to the consumer
            err.append(exc)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
