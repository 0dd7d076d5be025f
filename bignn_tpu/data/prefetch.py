"""Host-side batch prefetch (SURVEY.md T4).

The hierarchical sampler costs ~35 ms/step at config-#4 scale — comparable
to the device step — so a sequential sample->dispatch loop nearly doubles
step time. One background thread draws batches ahead into a depth-bounded
queue: host sampling overlaps device compute, and because the sampler's RNG
is touched only by that single thread, the batch sequence is bit-identical
to the sequential loop (checkpoint-resume equality is preserved — draws stay
a pure function of (seed, epoch, step)).

Device placement (jnp.asarray / sharded device_put) stays on the caller's
thread: only NumPy work is prefetched.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class EpochPrefetcher:
    """Draw exactly ``n`` batches on one background thread, FIFO.

    ``depth`` bounds the queue so a fast sampler cannot race arbitrarily far
    ahead of the consumer (memory) while still hiding sampling latency.
    Exceptions in the worker re-raise in the consumer.
    """

    _SENTINEL = object()

    def __init__(self, draw: Callable[[], object], n: int, depth: int = 3):
        self.n = n
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._exc: BaseException | None = None

        def work():
            try:
                for _ in range(n):
                    self._q.put(draw())
            except BaseException as e:  # surfaced by __iter__
                self._exc = e
                self._q.put(self._SENTINEL)

        self._thread = threading.Thread(
            target=work, name="bignn-prefetch", daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        for _ in range(self.n):
            item = self._q.get()
            if item is self._SENTINEL:
                raise self._exc
            yield item
        self._thread.join()


class ParallelPrefetcher:
    """Draw batches ``fn(0) .. fn(n-1)`` on a small thread pool, yielding in
    index order with a bounded in-flight window.

    Requires ``fn`` to be ORDER-INDEPENDENT — a pure function of its index
    (HierarchicalSampler.sample_compact_at derives a per-(epoch, idx) RNG for
    exactly this) — so concurrency cannot change the trajectory. NumPy
    releases the GIL in its big kernels (argsort/unique dominate the
    sampler), so 2-3 workers give near-linear host-sampling speedup.
    """

    def __init__(self, fn: Callable[[int], object], n: int,
                 workers: int = 2, depth: int = 6):
        self.fn = fn
        self.n = n
        self.workers = max(1, workers)
        self.depth = max(self.workers, depth)

    def __iter__(self) -> Iterator:
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            self.workers, thread_name_prefix="bignn-prefetch"
        ) as ex:
            window: deque = deque()
            for i in range(self.n):
                window.append(ex.submit(self.fn, i))
                if len(window) >= self.depth:
                    yield window.popleft().result()
            while window:
                yield window.popleft().result()
