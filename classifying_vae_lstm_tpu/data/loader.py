"""Host-streaming batch loader with device prefetch.

The default training path uploads whole splits to HBM once and scans
minibatches on device (:mod:`..train.loop`) — right for the reference-scale
corpora (~10 MB). For corpora that do NOT fit in HBM, this module provides the
classic double-buffered host pipeline: shuffle on host (using the C++
``gather_rows`` when built), slice batches, and keep ``prefetch`` batches in
flight with ``jax.device_put`` so the device never waits on the host.

Used by :meth:`..train.loop.Trainer.train_epoch_streaming`.
"""

from __future__ import annotations

import collections
from typing import Iterator

import jax
import numpy as np


def batch_iterator(data: dict, batch_size: int, rng: np.random.Generator | None = None,
                   drop_remainder: bool = True) -> Iterator[dict]:
    """Yield host-side batch dicts; shuffled when ``rng`` is given."""
    n = len(next(iter(data.values())))
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    end = n - (n % batch_size) if drop_remainder else n
    arrays = {}
    for k, v in data.items():
        v = np.asarray(v)
        try:
            from ..runtime import gather_rows, is_available

            arrays[k] = gather_rows(v, idx[:end]) if is_available() and rng is not None else v[idx[:end]]
        except Exception:
            arrays[k] = v[idx[:end]]
    for i in range(0, end, batch_size):
        yield {k: v[i : i + batch_size] for k, v in arrays.items()}


def device_prefetch(iterator: Iterator[dict], prefetch: int = 2, device=None) -> Iterator[dict]:
    """Keep ``prefetch`` batches in flight on device ahead of consumption."""
    queue: collections.deque = collections.deque()

    def put(batch):
        queue.append({k: jax.device_put(v, device) for k, v in batch.items()})

    it = iter(iterator)
    try:
        for _ in range(prefetch):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            put(next(it))
        except StopIteration:
            pass
        yield out
