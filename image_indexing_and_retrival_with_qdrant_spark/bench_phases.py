"""Wall-clock phase accumulator for bench.py's build/search split.

The lifecycle registry queries (``ingest_*``) time collection create +
upsert + index/quantizer train + search as ONE number, so a read-path
regression hides inside build noise (round 7's 35 s
``ingest_quantized_batch_search`` driver sample was exactly that
ambiguity — VERDICT r7 #4). Query builders wrap their read-path (or,
for lazily-returned results, their eagerly-materialized build) section
in ``with phase("search")`` / ``with phase("build")``; bench.py calls
``reset()`` before each timed entry and ``snapshot()`` after, then
derives the other component as ``total - marked``. Always-on and
allocation-free, so correctness runs (driver, pytest, oracle sweeps)
pay nothing for it.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Iterator

_ACC: dict[str, float] = {}


@contextmanager
def phase(name: str) -> Iterator[None]:
    """Accumulate wall time under ``name`` ("build" or "search")."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _ACC[name] = _ACC.get(name, 0.0) + (time.perf_counter() - t0)


def reset() -> None:
    _ACC.clear()


def snapshot() -> dict[str, float]:
    return dict(_ACC)
