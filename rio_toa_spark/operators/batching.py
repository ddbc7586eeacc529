"""Arrow-batch coalescing for mapInPandas kernels over small rows.

The session caps Arrow batches at 256 records (session.py) because
TILE rows carry half-megabyte binary payloads. For kernels over tiny
rows (pages, embeddings) that cap splits a partition into thousands of
python batches, and per-batch pandas/Arrow overhead (~ms) dwarfs the
numpy compute (~100µs) — measured as the dominant cost of the
broadcast kNN kernel before it learned to coalesce. Any kernel whose
per-row results are independent can wrap its input iterator in
``coalesce_batches`` to restore efficient numpy batch sizes without
touching the session-wide cap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def coalesce_batches(
    batches: Iterator[pd.DataFrame], target_rows: int = 8192
) -> Iterator[pd.DataFrame]:
    """Concatenate consecutive pandas batches until ~target_rows,
    preserving row order. Result-neutral for row-independent kernels."""
    buf: list[pd.DataFrame] = []
    buffered = 0
    for pdf in batches:
        if not len(pdf):
            continue
        buf.append(pdf)
        buffered += len(pdf)
        if buffered >= target_rows:
            yield buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
            buf, buffered = [], 0
    if buf:
        yield buf[0] if len(buf) == 1 else pd.concat(buf, ignore_index=True)
