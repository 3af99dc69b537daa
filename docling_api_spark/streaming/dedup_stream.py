"""Streaming exact dedup — the incremental keep-set a training-data
pipeline maintains over a crawl feed (SURVEY.md Table B "Streaming" row;
composes the dedup family with Structured Streaming the way
``incremental_dedup`` composes it with batch).

Semantics: per content hash, the FIRST occurrence to arrive is the
canonical document and is emitted exactly once; every later duplicate —
same micro-batch, later batch, or a later separately-launched run against
the same checkpoint — emits nothing and only bumps the state counter.
Within a batch the smallest doc_id wins (deterministic). For a crawl feed
arriving in doc_id order, first-to-arrive == global-min, so the streamed
keep-set equals the batch ``dedup_exact`` canonical set — the parity the
test pins.

Scale shape: state is hash-partitioned on the content key by the state
store (RocksDB on a real cluster); each micro-batch shuffles only its own
rows; state per key is 16 bytes (canonical id + count) — 10^12 documents
of state shard across executors, never through the driver.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "content_key string, doc_id bigint, batch_dups bigint"

STATE_DDL = "canonical long, n long"


def _dedup_group(key: Tuple[Any],
                 pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    (content_key,) = key
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(x) for x in pdf["doc_id"])
    if not ids:
        return
    if state.exists:
        canonical, n = state.get
        state.update((canonical, n + len(ids)))
        return  # already emitted: duplicates are silent
    mn = min(ids)
    state.update((mn, len(ids)))
    yield pd.DataFrame({"content_key": [content_key],
                        "doc_id": [mn],
                        "batch_dups": [len(ids)]})


def dedup_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs readStream (doc_id, <text_col>) → first-occurrence rows.

    The content key is computed map-side (``md5``), so the only movement
    is the state-store shuffle on the key — identical plan shape to the
    batch hash-groupBy dedup."""
    keyed = docs.select(F.md5(F.col(text_col)).alias("content_key"),
                        "doc_id")
    return (keyed
            .groupBy("content_key")
            .applyInPandasWithState(
                _dedup_group, OUTPUT_DDL, STATE_DDL,
                "update", GroupStateTimeout.NoTimeout))
