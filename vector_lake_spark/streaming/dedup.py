"""Streaming exact deduplication — a custom stateful operator via
``applyInPandasWithState``.

Emits only the first occurrence of each content fingerprint across the
whole (unbounded) stream; per-key state is a single seen-count long, so
state size is O(distinct keys) and independent of stream length. This is
the streaming form of ``operators/dedup.exact_dedup`` (the reference has
no streaming at all — SURVEY.md §2.A.1).

At scale: state lives in the state store partitioned by the group key, so
dedup shuffles each batch once on the fingerprint — same key movement as
the batch hash-groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType(), False)])


def _emit_first(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    seen = state.get[0] if state.exists else 0
    first_seen = seen == 0
    # A group can be split across pandas chunks within one micro-batch:
    # track the running min-doc_id row across ALL chunks and emit once
    # after the loop, so the survivor is the batch minimum, not an
    # artifact of chunk order.
    best = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cand = pdf.sort_values("doc_id").head(1)
        if best is None or cand["doc_id"].iloc[0] < best["doc_id"].iloc[0]:
            best = cand
        seen += len(pdf)
    state.update((seen,))
    if first_seen and best is not None:
        yield pd.DataFrame(
            {
                "fp": [fp],
                "doc_id": best["doc_id"].iloc[0:1].values,
                "text": best["text"].iloc[0:1].values,
            }
        )


def stream_exact_dedup(docs: DataFrame, fp_col: str = "fp") -> DataFrame:
    """First-occurrence-only pass over a stream of (fp, doc_id, text)."""
    return docs.groupBy(fp_col).applyInPandasWithState(
        _emit_first,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
