"""Streaming banded-LSH near-duplicate candidate emission — the
incremental ingestion half of the 100 TB near-dup story (r04 verdict #7).

The batch scale path (``operators/ann.lsh_neardup_pairs``) buckets rows
on (shard, band, band-key) and equi-joins within buckets. This module
makes the SAME candidate keys available incrementally: as new vectors
stream in, a stateful operator per bucket emits each candidate pair
exactly once — new-vs-all-previously-seen plus new-vs-new — under the
identical first-matching-band rule the batch join uses, so the union of
emissions over any prefix of the stream equals the batch candidate set
over that prefix. Batch-vs-stream equivalence is oracle-gated by the
registry's ``dedup_stream_neardup`` (same DuckDB oracle as
``vec_neardup_lsh``).

Scale posture:

- **State is ids + band keys, never vectors.** Per bucket the state is
  (array<long> ids, flattened array<long> band keys): tens of bytes per
  row per band, partitioned across the state store by the bucket key —
  the same key economy that bounds the batch join. Exact scoring is a
  downstream batch join against the vector store; the stream never
  shuffles or retains a vector.
- **Hot keys are bounded by construction**: a bucket key holds
  ~shard/2^band_bits of its shard regardless of skew (same argument as
  the batch path, SCALE.md "Dedup family").
- **All Python-side work is integer comparison.** The LSH keys are
  computed by the same native column expressions as batch
  (``operators/lsh.shard_id_expr``) BEFORE the groupBy; the exact cosine
  kernel runs in Spark after the sink. Nothing float-sensitive crosses
  the Arrow boundary, which is what keeps the stream hash-oracle-able.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType(), False),
        T.StructField("id_b", T.LongType(), False),
    ]
)

# parallel arrays: ids[i] pairs with bkeys_flat[i*n_bands:(i+1)*n_bands]
STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType()), False),
        T.StructField("bkeys_flat", T.ArrayType(T.LongType()), False),
    ]
)


def banded_keys(
    v: Column, hyperplanes, bands
) -> tuple[Column, Column]:
    """(shard, bkeys) columns from the SAME native expressions the batch
    path uses — the LSH arithmetic is never duplicated in Python."""
    from vector_lake_spark.operators.lsh import shard_id_expr

    shard = shard_id_expr(v, hyperplanes).cast("long")
    bkeys = F.array(
        *[shard_id_expr(v, b).cast("long") for b in bands]
    )
    return shard, bkeys


def _emit_candidates(n_bands: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        _shard, band, _bkey = key
        if state.exists:
            ids = list(state.get[0])
            flat = list(state.get[1])
        else:
            ids, flat = [], []
        seen = [
            (ids[i], flat[i * n_bands : (i + 1) * n_bands])
            for i in range(len(ids))
        ]
        out_a: list[int] = []
        out_b: list[int] = []
        for pdf in pdfs:
            for nid, nbk in zip(pdf["vec_id"], pdf["bkeys"]):
                nid = int(nid)
                nbk = [int(x) for x in nbk]
                for oid, obk in seen:
                    if oid == nid:
                        continue
                    # first-matching-band rule, identical to the batch
                    # join's residual: this bucket (band index `band`)
                    # owns the pair iff no earlier band already matched.
                    if any(obk[j] == nbk[j] for j in range(band)):
                        continue
                    out_a.append(min(oid, nid))
                    out_b.append(max(oid, nid))
                seen.append((nid, nbk))
                ids.append(nid)
                flat.extend(nbk)
        state.update((ids, flat))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return fn


def stream_neardup_candidates(
    keyed: DataFrame, n_bands: int
) -> DataFrame:
    """Incremental candidate-pair emission over a stream of
    (vec_id long, shard long, bkeys array<long>).

    Each row fans out to its ``n_bands`` bucket keys (narrow 8-byte
    explode, mirrors batch); each bucket's stateful group emits every
    candidate pair exactly once across the whole stream."""
    exploded = (
        keyed.select(
            "vec_id",
            "shard",
            "bkeys",
            F.explode(
                F.array(*[F.lit(b) for b in range(n_bands)])
            ).alias("band"),
        )
        .select(
            "vec_id",
            "shard",
            F.col("band").cast("int").alias("band"),
            F.element_at("bkeys", F.col("band") + 1).alias("bkey"),
            "bkeys",
        )
    )
    return exploded.groupBy("shard", "band", "bkey").applyInPandasWithState(
        _emit_candidates(n_bands),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
