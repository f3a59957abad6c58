"""The vector-lake store: LSH-sharded partitioned Parquet + exact re-rank.

API parity with the reference's ``Index`` / ``VectorLake`` / ``Partition``
(``/root/reference/vector_lake/core/index.py:431-607``), batch-first:

- ``add_batch``    ≈ ``VectorLake.add`` (I1/I2 row construction, routed)
- ``persist``      ≈ ``Index.persist`` / ``LazyBucket.sync`` (S2) — one
                     ``write.partitionBy("shard_id")`` append; the dirty-row
                     watermark machinery (I3) is subsumed by append-only
                     writes.
- ``load``         ≈ ``LazyBucket._lazy_load`` (S1) — lazy by construction;
                     schema validated against the fixed frame schema
                     (index.py:249-250 behavior).
- ``query``        ≈ ``Index._query`` route→probe→rank (A8/A9) — shard
                     filter (partition-pruned) + exact cosine top-k. Returns
                     *most*-similar rows: the reference's similarity-
                     direction bug is deliberately not reproduced
                     (SURVEY.md §3.2).
- ``delete``       ≈ S6/S8 — recursive dataset delete.

Deliberate deviations (SURVEY.md §7.4): ids are uuid4 via ``F.uuid()`` (or
caller-supplied) rather than time-ordered uuid1; metadata is a JSON string
column (lossless for arbitrary dicts); similarity direction fixed.

Storage layout: ``{location}/data/shard_id=N/*.parquet`` (gzip, matching
the reference's compression choice at index.py:308) plus a ``_meta.json``
sidecar for store attrs (the reference stuffs attrs into pandas
``DataFrame.attrs`` → Parquet metadata, index.py:296-305; a sidecar is the
idiomatic dataset-level equivalent).

Scale design: ``shard_id`` is a physical partition column, so a query's
``WHERE shard_id IN (...)`` prunes directories at planning time — on a
100 TB store with 256 shards a single-probe query reads ~0.4% of the data.
Appends never rewrite existing files (the reference rewrites whole segments
per sync — index.py:307-308 — which cannot scale); small-file compaction is
an explicit ``compact()`` maintenance op.
"""

from __future__ import annotations

import json
import shutil
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from vector_lake_spark.functions.vectors import to_double_array
from vector_lake_spark.operators import lsh as lsh_mod
from vector_lake_spark.operators.topk import topk_cosine

# Reference frame schema (index.py:198-200) mapped per SURVEY.md §1.1.
LAKE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.DoubleType()), False),
        T.StructField("metadata", T.StringType(), True),  # JSON
        T.StructField("document", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)


class SparkVectorLake:
    """LSH-sharded vector store (reference ``Index``/``VectorLake`` parity)."""

    def __init__(
        self,
        spark: SparkSession,
        location: str,
        dimension: int,
        approx_shards: int = 16,
        seed: int = 42,
    ):
        self.spark = spark
        self.location = str(location)
        self.dimension = dimension
        self.num_hashes = lsh_mod.num_hashes_for(approx_shards)
        self.num_shards = 2**self.num_hashes
        self.hyperplanes = lsh_mod.make_hyperplanes(dimension, self.num_hashes, seed)
        self._pending: list[DataFrame] = []

    # -- ingest -------------------------------------------------------------

    def add_batch(
        self,
        vectors: Sequence[Sequence[float]],
        metadata: Sequence[dict] | None = None,
        documents: Sequence[str] | None = None,
        ids: Sequence[str] | None = None,
    ) -> list[str]:
        """Batch ingest (the reference's per-row ``add`` is a batch of 1).

        Returns the assigned ids. Rows are routed but kept lazy until
        ``persist()`` — mirroring the reference's dirty-rows-then-sync
        contract (index.py:271-272)."""
        n = len(vectors)
        import uuid

        ids = list(ids) if ids is not None else [str(uuid.uuid4()) for _ in range(n)]
        metadata = list(metadata) if metadata is not None else [{} for _ in range(n)]
        documents = list(documents) if documents is not None else [""] * n
        rows = [
            (
                ids[i],
                [float(x) for x in vectors[i]],
                # I2: falsy metadata → {"id": "1"} (index.py:574-576)
                json.dumps(metadata[i] if metadata[i] else {"id": "1"}, sort_keys=True),
                documents[i],
            )
            for i in range(n)
        ]
        df = self.spark.createDataFrame(
            rows, schema="id string, vector array<double>, metadata string, document string"
        ).withColumn("timestamp", F.current_timestamp())
        self._pending.append(df)
        return ids

    def add_dataframe(self, df: DataFrame) -> None:
        """Ingest a prepared DataFrame with at least a ``vector`` column;
        missing schema columns are defaulted (I1 semantics)."""
        cols = set(df.columns)
        if "id" not in cols:
            df = df.withColumn("id", F.uuid())
        if "metadata" not in cols:
            df = df.withColumn("metadata", F.lit(json.dumps({"id": "1"})))
        if "document" not in cols:
            df = df.withColumn("document", F.lit(""))
        if "timestamp" not in cols:
            df = df.withColumn("timestamp", F.current_timestamp())
        df = df.withColumn("vector", to_double_array(F.col("vector")))
        self._pending.append(df.select([f.name for f in LAKE_SCHEMA.fields]))

    # -- durability ---------------------------------------------------------

    def persist(self, **attrs) -> None:
        """Route pending rows and append them as shard-partitioned Parquet
        (S2). Append-only: existing files are never rewritten."""
        if not self._pending:
            return
        df = self._pending[0]
        for extra in self._pending[1:]:
            df = df.unionByName(extra)
        routed = df.withColumn(
            "shard_id", lsh_mod.shard_id_expr(F.col("vector"), self.hyperplanes)
        )
        # Cluster rows by shard before writing: without this every write
        # task emits a file into every shard dir (tasks × shards tiny files
        # — the small-file pathology); with it each shard lands in one file
        # per batch.
        (
            routed.repartition("shard_id")
            .write.mode("append")
            .option("compression", "gzip")
            .partitionBy("shard_id")
            .parquet(self._data_path)
        )
        self._pending = []
        self._write_meta(attrs)

    @property
    def _data_path(self) -> str:
        return str(Path(self.location) / "data")

    def _write_meta(self, attrs: dict) -> None:
        import datetime

        meta_path = Path(self.location) / "_meta.json"
        meta = {
            "dimension": self.dimension,
            "num_hashes": self.num_hashes,
            "num_shards": self.num_shards,
            "last_update": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        meta.update({k: _json_safe(v) for k, v in attrs.items()})
        meta_path.parent.mkdir(parents=True, exist_ok=True)
        meta_path.write_text(json.dumps(meta, indent=2, default=str))

    # -- read path ----------------------------------------------------------

    def load(self) -> DataFrame:
        """Lazy scan of the whole store; schema validated like the
        reference's frame_schema check (index.py:249-250). A store that was
        never persisted scans as empty (the reference returns [] for
        empty-store queries — tests/test_properties.py:74-85)."""
        if not Path(self._data_path).exists():
            empty = self.spark.createDataFrame([], schema=LAKE_SCHEMA)
            return empty.withColumn("shard_id", F.lit(0).cast("long"))
        df = self.spark.read.parquet(self._data_path)
        expected = {f.name for f in LAKE_SCHEMA.fields} | {"shard_id"}
        if set(df.columns) != expected:
            raise ValueError(
                f"schema drift: store columns {sorted(df.columns)} != expected {sorted(expected)}"
            )
        return df

    def query(
        self, vector: Sequence[float], k: int = 4, n_probes: int = 1
    ) -> DataFrame:
        """Route → partition-pruned probe → exact cosine top-k (A8/A9/A11).

        ``n_probes > 1`` adds lowest-margin bit-flip shards (multi-probe;
        recall knob the reference lacks)."""
        from vector_lake_spark.operators.ann import multiprobe_shards

        probes = multiprobe_shards(vector, self.hyperplanes, n_probes)
        pruned = self.load().filter(F.col("shard_id").isin(probes))
        return topk_cosine(
            pruned, [float(x) for x in vector], k, vec_col="vector", id_col="id",
            keep_cols=("metadata", "document", "timestamp"),
        )

    def stream_ingest(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_available_now: bool = True,
    ):
        """Structured-Streaming ingest: each micro-batch is routed and
        appended exactly like ``persist`` (same shard clustering), with
        the stream checkpoint playing the role of the reference's
        ``_synced_rows`` watermark (index.py:289 — SURVEY §2.A I3).
        Returns the started StreamingQuery."""

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            routed = batch_df.withColumn(
                "shard_id", lsh_mod.shard_id_expr(F.col("vector"), self.hyperplanes)
            )
            (
                routed.repartition("shard_id")
                .write.mode("append")
                .option("compression", "gzip")
                .partitionBy("shard_id")
                .parquet(self._data_path)
            )

        writer = (
            stream_df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def query_batch(
        self, queries_df: DataFrame, k: int = 4, n_probes: int = 1
    ) -> DataFrame:
        """Batched routed search: N queries in ONE job.

        ``queries_df``: (query_id long, qv array<double>). Queries are
        routed driver-side (a query batch is small by definition) and
        broadcast as per-shard numpy matrices; the store is scanned ONCE
        with ``mapInPandas`` doing a blocked matrix multiply per Arrow
        batch and emitting only each query's per-batch top-k. A final
        window over (queries × k × batches) rows — thousands, not
        millions — merges to the global top-k.

        Why not a pure-DataFrame join+window: LSH shards are heavily
        skewed on real data (the reference's own pathology — uniform
        vectors concentrate in a handful of shards), so an equi-join on
        shard_id produces |shard|×|queries-in-shard| pair rows (tens of
        millions at 50k×1k) and the rank shuffles all of them. The Arrow
        path keeps the pair explosion inside numpy (a ~0.1s matmul) and
        shuffles only winners. Store rows never shuffle at all."""
        import numpy as np
        import pandas as pd

        from vector_lake_spark.operators.ann import multiprobe_shards

        qrows = queries_df.collect()
        by_shard: dict[int, tuple[list, "np.ndarray"]] = {}
        for r in qrows:
            qv = np.asarray(r["qv"], dtype=np.float64)
            for shard in multiprobe_shards(qv, self.hyperplanes, n_probes):
                ids, mats = by_shard.setdefault(shard, ([], []))
                ids.append(r["query_id"])
                mats.append(qv)
        shard_mats = {
            s: (ids, np.stack(vecs)) for s, (ids, vecs) in by_shard.items()
        }
        bc = self.spark.sparkContext.broadcast(shard_mats)
        out_schema = (
            "query_id long, id string, document string, score double"
        )

        def score_batches(batches):
            for pdf in batches:
                for shard, grp in pdf.groupby("shard_id"):
                    entry = bc.value.get(int(shard))
                    if entry is None or len(grp) == 0:
                        continue
                    qids, qmat = entry
                    V = np.stack(grp["vector"].to_numpy())
                    vn = np.linalg.norm(V, axis=1)
                    qn = np.linalg.norm(qmat, axis=1)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        sims = (V @ qmat.T) / np.outer(vn, qn)
                    top = min(k, len(grp))
                    for j, qid in enumerate(qids):
                        col = sims[:, j]
                        idx = np.argpartition(-col, top - 1)[:top]
                        yield pd.DataFrame(
                            {
                                "query_id": qid,
                                "id": grp["id"].to_numpy()[idx],
                                "document": grp["document"].to_numpy()[idx],
                                "score": np.round(col[idx], 6),
                            }
                        )

        from pyspark.sql import Window

        partial = self.load().select(
            "shard_id", "id", "document", "vector"
        ).mapInPandas(score_batches, schema=out_schema)
        w = Window.partitionBy("query_id").orderBy(
            F.col("score").desc(), F.col("id")
        )
        return (
            partial.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= k)
        )

    def query_vectors(self, vector: Sequence[float], k: int = 4) -> list:
        """A10 parity: vectors only."""
        return [r["vector"] for r in self.query(vector, k).select("vector", "score").collect()]

    def count(self) -> int:
        """S9 parity."""
        return self.load().count()

    # -- maintenance --------------------------------------------------------

    def compact(self, target_files_per_shard: int = 1) -> None:
        """Rewrite each shard into ``target_files_per_shard`` files — the
        small-files fix for the reference's 256-tiny-segments pathology
        (SURVEY.md §7.7). Dynamic partition overwrite: only shards present
        in the rewrite are replaced."""
        df = self.load()
        (
            df.repartition(target_files_per_shard * self.num_shards, "shard_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("compression", "gzip")
            .partitionBy("shard_id")
            .parquet(self._data_path)
        )

    def delete(self) -> None:
        """S6/S8 parity: remove the dataset."""
        shutil.rmtree(self.location, ignore_errors=True)


class SparkPartition(SparkVectorLake):
    """Reference ``Partition`` parity (index.py:592-607): user-directed
    partitioning by an explicit key instead of LSH — exactly one logical
    bucket per key value."""

    def __init__(self, spark: SparkSession, location: str, partition_key: str, dimension: int):
        super().__init__(spark, location, dimension, approx_shards=2)
        self.partition_key = partition_key

    def persist(self, **attrs) -> None:
        if not self._pending:
            return
        df = self._pending[0]
        for extra in self._pending[1:]:
            df = df.unionByName(extra)
        routed = df.withColumn("shard_id", F.lit(self.partition_key))
        (
            routed.write.mode("append")
            .option("compression", "gzip")
            .partitionBy("shard_id")
            .parquet(self._data_path)
        )
        self._pending = []
        self._write_meta(attrs)

    def query(self, vector: Sequence[float], k: int = 4, n_probes: int = 1) -> DataFrame:
        pruned = self.load().filter(F.col("shard_id") == self.partition_key)
        return topk_cosine(
            pruned, [float(x) for x in vector], k, vec_col="vector", id_col="id",
            keep_cols=("metadata", "document", "timestamp"),
        )


def _json_safe(v):
    """Reference S3 behavior (index.py:224-238): coerce to JSON-safe."""
    import datetime

    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    return v
