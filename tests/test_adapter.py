"""Adapter (LangChain-surface parity) + streaming stateful dedup tests."""

import pytest
from pyspark.sql import functions as F

from vector_lake_spark.adapter import (
    SparkVectorLakeStore,
    embed_texts_df,
    hashed_ngram_embedder,
)

TEXTS = [
    "spark joins and aggregations over parquet",
    "vector similarity search with lsh routing",
    "streaming watermarks and session windows",
    "spark joins and aggregation over parquet files",  # near-dup of [0]
]


def test_embedder_deterministic_and_normalized():
    embed = hashed_ngram_embedder(dim=64)
    a = embed(TEXTS)
    b = embed(TEXTS)
    assert a == b
    norm = sum(x * x for x in a[0]) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-9)


def test_embed_texts_df_keeps_columns(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "id long, document string"
    )
    out = embed_texts_df(df, hashed_ngram_embedder(32))
    assert out.columns == ["id", "document", "vector"]
    rows = out.collect()
    assert len(rows) == 4
    assert len(rows[0]["vector"]) == 32


def test_store_round_trip_search(spark, tmp_path):
    store = SparkVectorLakeStore.from_texts(
        spark,
        str(tmp_path / "store"),
        TEXTS,
        metadatas=[{"i": str(i)} for i in range(len(TEXTS))],
        dimension=64,
        approx_shards=2,  # few shards so related texts stay findable
    )
    hits = store.similarity_search(TEXTS[1], k=2)
    assert hits
    # the exact text must come back as the top hit with score ~1
    assert hits[0]["page_content"] == TEXTS[1]
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-6)
    assert hits[0]["metadata"] == {"i": "1"}


def test_similarity_search_with_score_tuples(spark, tmp_path):
    """LangChain scored-retrieval surface (r05 verdict #9): (doc, score)
    tuples, score = cosine similarity descending, doc stripped of the
    score key."""
    store = SparkVectorLakeStore.from_texts(
        spark, str(tmp_path / "store"), TEXTS, dimension=64, approx_shards=2
    )
    scored = store.similarity_search_with_score(TEXTS[1], k=3)
    assert scored and isinstance(scored[0], tuple)
    docs, scores = zip(*scored)
    assert docs[0]["page_content"] == TEXTS[1]
    assert scores[0] == pytest.approx(1.0, abs=1e-6)
    assert list(scores) == sorted(scores, reverse=True)
    assert all("score" not in d for d in docs)


def test_delete_then_compact_defragments(spark, tmp_path):
    """adapter.delete(compact=True) wires the store's compaction in: the
    survivors stay queryable and each shard collapses back to one file
    (the delete rewrite alone leaves rewritten-but-fragmented shards —
    r05 verdict #9)."""
    import glob

    loc = str(tmp_path / "store")
    store = SparkVectorLakeStore.from_texts(
        spark, loc, TEXTS, dimension=64, approx_shards=2
    )
    # several append generations → multiple files per shard
    more_ids = store.add_texts(["extra doc one", "extra doc two"])
    assert store.delete(more_ids, compact=True) is True

    per_shard: dict = {}
    for f in glob.glob(f"{loc}/data/shard_id=*/*.parquet"):
        shard = f.split("shard_id=")[1].split("/")[0]
        per_shard[shard] = per_shard.get(shard, 0) + 1
    assert per_shard and all(n == 1 for n in per_shard.values())
    assert store.similarity_search(TEXTS[0], k=1)[0]["page_content"] == TEXTS[0]
    assert store.get_by_ids(more_ids) == []


def test_stream_exact_dedup(spark, tmp_path):
    from vector_lake_spark.functions.text import fingerprint64
    from vector_lake_spark.streaming.dedup import stream_exact_dedup

    src = str(tmp_path / "src")
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "delta epsilon"),
            (2, "Alpha  beta   GAMMA"),  # normalizes to a dup of doc 0
            (3, "unique text here"),
        ],
        "doc_id long, text string",
    ).withColumn("fp", fingerprint64(F.col("text")))
    docs.write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream_exact_dedup(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # doc 2 is a normalized duplicate of doc 0 → dropped (min doc_id kept)
    assert kept == {0, 1, 3}


def test_mmr_search_diversifies(spark, tmp_path):
    from vector_lake_spark.adapter import SparkVectorLakeStore

    texts = (
        ["the quick brown fox jumps over the lazy dog"] * 3  # near-identical
        + ["quantum computing with superconducting qubits",
           "recipe for sourdough bread with rye flour",
           "the quick brown fox and other animal fables"]
    )
    store = SparkVectorLakeStore.from_texts(
        spark, str(tmp_path / "mmr_store"), texts
    )
    plain = store.similarity_search("quick brown fox", k=4, n_probes=4)
    mmr = store.max_marginal_relevance_search(
        "quick brown fox", k=4, fetch_k=6, lambda_mult=0.3, n_probes=4
    )
    assert len(mmr) == 4
    def n_unique(docs):
        return len({d["page_content"] for d in docs})
    # the corpus has 3 identical top hits, so plain top-4 has duplicates;
    # MMR must STRICTLY diversify past it (a non-strict >= would pass
    # even if lambda_mult were ignored)
    assert n_unique(plain) < 4
    assert n_unique(mmr) > n_unique(plain)
    assert n_unique(mmr) >= 3
    # top hit is still the most relevant one
    assert "fox" in mmr[0]["page_content"]


def test_async_wrappers(spark, tmp_path):
    """aadd_texts / afrom_texts parity with the reference's asyncio.to_thread
    shims (langchain/__init__.py:69-76,106-116) — closes the last L3 gap."""
    import asyncio

    from vector_lake_spark.adapter import SparkVectorLakeStore

    async def drive():
        store = await SparkVectorLakeStore.afrom_texts(
            spark, str(tmp_path / "async_store"), ["alpha doc", "beta doc"]
        )
        more = await store.aadd_texts(["gamma doc"], [{"k": "v"}])
        return store, more

    store, more_ids = asyncio.run(drive())
    assert len(more_ids) == 1
    hits = store.similarity_search("gamma doc", k=1, n_probes=4)
    assert hits and "gamma" in hits[0]["page_content"]


def test_real_sentence_transformers_embedder_seam(spark):
    """The EmbedFn seam must accept a genuine model with zero adapter
    changes — the reference's pluggable-embeddings contract
    (langchain/__init__.py:33-41, MiniLM default). Runs wherever
    sentence-transformers is installed; skipped-with-reason here (the
    container ships no model libraries — r04 verdict #9)."""
    st = pytest.importorskip(
        "sentence_transformers",
        reason="sentence-transformers not installed in this container; "
        "the seam is exercised with the hashed-n-gram stand-in elsewhere",
    )
    from vector_lake_spark.adapter import embed_texts_df

    model = st.SentenceTransformer("all-MiniLM-L6-v2")

    def embed(texts):
        return [v.tolist() for v in model.encode(texts, convert_to_numpy=True)]

    df = spark.createDataFrame(
        [("a", "vector databases shard embeddings"), ("b", "completely unrelated")],
        "id string, document string",
    )
    out = embed_texts_df(df, embed).collect()
    vecs = {r["id"]: r["vector"] for r in out}
    assert len(vecs["a"]) == 384  # MiniLM dimension, the adapter default
    # embeddings must be real model output: non-degenerate and distinct
    assert vecs["a"] != vecs["b"]


def test_delete_and_get_by_ids(spark, tmp_path):
    """LangChain surface beyond the reference: delete by id (shard-pruned
    rewrite) and ordered get_by_ids with missing ids skipped."""
    from vector_lake_spark.adapter import SparkVectorLakeStore

    store = SparkVectorLakeStore(
        spark, str(tmp_path / "lake"), dimension=32, approx_shards=4
    )
    ids = store.add_texts(
        ["alpha doc", "beta doc", "gamma doc"],
        metadatas=[{"n": "1"}, {"n": "2"}, {"n": "3"}],
    )
    got = store.get_by_ids([ids[2], "missing", ids[0]])
    assert [d["page_content"] for d in got] == ["gamma doc", "alpha doc"]
    assert got[0]["metadata"] == {"n": "3"}

    store.delete([ids[1]])
    assert store.get_by_ids([ids[1]]) == []
    assert store.lake.count() == 2


def test_similarity_search_with_filter(spark, tmp_path):
    """LangChain `filter` dict: metadata equality applied as a
    pre-filter below the top-k heap — every hit satisfies the filter,
    and the qualifying top hit is found even when unfiltered search
    would rank non-qualifying docs above it."""
    store = SparkVectorLakeStore.from_texts(
        spark,
        str(tmp_path / "store"),
        TEXTS,
        metadatas=[
            {"lang": "en" if i % 2 == 0 else "de", "i": i}
            for i in range(len(TEXTS))
        ],
        dimension=64,
        approx_shards=2,
    )
    hits = store.similarity_search(TEXTS[0], k=3, n_probes=2, filter={"lang": "de"})
    assert hits
    assert all(h["metadata"]["lang"] == "de" for h in hits)
    # numeric filter values compare numerically across representations:
    # int 1 matches stored int 1, and float 1.0 matches it too
    hits_i = store.similarity_search(TEXTS[0], k=3, n_probes=2, filter={"i": 1})
    assert [h["metadata"]["i"] for h in hits_i] == [1]
    hits_f = store.similarity_search(
        TEXTS[0], k=3, n_probes=2, filter={"i": 1.0}
    )
    assert [h["metadata"]["i"] for h in hits_f] == [1]
    # scored + MMR surfaces accept the same filter
    scored = store.similarity_search_with_score(
        TEXTS[0], k=2, n_probes=2, filter={"lang": "de"}
    )
    assert scored and all(d["metadata"]["lang"] == "de" for d, _ in scored)
    mmr = store.max_marginal_relevance_search(
        TEXTS[0], k=2, fetch_k=4, n_probes=2, filter={"lang": "de"}
    )
    assert mmr and all(d["metadata"]["lang"] == "de" for d in mmr)
    # non-scalar filter values are rejected loudly
    with pytest.raises(ValueError, match="scalars"):
        store.similarity_search(TEXTS[0], k=1, filter={"lang": ["en", "de"]})


def test_empty_filter_dict_is_unfiltered(spark, tmp_path):
    store = SparkVectorLakeStore.from_texts(
        spark, str(tmp_path / "store"), TEXTS, dimension=64, approx_shards=2
    )
    a = store.similarity_search(TEXTS[0], k=3, n_probes=2, filter={})
    b = store.similarity_search(TEXTS[0], k=3, n_probes=2)
    assert [d["page_content"] for d in a] == [d["page_content"] for d in b]
