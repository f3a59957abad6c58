"""Self-generated scale testdata (r04 verdict #1).

The driver tables stop at sf0.1 (documents 5k, embeddings 2k, events
100k). This generator reproduces their statistical structure at any
multiple so the ≥1 s bench entries can be measured at sf1 (10×) and
sf10-ish (100×), turning the 100 TB scaling claims from plan-shape
arguments into measured curves (BASELINE.md "sf1 scaling" section).

Structure mimicked from the driver data (profiled, seed-42 files):

- ``documents``: ~31-word vocab salad, 10–100 words/doc, lang ∈ 5,
  source ∈ src0..src19, ~0.2% exact duplicates. PLUS ~2% planted
  near-duplicates (3 word substitutions — Jaccard ≈ 0.9) so the
  shingle-join dedup family has realistic work at every scale.
- ``embeddings``: unit-normalized N(0, I) rows, dim 64, label ∈ 0..9.
  PLUS ~2% planted near-duplicates (Gaussian noise σ=0.15 then
  renormalized — cosine ≈ 0.97) so production-threshold (0.8) near-dup
  has non-empty output. NB: at the registry's low 0.35 testdata
  threshold the TRUE pair count of random unit vectors grows
  quadratically (P(cos ≥ 0.35) ≈ 0.2% at dim 64) — that is a property
  of the threshold, not the generator.
- ``events``: uniform timestamps over 30 days (µs precision, matching the driver files),
  user_id ∈ [0, n/10), event_type ∈ 5 values, value ~ |N(0,50)|,
  props = {"k": int}.

Deterministic (numpy seed 42). Writes parquet via pyarrow with the same
physical types as the driver files. Usage:

    python scripts/gen_testdata.py --out localdata/sf1 --mult 10
    python scripts/gen_testdata.py --out localdata/sf10 --mult 100 --skip-events
"""

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column sort hash join group agg filter scan "
    "query value key order line part batch stream data vector big small "
    "fast slow the a customer index"
).split()
LANGS = ["de", "en", "es", "fr", "zh"]
SOURCES = [f"src{i}" for i in range(20)]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# sf0.1 row counts — mult is relative to these
BASE = {"documents": 5000, "embeddings": 2000, "events": 100_000}


def gen_documents(rng: np.random.RandomState, n: int) -> pa.Table:
    lens = rng.randint(10, 101, n)
    texts = [
        " ".join(VOCAB[i] for i in rng.randint(0, len(VOCAB), ln))
        for ln in lens
    ]
    # ~0.2% exact duplicates of an earlier doc
    for i in rng.choice(np.arange(1, n), max(1, n // 500), replace=False):
        texts[i] = texts[rng.randint(0, i)]
    # ~2% near-duplicates: copy an earlier doc, substitute 3 words
    for i in rng.choice(np.arange(1, n), max(1, n // 50), replace=False):
        words = texts[rng.randint(0, i)].split()
        for _ in range(3):
            words[rng.randint(0, len(words))] = VOCAB[rng.randint(0, len(VOCAB))]
        texts[i] = " ".join(words)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i] for i in rng.randint(0, 5, n)]),
            "source": pa.array([SOURCES[i] for i in rng.randint(0, 20, n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.RandomState, n: int, dim: int = 64) -> pa.Table:
    v = rng.randn(n, dim)
    # ~2% planted near-duplicates of an earlier row (cos ≈ 0.97)
    for i in rng.choice(np.arange(1, n), max(1, n // 50), replace=False):
        j = rng.randint(0, i)
        v[i] = v[j] + 0.15 * rng.randn(dim)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v32 = v.astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(v32.ravel(), pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": emb,
            "label": pa.array(rng.randint(0, 10, n), pa.int32()),
        }
    )


def gen_events(rng: np.random.RandomState, n: int) -> pa.Table:
    # micros NTZ — matches the driver files' physical type (profiled:
    # Timestamp(isAdjustedToUTC=false, microseconds))
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span_us = 30 * 86400 * 10**6
    ts = np.sort(t0 + (rng.rand(n) * span_us).astype(np.int64))
    props = [f'{{"k": {k}}}' for k in rng.randint(0, 100, n)]
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.randint(0, max(n // 10, 1), n), pa.int64()),
            "event_type": pa.array(
                [EVENT_TYPES[i] for i in rng.randint(0, 5, n)]
            ),
            "value": pa.array(np.abs(rng.randn(n) * 50), pa.float64()),
            "props": pa.array(props, pa.string()),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--mult", type=float, default=10.0, help="multiple of sf0.1 sizes")
    ap.add_argument("--skip-events", action="store_true")
    ap.add_argument(
        "--only-events",
        action="store_true",
        help="generate just events.parquet (events-family stresses)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(42)

    if args.only_events:
        n_ev = int(BASE["events"] * args.mult)
        pq.write_table(gen_events(rng, n_ev), f"{args.out}/events.parquet")
        print(f"events: {n_ev}")
        return

    n_docs = int(BASE["documents"] * args.mult)
    pq.write_table(
        gen_documents(rng, n_docs), f"{args.out}/documents.parquet"
    )
    print(f"documents: {n_docs}")

    n_emb = int(BASE["embeddings"] * args.mult)
    pq.write_table(
        gen_embeddings(rng, n_emb), f"{args.out}/embeddings.parquet"
    )
    print(f"embeddings: {n_emb}")

    if not args.skip_events:
        n_ev = int(BASE["events"] * args.mult)
        pq.write_table(gen_events(rng, n_ev), f"{args.out}/events.parquet")
        print(f"events: {n_ev}")


if __name__ == "__main__":
    main()
