"""Long-form audio near-dup ladder (r12, VERDICT r11 #3).

Two costs matter at scale and they separate cleanly:

1. **Fingerprinting throughput** (the Arrow stage): REAL WAV decode +
   per-512-sample-window FFT + hash for minutes-long clips. Measured
   driver-side on one core (the stage is embarrassingly parallel —
   multiply by executor cores for cluster throughput): a 10-minute
   8 kHz clip is ~9.4k windows; the per-window cost is the honest
   unit.

2. **The grouped pair join** (the shuffle): (recording, window_no,
   sig) rows through ``hamming_neardup_pairs(group_cols=[window_no])``
   + the m-of-n aggregate. Synthetic per-window signatures (xxhash64;
   decoding millions of real clips would measure numpy's FFT again,
   not the join) with planted near-dup recordings: every 50th
   recording spawns a twin whose windows sit at Hamming distance 0–3.
   Rung: 200k recordings × 16 windows = 3.2M grouped signature rows.

Feeds SCALE.md "Long-form audio near-dup".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vector_lake_spark.operators.audiofp import (
    audio_fingerprint_windows,
    mux_pcm16_wav,
)
from vector_lake_spark.operators.binary import hamming_neardup_pairs
from vector_lake_spark.session import get_spark

# --- 1. fingerprint throughput on a REAL minutes-long clip ------------
RATE = 8000
MINUTES = int(os.environ.get("STRESS_MINUTES", "10"))
rng = np.random.RandomState(7)
clip = (rng.normal(0, 2000, size=RATE * 60 * MINUTES)).astype(np.int16)
payload = mux_pcm16_wav(clip, rate=RATE)
from vector_lake_spark.operators.audiofp import decode_wav_samples

t0 = time.time()
samples, _ = decode_wav_samples(payload)
wins = audio_fingerprint_windows(samples)
dt = time.time() - t0
print(
    f"fingerprint {MINUTES}-min clip ({len(payload)/1e6:.1f} MB, "
    f"{len(wins)} windows): {dt:.2f}s driver-side single-core "
    f"({len(wins)/dt:.0f} windows/s)",
    flush=True,
)

# --- 2. grouped pair join at corpus scale -----------------------------
spark = get_spark("audiolong_stress")
spark.sparkContext.setLogLevel("ERROR")

N_REC = int(os.environ.get("STRESS_RECORDINGS", "200000"))
N_WIN = int(os.environ.get("STRESS_WINDOWS", "16"))

base = (
    spark.range(N_REC)
    .withColumnRenamed("id", "media_id")
    .crossJoin(
        F.broadcast(
            spark.range(N_WIN).withColumnRenamed("id", "window_no")
        )
    )
    .select(
        "media_id",
        F.col("window_no").cast("int").alias("window_no"),
        F.xxhash64("media_id", "window_no").alias("sig"),
    )
)
planted = base.filter(F.col("media_id") % 50 == 0).selectExpr(
    f"media_id + {N_REC}L AS media_id",
    "window_no",
    # window w of the twin sits at distance (media_id + w) % 4; the
    # CASE guards the d=0 leg — Spark's sequence(1, 0) is the
    # DESCENDING [1, 0], not empty (review r12), which would plant 2
    # flips where the model says 0
    "CASE WHEN (media_id + window_no) % 4 = 0 THEN sig ELSE "
    "aggregate(sequence(1, int((media_id + window_no) % 4)), sig, "
    "(acc, j) -> acc ^ shiftleft(1L, int((media_id * 11 + window_no "
    "* 5 + j * 17) % 64))) END AS sig",
)
sigs = base.unionAll(planted).repartition(64).localCheckpoint(eager=True)
total = sigs.count()
t0 = time.time()
pairs = hamming_neardup_pairs(
    sigs,
    radius=7,
    id_col="media_id",
    n_blocks=8,
    group_cols=["window_no"],
)
n_match = (
    pairs.groupBy("id_a", "id_b")
    .agg(F.count(F.lit(1)).alias("m"))
    .filter(F.col("m") >= int(N_WIN * 3 / 4))
    .count()
)
print(
    f"grouped join {total} window-sigs ({N_REC}+twins recordings x "
    f"{N_WIN} windows), radius 7, m-of-n >= {int(N_WIN * 3 / 4)}: "
    f"{n_match} recording pairs in {time.time()-t0:.1f}s",
    flush=True,
)

spark.stop()
