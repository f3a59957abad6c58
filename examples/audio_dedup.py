"""The r12 audio near-dup stack in one runnable tour:
cross-codec fingerprints → pairs → long-form windows → m-of-n.

    python examples/audio_dedup.py

The curation shape: the SAME clip re-encoded as PCM WAV, float WAV or
FLAC must collapse under one integer fingerprint — so the fingerprint
runs on DECODED samples (`audiofp.decode_wav_samples` routes the
repo's whole codec stack) and the banded-Hamming join never sees a
payload byte. Long recordings fingerprint per 512-sample window and
pair on (window_no, band, key) with an m-of-n matched-windows
aggregate — the temporal-alignment pattern shared with video. All
decoders are this repo's own stdlib/numpy codecs; no ffmpeg anywhere.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vector_lake_spark.session import get_spark


def _tone_clip(rng, n_windows=4):
    """A clip of full-frame cosines (the fingerprint's robust regime):
    per 64-sample frame, a ±1-octave random walk over 9 band
    amplitudes — adjacent bands ALWAYS differ by 2×, so every energy
    comparison has margin and re-encode noise cannot flip bits."""
    out = []
    n = np.arange(64)
    for _ in range(8 * n_windows):
        seg = np.zeros(64)
        e = 10
        for b in range(9):
            seg += float(2 ** e) * np.cos(
                2.0 * np.pi * (3 + b) * n / 64.0
            )
            # reflect at the bounds so adjacent bands NEVER tie (worst
            # case alternates 2^12/2^11: peak < 29k, inside int16)
            e += 1 if e == 7 else (-1 if e == 12 else int(rng.choice([-1, 1])))
        out.append(seg)
    return np.round(np.concatenate(out)).astype(np.int16)


def main():
    spark = get_spark("audio_dedup_example")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(11)

    from vector_lake_spark.flac import encode_flac
    from vector_lake_spark.multimodal import encode_wav_ext
    from vector_lake_spark.operators.audiofp import (
        audio_signatures,
        audio_window_signatures,
        mux_pcm16_wav,
    )
    from vector_lake_spark.operators.binary import hamming_neardup_pairs

    # --- 1. cross-codec collapse: one clip, three containers ---------
    rows = []
    for i in range(6):
        clip = _tone_clip(rng, n_windows=1)
        rows.append((10 * i + 0, bytearray(mux_pcm16_wav(clip))))
        rows.append((10 * i + 1, bytearray(encode_flac(clip, 8000, 16))))
        rows.append(
            (
                10 * i + 2,
                bytearray(
                    encode_wav_ext(clip.astype(np.float64), 8000, "float32")
                ),
            )
        )
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    sigs = audio_signatures(media).localCheckpoint()
    pairs = hamming_neardup_pairs(sigs, radius=7, n_blocks=8)
    print("cross-codec near-dup pairs (same clip, PCM/FLAC/float32):")
    pairs.orderBy("id_a", "id_b").show()

    # --- 2. long-form: per-window fingerprints + m-of-n --------------
    long_rows = []
    for i in range(4):
        clip = _tone_clip(rng, n_windows=6)
        long_rows.append((100 + 2 * i, bytearray(mux_pcm16_wav(clip))))
        # a "re-level + re-encode": uniform gain into a float32 WAV —
        # energy ORDERING is scale-free and the 2× band gaps dwarf the
        # float32 rounding, so the twin matches 6 of 6 windows
        long_rows.append(
            (
                101 + 2 * i,
                bytearray(
                    encode_wav_ext(
                        clip.astype(np.float64) * 0.37, 8000, "float32"
                    )
                ),
            )
        )
    long_media = spark.createDataFrame(
        long_rows, "media_id long, payload binary"
    )
    wsigs = audio_window_signatures(long_media).localCheckpoint()
    wpairs = hamming_neardup_pairs(
        wsigs, radius=7, n_blocks=8, group_cols=["window_no"]
    )
    matched = (
        wpairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_windows_matched"))
        .filter(F.col("n_windows_matched") >= 5)
    )
    print("long-form recording pairs (>=5 of 6 windows matched):")
    matched.orderBy("id_a", "id_b").show()

    spark.stop()


if __name__ == "__main__":
    main()
