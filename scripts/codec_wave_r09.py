#!/usr/bin/env python3
"""Scaling ladder for the r09 codec entries (TIFF matrix incl. CCITT
fax, 12-bit JPEG, RLE8 interframe AVI) on the generated documents
tables — same methodology as BASELINE.md "sf1 scaling" (min of N runs,
noop sink, local[32]).

Usage: python scripts/codec_wave_r09.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_lake_spark import queries as Q
from vector_lake_spark.session import get_spark

OPS = ["mm_tiff_roundtrip", "mm_jpeg12_roundtrip", "mm_rle8_roundtrip",
       "mm_wav_depths", "mm_mp3_probe", "mm_ogg_probe"]
TIERS = [
    ("mult1", "localdata/sf0.1gen"),
    ("mult10", "localdata/sf1"),
    ("mult100", "localdata/sf10"),
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for tier, rel in TIERS:
        sf = os.path.join(root, rel)
        if not os.path.isdir(sf):
            print(f"skip {tier}: {sf} missing")
            continue
        for name in OPS:
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                Q.QUERIES[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            print(f"{tier:8s} {name:22s} {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
