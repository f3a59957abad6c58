#!/usr/bin/env python3
"""Throughput measurement for the real video decode path
(``multimodal.extract_video_frames``): N MJPEG-AVI payloads flow
through the Arrow operator; report clips/s and sampled-frames/s.

Payloads are generated once driver-side with the repo's own encoders
(deterministic per-clip colors), so the measurement isolates the
probe + selective-decode kernel, not synthesis."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vector_lake_spark.avi import encode_avi_mjpeg
from vector_lake_spark.jpeg import encode_jpeg
from vector_lake_spark.session import get_spark

N_CLIPS = int(os.environ.get("VIDEO_STRESS_CLIPS", 200))
FRAMES_PER_CLIP = int(os.environ.get("VIDEO_STRESS_FRAMES", 20))
FPS = 4
EVERY_MS = 1000  # stride 4 → 5 sampled frames per clip
W, H = 64, 48


def main() -> None:
    spark = get_spark()
    from vector_lake_spark.multimodal import extract_video_frames

    rng = np.random.RandomState(42)
    # distinct per-clip gradient frames (content varies so JPEG work is
    # realistic, but every clip reuses one encode pass per frame count)
    clips = []
    for c in range(N_CLIPS):
        jpegs = []
        for f in range(FRAMES_PER_CLIP):
            base = rng.randint(0, 200, size=3)
            px = np.zeros((H, W, 3), dtype=np.uint8)
            px[:, :, :] = base
            px[:, : W // 2, 0] = min(int(base[0]) + 40, 255)
            jpegs.append(encode_jpeg(px, quality=85))
        clips.append((c, "video", bytearray(encode_avi_mjpeg(jpegs, FPS, W, H))))

    df = spark.createDataFrame(
        clips, "media_id long, kind string, payload binary"
    ).repartition(32)
    df = df.localCheckpoint(eager=True)  # exclude synthesis from timing

    # warm the Arrow workers
    extract_video_frames(df.limit(8), every_ms=EVERY_MS).count()

    t0 = time.perf_counter()
    n_rows = extract_video_frames(df, every_ms=EVERY_MS).count()
    wall = time.perf_counter() - t0

    stride = max(int(round(EVERY_MS * FPS / 1000.0)), 1)
    expect = N_CLIPS * len(range(0, FRAMES_PER_CLIP, stride))
    assert n_rows == expect, (n_rows, expect)
    print(
        f"{N_CLIPS} clips x {FRAMES_PER_CLIP} frames ({W}x{H}), "
        f"sample every {EVERY_MS} ms @ {FPS} fps -> {n_rows} frames decoded"
    )
    print(
        f"wall {wall:.2f} s = {N_CLIPS / wall:.0f} clips/s, "
        f"{n_rows / wall:.0f} decoded frames/s (local[32])"
    )
    spark.stop()


if __name__ == "__main__":
    main()
