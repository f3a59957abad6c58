#!/usr/bin/env python3
"""Throughput of the r07 codec wave through the Arrow operator path:
GIF decode (extract_gif_features), progressive JPEG decode
(extract_jpeg_features — same operator, SOF2 payloads), and MP4
frame-sampling (extract_video_frames). Results land in SCALE.md."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession

from vector_lake_spark.gif import encode_gif
from vector_lake_spark.jpeg import encode_jpeg, encode_jpeg_progressive
from vector_lake_spark.mp4 import encode_mp4_mjpeg

N_IMG = int(os.environ.get("N_IMG", "2000"))
N_CLIPS = int(os.environ.get("N_CLIPS", "200"))


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("codec_stress")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(42)

    # --- GIF: 64x48, 32-color palette images -----------------------------
    pal = rng.integers(0, 256, size=(32, 3), dtype=np.uint8)
    gifs = []
    for i in range(N_IMG):
        idx = rng.integers(0, 32, size=(48, 64))
        gifs.append((i, bytearray(encode_gif(pal[idx]))))
    df = spark.createDataFrame(gifs, "media_id long, payload binary").repartition(32).cache()
    df.count()
    from vector_lake_spark.multimodal import (
        extract_gif_features,
        extract_jpeg_features,
        extract_video_frames,
    )

    t0 = time.time()
    n = extract_gif_features(df).count()
    gif_s = time.time() - t0
    print(f"GIF decode: {n} images (64x48, 32 colors) in {gif_s:.2f}s = "
          f"{n/gif_s:.0f} img/s")

    # --- progressive JPEG: 64x48 RGB ---------------------------------------
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    pj = encode_jpeg_progressive(img, 85)
    bj = encode_jpeg(img, 85)
    rows = [(i, bytearray(pj)) for i in range(N_IMG)]
    dfp = spark.createDataFrame(rows, "media_id long, payload binary").repartition(32).cache()
    dfp.count()
    t0 = time.time()
    n = extract_jpeg_features(dfp).count()
    prog_s = time.time() - t0
    rows = [(i, bytearray(bj)) for i in range(N_IMG)]
    dfb = spark.createDataFrame(rows, "media_id long, payload binary").repartition(32).cache()
    dfb.count()
    t0 = time.time()
    n = extract_jpeg_features(dfb).count()
    base_s = time.time() - t0
    print(f"progressive JPEG decode: {n} images in {prog_s:.2f}s = "
          f"{n/prog_s:.0f} img/s (baseline same content: {n/base_s:.0f} img/s)")

    # --- MP4: 20-frame photo-JPEG clips, sample every 1000ms @ 4fps -------
    frames = [
        encode_jpeg(rng.integers(0, 256, size=(48, 64), dtype=np.uint8), 85)
        for _ in range(20)
    ]
    clip = encode_mp4_mjpeg(frames, 4, 64, 48)
    rows = [(i, bytearray(clip)) for i in range(N_CLIPS)]
    dfv = spark.createDataFrame(rows, "media_id long, payload binary").repartition(32).cache()
    dfv.count()
    t0 = time.time()
    n = extract_video_frames(dfv, every_ms=1000).count()
    mp4_s = time.time() - t0
    print(f"MP4 frame-sample: {N_CLIPS} clips -> {n} frames decoded in "
          f"{mp4_s:.2f}s = {N_CLIPS/mp4_s:.0f} clips/s, {n/mp4_s:.0f} frames/s")

    # --- WebP (VP8L, r08): 64x48 — palette path and literal path ----------
    from vector_lake_spark.multimodal import extract_webp_features
    from vector_lake_spark.vp8l import encode_webp_lossless

    pal_imgs = [
        (i, bytearray(encode_webp_lossless(pal[rng.integers(0, 32, (48, 64))])))
        for i in range(N_IMG)
    ]
    dfw = spark.createDataFrame(pal_imgs, "media_id long, payload binary").repartition(32).cache()
    dfw.count()
    t0 = time.time()
    n = extract_webp_features(dfw).count()
    palw_s = time.time() - t0
    full_imgs = [
        (
            i,
            bytearray(
                encode_webp_lossless(
                    rng.integers(0, 256, (48, 64, 3), dtype=np.uint8),
                    use_palette=False,
                )
            ),
        )
        for i in range(N_IMG // 4)
    ]
    dff = spark.createDataFrame(full_imgs, "media_id long, payload binary").repartition(32).cache()
    dff.count()
    t0 = time.time()
    n2 = extract_webp_features(dff).count()
    fullw_s = time.time() - t0
    print(f"WebP VP8L decode: {n} palette images in {palw_s:.2f}s = "
          f"{n/palw_s:.0f} img/s; {n2} full-color in {fullw_s:.2f}s = "
          f"{n2/fullw_s:.0f} img/s")
    probe_vs_decode()
    spark.stop()


def probe_vs_decode():
    """The metadata-pass-vs-entropy-decode contrast: probe_media over
    the same clips that extract_video_frames decodes."""
    spark = SparkSession.getActiveSession()
    rng = np.random.default_rng(7)
    frames = [
        encode_jpeg(rng.integers(0, 256, size=(48, 64), dtype=np.uint8), 85)
        for _ in range(20)
    ]
    clip = encode_mp4_mjpeg(frames, 4, 64, 48)
    for (_, t) in spark.sparkContext._jsc.getPersistentRDDs().items():
        t.unpersist()  # free the earlier cached frames before the big set
    rows = [(i, bytearray(clip)) for i in range(N_CLIPS * 5)]
    df = spark.createDataFrame(rows, "media_id long, payload binary").repartition(32).cache()
    df.count()
    from vector_lake_spark.multimodal import probe_media

    t0 = time.time()
    n = probe_media(df).count()
    dt = time.time() - t0
    print(f"probe_media: {n} clips metadata-only in {dt:.2f}s = "
          f"{n/dt:.0f} clips/s")


if __name__ == "__main__":
    main()
