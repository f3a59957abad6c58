"""The r11 media near-dup stack in one runnable tour:
hash → persist → pair → cluster → stream.

    python examples/media_dedup.py

The 100 TB shape: perceptual signatures (image dHash/dhash256, audio
band-energy fingerprints, per-frame video hashes) are computed ONCE at
ingest inside Arrow stages (pixels/samples never shuffle), persisted as
a `PerceptualIndex` (8-byte rows + sidecar), and every downstream run —
batch pair joins, duplicate clustering, streaming incremental ingest —
reads only the signature table. All decoders are this repo's own
stdlib/numpy codecs; no PIL/ffmpeg anywhere.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vector_lake_spark.session import get_spark


def main():
    spark = get_spark("media_dedup_example")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)
    work = tempfile.mkdtemp(prefix="media_dedup_")

    from vector_lake_spark.gif import encode_gif
    from vector_lake_spark.operators.binary import PerceptualIndex
    from vector_lake_spark.operators.dedup import connected_components_star
    from vector_lake_spark.operators.imagehash import image_signatures

    # --- a corpus with planted near-dups: originals + noisy re-encodes ---
    rows = []
    for i in range(12):
        gray = (rng.integers(0, 32, size=(24, 26)) * 8).astype(np.uint8)
        rgb = np.repeat(gray[:, :, None], 3, axis=2)
        rows.append((2 * i, bytearray(encode_gif(rgb))))
        # a "re-encode": perturb the GRAY levels (palette stays <=256
        # colors — GIF is exact within a palette) — small luma noise is
        # what survives real-world resave/resize
        noisy_gray = np.clip(
            gray.astype(int) + rng.integers(-2, 3, size=gray.shape),
            0, 255,
        ).astype(np.uint8)
        noisy = np.repeat(noisy_gray[:, :, None], 3, axis=2)
        rows.append((2 * i + 1, bytearray(encode_gif(noisy))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    # 1. decode + hash ONCE (Arrow stage), persist the signature table
    sigs = image_signatures(media, kind="dhash")
    idx = PerceptualIndex.build(spark, f"{work}/index", sigs)
    print(f"index: {idx.n_rows} signatures at {work}/index")

    # 2. exact banded pair join (auto block count from the SIDECAR)
    pairs = idx.neardup_pairs(radius=7)
    print("near-dup pairs (radius 7):")
    pairs.orderBy("id_a", "id_b").show()

    # 3. duplicate clusters + keep-best survivor
    cc = connected_components_star(
        pairs, idx.load().select("media_id"), id_col="media_id"
    )
    print("clusters (cluster_id = surviving min media_id):")
    cc.groupBy("cluster_id").count().orderBy("cluster_id").show()

    # 4. streaming ingest: a NEW batch pairs against itself + the index
    batch = spark.createDataFrame(rows[:4], "media_id long, payload binary")
    # checkpoint once: incremental_pairs and append each consume this
    # frame, and the decode+hash Arrow stage must run ONCE at ingest —
    # the posture this example exists to demonstrate (ADVICE r11)
    new_sigs = image_signatures(
        batch.selectExpr("media_id + 1000 AS media_id", "payload")
    ).localCheckpoint()
    inc = idx.incremental_pairs(new_sigs, radius=7)
    print("incremental pairs introduced by the new batch:")
    inc.orderBy("id_a", "id_b").show()
    idx.append(new_sigs)
    print(f"index after append: {idx.n_rows} rows; drift: {idx.drift()}")

    spark.stop()


if __name__ == "__main__":
    main()
