"""vector_lake_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the public ``msoedov/vector_lake`` project,
re-designed Spark-first for 100 TB scale.

The reference (see SURVEY.md) is a single-process Python vector store:
LSH-routed Parquet shards + per-shard ANN top-k. This package re-expresses
that surface — and the LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns, event streams) — as declarative
DataFrame plans so Catalyst/Tungsten handle pushdown, pruning, codegen,
and shuffle planning.

Layout:
  functions/   column-expression libraries (vector math, text metrics)
  operators/   composite operators (LSH routing, top-k, dedup, events, ANN)
  store.py     the vector-lake store lifecycle (add/persist/load/query)
  streaming/   Structured Streaming variants of the event operators
  multimodal.py  binary-column (image/audio/video) plumbing over the
                 repo's own real codecs (jpeg/gif/tiff/fax/webp/vp8l/
                 png/bmp, wav incl. G.711+ADPCM, flac; avi/mp4/mkv
                 containers; mp3/ogg probes; exif metadata) and the
                 perceptual-hash operators (operators/imagehash)
"""

from vector_lake_spark.store import SparkVectorLake, SparkPartition

__all__ = ["SparkVectorLake", "SparkPartition"]

__version__ = "0.1.0"
