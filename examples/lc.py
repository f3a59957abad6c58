"""Reference `examples/lc.py` for the Spark engine: the LangChain-shaped
text store. The reference wires SentenceTransformerEmbeddings; any
`Callable[[list[str]], list[list[float]]]` plugs into the same seam
(tests/test_adapter.py shows a real sentence-transformers hookup), and
without a model library the deterministic hashed-n-gram embedder stands
in.

    python examples/lc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_lake_spark.adapter import SparkVectorLakeStore
from vector_lake_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark("example_lc")
    with open("README.md") as f:
        text = f.read()
    # ~100-char chunks, reference CharacterTextSplitter-style
    docs = [text[i : i + 100] for i in range(0, len(text), 100)]

    db = SparkVectorLakeStore.from_texts(
        spark, "/tmp/vector-lake-lc", docs, dimension=384
    )
    for d in db.similarity_search("What is Vector Lake?", k=2):
        print(d["score"], d["page_content"][:80])
    db.lake.delete()
