"""r11 full-entry mult ladder: the composed image-dedup pipeline, the
wide-signature image near-dup, and the audio fingerprint near-dup over
the self-generated document corpora (localdata/sf0.1gen = 5k docs,
sf1 = 50k — scripts/gen_testdata.py).

Note on pair counts: all three fixtures share the prefix-nested flip
construction, whose flip positions SATURATE for deep members (mod-63
fixtures at member ≥ 42, the mod-255 wide fixture at member ≥ 170), so
at mult10 each group carries a large exact-duplicate clique and the
emitted pair count grows ~quadratically in corpus size BY FIXTURE
DESIGN (193k pairs at 5k docs → ~29M at 50k). That is the worst-case
duplicate density for the join, which is exactly what a dedup ladder
should stress; wall numbers go to SCALE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_lake_spark import queries as Q
from vector_lake_spark.session import get_spark

spark = get_spark("r11_scale")
spark.sparkContext.setLogLevel("ERROR")

ENTRIES = os.environ.get(
    "STRESS_ENTRIES",
    "pipe_image_dedup_e2e,mm_image_neardup_wide,mm_audio_neardup",
).split(",")
DIRS = os.environ.get("STRESS_DIRS", "localdata/sf0.1gen,localdata/sf1").split(",")

for d in DIRS:
    if not os.path.isdir(d):
        print(f"{d}: missing, skipped", flush=True)
        continue
    n = spark.read.parquet(f"{d}/documents.parquet").count()
    for name in ENTRIES:
        t0 = time.time()
        Q.QUERIES[name](spark, d).write.mode("overwrite").format(
            "noop"
        ).save()
        print(f"{name} @ {d} ({n} docs): {time.time()-t0:.1f}s", flush=True)

spark.stop()
