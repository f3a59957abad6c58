"""Crash-safe directory replacement, shared by every compactor.

One implementation of the staged-write + two-rename swap with the
refuse-on-leftovers posture (``store._swap_shards`` pioneered it; the
streaming compactors now call this instead of carrying copies — r06
review): write the replacement tree to ``<path>__compact``, move the
live tree to ``<path>__old``, move the staged tree into place, delete
the old tree. A crash at any point leaves either the old or the staged
tree intact and recoverable, and a leftover ``__compact``/``__old``
directory makes the next attempt REFUSE until an operator resolves it
— never silently delete what might be the only copy.
"""

from __future__ import annotations

from collections.abc import Callable


def staged_replace(spark, path: str, write_staged: Callable[[str], None]) -> None:
    """Replace the directory at ``path`` with whatever ``write_staged``
    writes to the staging path it is handed. Refuses on leftovers from
    an interrupted earlier attempt; rolls back if the final swap-in
    fails."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def hpath(s):
        return jvm.org.apache.hadoop.fs.Path(s)

    fs = hpath(path).getFileSystem(conf)
    staged = hpath(path + "__compact")
    old = hpath(path + "__old")
    if fs.exists(staged) or fs.exists(old):
        raise IOError(
            f"refusing to compact: leftover {path}__compact/__old from an "
            f"interrupted earlier compact — inspect, restore or delete it, "
            f"then retry"
        )
    write_staged(path + "__compact")
    if not fs.rename(hpath(path), old):
        raise IOError(f"staged_replace: could not move {path} aside")
    if not fs.rename(staged, hpath(path)):
        if not fs.rename(old, hpath(path)):
            raise IOError(
                f"staged_replace: swap failed AND rollback failed; old "
                f"data preserved at {path}__old"
            )
        raise IOError(
            f"staged_replace: could not move staged data into place at "
            f"{path}; old data restored"
        )
    fs.delete(old, True)

def read_if_exists(spark, path: str):
    """Read a parquet directory, or None if it doesn't exist yet — the
    shared existence probe every incremental maintainer needs before
    its first batch (one implementation instead of per-module copies —
    r06 review)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    return spark.read.parquet(path)
