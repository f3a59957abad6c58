"""Real-execution S3 coverage for the store (reference S4/S5/S7) via the
boto3 staging layer against an in-process moto S3 — the leg that CAN run
in this container (the s3a connector leg stays skip-with-reason until a
hadoop-aws jar exists; see docs/S3.md)."""

import numpy as np
import pytest

moto = pytest.importorskip("moto")

from vector_lake_spark.sources.s3sync import S3StoreSync  # noqa: E402
from vector_lake_spark.store import SparkVectorLake  # noqa: E402

BUCKET = "vector-lake-test"


@pytest.fixture()
def s3():
    with moto.mock_aws():
        import boto3

        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        yield client


def test_s3_round_trip_restore_and_query(spark, tmp_path, s3):
    """S5 upload-on-sync + S4 download-on-demand: persist locally, mirror
    to S3, lose the local copy, restore from S3, reopen and query — the
    reference's serverless round-trip (index.py:367-401) end-to-end."""
    import shutil

    rng = np.random.RandomState(3)
    loc = str(tmp_path / "lake")
    lake = SparkVectorLake(spark, loc, dimension=4, approx_shards=4)
    vecs = (rng.rand(30, 4) - 0.5).tolist()
    ids = lake.add_batch(vecs)
    lake.persist()

    sync = S3StoreSync(loc, BUCKET, "lake", client=s3)
    assert sync.sync_up() > 0
    # idempotent re-sync: content-addressed part files skip; only the
    # in-place-rewritten _meta.json sidecar always re-transfers
    assert sync.sync_up() <= 1

    shutil.rmtree(loc)  # simulate a fresh host
    restored = S3StoreSync(loc, BUCKET, "lake", client=s3)
    assert restored.sync_down() > 0

    reopened = SparkVectorLake(spark, loc, dimension=4, approx_shards=4)
    assert reopened.count() == 30
    hits = reopened.query(vecs[7], k=2).collect()
    assert hits[0]["id"] == ids[7]


def test_sync_down_refuses_empty_remote_wipe(spark, tmp_path, s3):
    """An empty remote prefix (never uploaded / typo'd bucket or prefix)
    must NOT mirror-delete a non-empty local store (r05 ADVICE): refuse
    by default, wipe only under the explicit flag."""
    rng = np.random.RandomState(5)
    loc = str(tmp_path / "lake")
    lake = SparkVectorLake(spark, loc, dimension=4, approx_shards=4)
    lake.add_batch((rng.rand(10, 4) - 0.5).tolist())
    lake.persist()

    # nothing was ever uploaded under this (typo'd) prefix
    sync = S3StoreSync(loc, BUCKET, "lkae-typo", client=s3)
    with pytest.raises(ValueError, match="zero objects"):
        sync.sync_down()
    assert SparkVectorLake(spark, loc, dimension=4, approx_shards=4).count() == 10

    # the explicit flag performs the wipe (restores the empty mirror)
    assert sync.sync_down(allow_empty_remote=True) == 0
    assert SparkVectorLake(spark, loc, dimension=4, approx_shards=4).count() == 0

    # an empty local tree against an empty remote is a plain no-op
    assert S3StoreSync(loc, BUCKET, "lkae-typo", client=s3).sync_down() == 0


def test_s3_incremental_sync_uploads_only_new_shards(spark, tmp_path, s3):
    """Appending and re-persisting must re-upload only changed files —
    the reference's dirty-only sync semantics (index.py:385-390)."""
    rng = np.random.RandomState(4)
    loc = str(tmp_path / "lake")
    lake = SparkVectorLake(spark, loc, dimension=4, approx_shards=4)
    lake.add_batch((rng.rand(20, 4) - 0.5).tolist())
    lake.persist()
    sync = S3StoreSync(loc, BUCKET, "lake", client=s3)
    first = sync.sync_up()
    assert first > 0

    lake.add_batch((rng.rand(10, 4) - 0.5).tolist())
    lake.persist()
    second = sync.sync_up()
    assert 0 < second  # only the appended files move
    total_local = len(sync._local_files())
    assert second < total_local


def test_s3_remote_shard_delete(spark, tmp_path, s3):
    """S7: deleting one shard remotely removes exactly that partition
    prefix; other shards' objects survive and still restore."""
    import shutil

    rng = np.random.RandomState(5)
    loc = str(tmp_path / "lake")
    lake = SparkVectorLake(spark, loc, dimension=4, approx_shards=4)
    lake.add_batch((rng.rand(100, 4) - 0.5).tolist())
    lake.persist()
    shards = sorted(
        r["shard_id"]
        for r in lake.load().select("shard_id").distinct().collect()
    )
    assert len(shards) >= 2
    sync = S3StoreSync(loc, BUCKET, "lake", client=s3)
    sync.sync_up()

    victim = shards[0]
    assert sync.delete_remote_shard(victim) > 0

    shutil.rmtree(loc)
    S3StoreSync(loc, BUCKET, "lake", client=s3).sync_down()
    reopened = SparkVectorLake(spark, loc, dimension=4, approx_shards=4)
    remaining = {
        r["shard_id"]
        for r in reopened.load().select("shard_id").distinct().collect()
    }
    assert victim not in remaining
    assert remaining == set(shards[1:])


def test_s3_sync_refuses_oversized_store(spark, tmp_path, s3):
    """The staging path is for reference-scale stores; a store larger
    than max_bytes must be refused with a pointer at the s3a scale path,
    not silently funneled through the driver."""
    loc = tmp_path / "lake"
    loc.mkdir()
    (loc / "big.parquet").write_bytes(b"x" * 2048)
    sync = S3StoreSync(str(loc), BUCKET, "lake", client=s3, max_bytes=1024)
    with pytest.raises(ValueError, match="hadoop-aws"):
        sync.sync_up()


def test_sync_mirrors_deletions_no_resurrection(spark, tmp_path, s3):
    """A store rewrite (delete_ids) renames part files; the mirror must
    drop the superseded remote objects so a restore cannot resurrect
    deleted rows or duplicate survivors (r05 review finding)."""
    import shutil

    rng = np.random.RandomState(6)
    loc = str(tmp_path / "lake")
    lake = SparkVectorLake(spark, loc, dimension=4, approx_shards=4)
    ids = lake.add_batch((rng.rand(30, 4) - 0.5).tolist())
    lake.persist()
    sync = S3StoreSync(loc, BUCKET, "lake", client=s3)
    sync.sync_up()

    lake.delete_ids([ids[0], ids[1]])
    sync.sync_up()  # must ALSO delete the stale remote part files

    shutil.rmtree(loc)
    S3StoreSync(loc, BUCKET, "lake", client=s3).sync_down()
    restored = SparkVectorLake(spark, loc, dimension=4, approx_shards=4)
    assert restored.count() == 28  # no duplicates, no resurrection
    got = {r["id"] for r in restored.load().select("id").collect()}
    assert ids[0] not in got and ids[1] not in got


def test_sync_always_transfers_meta_sidecar(spark, tmp_path, s3):
    """_meta.json is rewritten in place at possibly-constant byte length;
    the size proxy must never skip it (r05 review finding)."""
    import json
    import shutil

    rng = np.random.RandomState(8)
    loc = str(tmp_path / "lake")
    lake = SparkVectorLake(spark, loc, dimension=3, approx_shards=4)
    lake.add_batch(rng.rand(5, 3).tolist())
    lake.persist(tag="aaaa")
    sync = S3StoreSync(loc, BUCKET, "lake", client=s3)
    sync.sync_up()
    lake.add_batch(rng.rand(1, 3).tolist())
    lake.persist(tag="bbbb")  # same byte length, new content
    sync.sync_up()

    shutil.rmtree(loc)
    S3StoreSync(loc, BUCKET, "lake", client=s3).sync_down()
    meta = json.load(open(f"{loc}/_meta.json"))
    assert meta.get("tag") == "bbbb"
