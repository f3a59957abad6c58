"""boto3-backed S3 store mirroring — the reference's staging posture,
executable without the ``hadoop-aws`` jar.

The reference's S3 support is a boto3 stage-through-local-disk layer
(`/root/reference/vector_lake/core/index.py:344-424`): ``S3Bucket``
downloads a segment on first touch (`_lazy_load`, `index.py:367-383`),
uploads dirty segments on ``sync()`` (`index.py:385-401`), and deletes
remote objects per segment (`delete_remote`, `index.py:416-424`),
against an endpoint override for localstack (`index.py:361-365`).

This module is the Spark-side equivalent for environments where the
S3A connector cannot load (no ``hadoop-aws`` jar — this container; see
``docs/S3.md``): the canonical store lives on any Spark-readable
filesystem, and the sync layer mirrors its files to/from
``s3://bucket/prefix`` driver-side with boto3. Covers reference ops
S4 (download-on-demand), S5 (upload-on-sync), S7 (remote segment
delete) with real execution (``tests/test_s3sync.py`` runs it against
an in-process moto S3).

**Scale posture — know which path you are on.** This layer moves whole
files through the driver: right for the reference's regime (a few
hundred MB of segments, serverless-style), wrong for 100 TB. At scale,
use the S3A connector (``docs/S3.md``) where executors stream
partitioned parquet directly — same store code, different URI. The
sync layer refuses stores above ``max_bytes`` (default 10 GiB) so it
cannot silently become the bottleneck path.
"""

from __future__ import annotations

import os


class S3StoreSync:
    """Mirror a local store directory to ``s3://bucket/prefix``.

    Keys are root-relative POSIX paths, so the mirrored layout is byte-
    identical to the local one (``shard_id=N/part-*.parquet`` prefixes
    included — remote per-shard delete is a prefix delete, exactly the
    reference's per-segment object delete, S7)."""

    def __init__(
        self,
        local_root: str,
        bucket: str,
        prefix: str = "lake",
        client=None,
        max_bytes: int = 10 * 1024**3,
    ):
        import boto3

        self.local_root = str(local_root)
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        # endpoint override mirrors the reference's localstack hook
        # (index.py:361-365); default chain otherwise
        self.client = client or boto3.client(
            "s3", endpoint_url=os.environ.get("LOCALSTACK_ENDPOINT_URL")
        )
        self.max_bytes = max_bytes
        self.bytes_transferred = 0

    def _local_files(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for dirpath, _dirs, files in os.walk(self.local_root):
            for f in files:
                if f.startswith(".") or f == "_SUCCESS":
                    continue  # Spark CRC/marker files are not store state
                p = os.path.join(dirpath, f)
                rel = os.path.relpath(p, self.local_root).replace(os.sep, "/")
                out[rel] = os.path.getsize(p)
        return out

    def _remote_files(self) -> dict[str, int]:
        out: dict[str, int] = {}
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=self.bucket, Prefix=self.prefix + "/"
        ):
            for obj in page.get("Contents", []):
                rel = obj["Key"][len(self.prefix) + 1 :]
                out[rel] = obj["Size"]
        return out

    def _check_size(self, files: dict[str, int], direction: str) -> None:
        total = sum(files.values())
        if total > self.max_bytes:
            raise ValueError(
                f"S3StoreSync.{direction}: store is {total} bytes "
                f"(> max_bytes={self.max_bytes}). This driver-side staging "
                f"path is for reference-scale stores; mount the store on "
                f"s3a:// with the hadoop-aws jar for executor-streamed I/O "
                f"(docs/S3.md), or raise max_bytes explicitly."
            )

    def _delete_remote_keys(self, rels) -> None:
        keys = [{"Key": f"{self.prefix}/{r}"} for r in rels]
        for i in range(0, len(keys), 1000):
            self.client.delete_objects(
                Bucket=self.bucket, Delete={"Objects": keys[i : i + 1000]}
            )

    def _always_dirty(self, rel: str) -> bool:
        """Size is the dirtiness proxy for content-addressed parquet part
        files (every Spark write invents fresh UUID names), but
        ``_meta.json`` is rewritten IN PLACE under the same name and can
        change content at constant byte length — always transfer it."""
        return os.path.basename(rel) == "_meta.json"

    def sync_up(self) -> int:
        """TRUE mirror upload (reference S5, upload-on-sync): transfer
        files missing or size-changed remotely AND delete remote files
        that no longer exist locally. Store rewrites (compact,
        delete_ids, retention) remove superseded part files — leaving
        them remote would make a later ``sync_down`` restore BOTH
        generations into one shard directory, resurrecting deleted rows
        and duplicating the rest. Returns files uploaded."""
        local = self._local_files()
        self._check_size(local, "sync_up")
        remote = self._remote_files()
        n = 0
        for rel, size in sorted(local.items()):
            if remote.get(rel) == size and not self._always_dirty(rel):
                continue
            src = os.path.join(self.local_root, rel)
            self.client.upload_file(src, self.bucket, f"{self.prefix}/{rel}")
            self.bytes_transferred += size
            n += 1
        stale = sorted(set(remote) - set(local))
        if stale:
            self._delete_remote_keys(stale)
        return n

    def sync_down(self, allow_empty_remote: bool = False) -> int:
        """TRUE mirror restore (reference S4, download-on-demand; the
        demand unit is the store — Spark's scan prunes partitions at
        read time anyway): download files missing or size-changed
        locally AND remove local files absent remotely, so the restored
        tree is byte-identical to the mirror. Returns files
        downloaded.

        An EMPTY remote prefix against a non-empty local tree is almost
        always a mistake (never uploaded, wrong bucket/prefix typo) —
        mirroring it would download nothing and then delete every local
        store file, a destructive no-op "restore" (r05 ADVICE). Refuse
        unless ``allow_empty_remote=True`` makes the wipe explicit —
        the same refuse-on-unexplained-state posture as the store's
        leftover-trash guard (store.py ``_check_no_leftover_trash``)."""
        remote = self._remote_files()
        self._check_size(remote, "sync_down")
        local = self._local_files()
        if not remote and local and not allow_empty_remote:
            raise ValueError(
                f"S3StoreSync.sync_down: remote prefix "
                f"s3://{self.bucket}/{self.prefix}/ lists zero objects but "
                f"the local tree holds {len(local)} store files — a mirror "
                f"restore would delete them all. If the bucket/prefix is "
                f"right and you really want to wipe local state, call "
                f"sync_down(allow_empty_remote=True)."
            )
        n = 0
        for rel, size in sorted(remote.items()):
            if local.get(rel) == size and not self._always_dirty(rel):
                continue
            dst = os.path.join(self.local_root, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            self.client.download_file(self.bucket, f"{self.prefix}/{rel}", dst)
            self.bytes_transferred += size
            n += 1
        for rel in sorted(set(local) - set(remote)):
            os.remove(os.path.join(self.local_root, rel))
        return n

    def delete_remote_shard(self, shard_id) -> int:
        """Remote per-segment delete (reference S7, `index.py:416-424`):
        removes every object under the shard's partition prefix."""
        sub = f"{self.prefix}/data/shard_id={shard_id}/"
        paginator = self.client.get_paginator("list_objects_v2")
        keys = [
            {"Key": o["Key"]}
            for page in paginator.paginate(Bucket=self.bucket, Prefix=sub)
            for o in page.get("Contents", [])
        ]
        for i in range(0, len(keys), 1000):
            self.client.delete_objects(
                Bucket=self.bucket, Delete={"Objects": keys[i : i + 1000]}
            )
        return len(keys)
