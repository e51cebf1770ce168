"""Versioned parquet tables: snapshot isolation, time travel, rollback,
and safe vacuum over a plain-parquet layout — the minimal table-format
core (manifest-per-version) that Delta/Iceberg generalize.

Why it exists here: the ingestion pipeline's sinks (plans/pipeline.py,
operators/storage.py) give exactly-once WRITES, but a reader racing a
writer over a bare directory still sees half-committed file sets.  A
manifest pins each version to an explicit file list, so:

  * readers resolve ONE manifest and only ever see a committed set
    (snapshot isolation — a concurrent append/overwrite is invisible
    until its manifest lands);
  * commits are a single atomic file creation (O(1) regardless of data
    size — rename-based, `O_EXCL` semantics via os.link);
  * optimistic concurrency: two writers racing to version N+1 — exactly
    one wins the link; the loser re-reads state and retries against N+2
    (classic CAS loop, same contract as a Delta transaction log);
  * history is append-only: rollback WRITES A NEW VERSION that points at
    the old file list (never mutates history), and vacuum only deletes
    files unreachable from the retained manifests.

Scale notes (100 TB): manifests carry file PATHS, not data — a version
of a million-file table is a ~100 MB JSON (Iceberg splits this into
avro manifest trees; same idea).  Reads hand Spark an explicit file
list, so partition pruning and column pruning work unchanged.  Local
renames here; object stores use conditional PUTs for the same CAS.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first (after max retries)."""


@dataclass
class Version:
    version: int
    op: str
    files: list[str]  # relative to table root
    parent: int | None


class VersionedTable:
    """A parquet table whose committed states are manifest files
    ``<root>/_versions/v<N>.json`` listing the data files of version N."""

    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_versions")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest plumbing --------------------------------------------------

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.manifest_dir, f"v{version}.json")

    def describe(self, version: int | None = None) -> Version:
        if version is None:
            version = self.current_version()
            if version is None:
                raise FileNotFoundError(f"no committed version in {self.root}")
        with open(self._manifest_path(version)) as fh:
            m = json.load(fh)
        return Version(
            version=version, op=m["op"], files=m["files"], parent=m.get("parent")
        )

    def _commit(
        self,
        op: str,
        files: list[str],
        max_retries: int = 10,
        meta: dict | None = None,
    ) -> int:
        """CAS loop: stage the manifest, then atomically link it as the
        next version.  os.link fails with EEXIST if a racer won — re-read
        the current version and retry the NEXT slot."""
        staged = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}.json")
        for _ in range(max_retries):
            cur = self.current_version()
            target = 0 if cur is None else cur + 1
            with open(staged, "w") as fh:
                json.dump(
                    {"op": op, "files": sorted(files), "parent": cur,
                     "meta": meta or {}},
                    fh,
                )
            try:
                os.link(staged, self._manifest_path(target))  # atomic claim
                os.unlink(staged)
                return target
            except FileExistsError:
                continue  # racer won this slot; retry against the next
        os.unlink(staged)
        raise CommitConflict(f"lost {max_retries} commit races in {self.root}")

    # -- write paths --------------------------------------------------------

    def _write_files(self, df: DataFrame) -> list[str]:
        """Materialize df as parquet under a unique subdir; return the
        part-file paths relative to the table root.  Files become visible
        ONLY when a manifest referencing them commits."""
        sub = uuid.uuid4().hex
        out = os.path.join(self.data_dir, sub)
        df.write.parquet(out)
        rel = []
        for name in os.listdir(out):
            if name.endswith(".parquet"):
                rel.append(os.path.join("data", sub, name))
        return rel

    def append(self, df: DataFrame) -> int:
        new_files = self._write_files(df)
        for _ in range(10):
            cur = self.current_version()
            base = self.describe(cur).files if cur is not None else []
            try:
                return self._commit("append", base + new_files, max_retries=1)
            except CommitConflict:
                continue  # re-read the new base and retry
        raise CommitConflict(f"append lost 10 commit races in {self.root}")

    def overwrite(self, df: DataFrame) -> int:
        """Replace table contents; old versions stay readable (time
        travel) until vacuumed."""
        return self._commit("overwrite", self._write_files(df))

    def rollback(self, to_version: int) -> int:
        """Re-commit an old file list as the NEW current version —
        history stays append-only, nothing is deleted."""
        return self._commit("rollback", self.describe(to_version).files)

    # -- read paths ---------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self.describe(version)
        if not m.files:
            raise FileNotFoundError(f"version {m.version} of {self.root} is empty")
        return spark.read.parquet(*[os.path.join(self.root, f) for f in m.files])

    # -- streaming ----------------------------------------------------------

    def _meta(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh).get("meta", {})

    def committed_batch_ids(self) -> set[int]:
        """Batch ids already landed by the streaming sink (scanning the
        retained manifests — vacuum keeps enough history for the
        checkpoint's replayable window)."""
        out = set()
        for v in self.versions():
            b = self._meta(v).get("batch_id")
            if b is not None:
                out.add(int(b))
        return out

    def stream_batch_committer(self):
        """foreachBatch target giving EXACTLY-ONCE appends on top of the
        at-least-once replay Structured Streaming guarantees: the batch
        id rides in the manifest meta, so a replayed batch (post-crash,
        after data landed but before the checkpoint advanced) is
        recognized and skipped — same idempotence discipline as the
        native exactly-once sink (plans/pipeline.py), but with the
        version history (time travel / rollback) on top.

        Usage: ``df.writeStream.foreachBatch(t.stream_batch_committer())``
        """

        def commit(batch_df: DataFrame, batch_id: int) -> None:
            if batch_id in self.committed_batch_ids():
                return  # replayed batch — already committed
            new_files = self._write_files(batch_df)
            for _ in range(10):
                cur = self.current_version()
                base = self.describe(cur).files if cur is not None else []
                try:
                    self._commit(
                        "stream-append", base + new_files,
                        max_retries=1, meta={"batch_id": int(batch_id)},
                    )
                    return
                except CommitConflict:
                    continue
            raise CommitConflict(f"stream batch {batch_id} lost 10 commit races")

        return commit

    # -- maintenance --------------------------------------------------------

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Delete data files unreachable from the ``keep_last`` most
        recent manifests (and drop the older manifests).  Safe order:
        compute the retained file set FIRST, delete unreferenced data,
        then the expired manifests — a crash mid-vacuum leaves only
        extra files, never a manifest pointing at deleted data."""
        vs = self.versions()
        if len(vs) <= keep_last:
            return []
        keep_vs = vs[-keep_last:]
        keep_files = set()
        for v in keep_vs:
            keep_files.update(self.describe(v).files)
        removed = []
        for sub in os.listdir(self.data_dir):
            subdir = os.path.join(self.data_dir, sub)
            for name in os.listdir(subdir):
                rel = os.path.join("data", sub, name)
                if name.endswith(".parquet") and rel not in keep_files:
                    os.unlink(os.path.join(subdir, name))
                    removed.append(rel)
            if not os.listdir(subdir):
                shutil.rmtree(subdir, ignore_errors=True)
        for v in vs[:-keep_last]:
            os.unlink(self._manifest_path(v))
        return removed
