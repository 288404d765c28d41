"""Snapshot-isolated partitioned lake — manifest-versioned publishes.

Closes the last dirty-read window in the engine (VERDICT r8 #1): the
plain :class:`~.lake.LakeTable` rebuild relies on Spark's dynamic
partition overwrite, which commits PER PARTITION — a reader concurrent
with a multi-partition CDC rebuild can observe some partitions new and
some old. The reference's mart publish avoids exactly this with a
staging→final transactional swap (`load_sales_mart.py:92-102`); this
module applies the same no-dirty-read intent to the history lake
(`load_sales_history.py:170-177`) without giving up the CDC contract
that rebuild cost ∝ change set.

Design (the public lakehouse-table pattern — Iceberg/Delta-style
metadata pointers over immutable data files, re-expressed on the
engine's existing :class:`~.fs.SnapshotFS` seam):

    <root>/_CURRENT                     # pointer: "m<N>" (atomic swap)
    <root>/manifests/m<N>.json          # partition rel-path -> owning txn
    <root>/data/txn=<T>/<k1>=v/.../*.parquet   # immutable once referenced

A snapshot IS a manifest: a map from each live partition
(``year_month=202406/country=US``) to the transaction directory that
owns its files. A rebuild

1. writes ONLY the changed partitions into a fresh ``txn=<N>``
   directory (invisible — no manifest references it),
2. derives the written partition list from a directory walk of that
   txn dir (pure metadata, no extra Spark job),
3. composes the next manifest = previous manifest, minus every entry
   under a changed ``year_month`` (delete-to-empty cleanup falls out
   of the metadata swap for free — no stale-partition diff job), plus
   the just-written entries,
4. writes ``m<N>.json`` (unique name, fsync'd) and atomically swaps
   ``_CURRENT``.

Readers resolve pointer → manifest → explicit leaf-directory list once
and are then pinned to a whole snapshot: every file they will ever
touch is immutable, so a rebuild racing the read is invisible. The
pointer swap is the ONLY visibility event — exactly the
:class:`MartPublisher` / ``publish_store_version`` argument, proven
here by the same reader-hammer pytest over LocalFS AND the
non-atomic-rename ObjectStoreSimFS.

Scale notes (100 TB):
- publish cost ∝ change set: changed-partition data write + one
  manifest (≈ live-partition count entries, KBs–MBs of JSON) + one
  pointer put. Unchanged partitions are never copied, moved, or listed.
- read() hands Spark an explicit leaf-dir list under one basePath, so
  partition columns (and PartitionFilters pruning) work exactly as on
  a plain partitioned table; the driver-side path list is one entry
  per live partition — the granularity Iceberg tracks per FILE, kept
  per PARTITION here because the CDC writer already compacts each
  partition to a bounded file set on every rebuild.
- fragmentation-across-runs cannot occur by construction: a partition
  is wholly owned by the single txn that last rebuilt it (the hash
  repartition in the writer yields one file per partition), so the
  LakeTable.compact_partitions repair loop has nothing to do here.
- GC reaps manifests behind the retain window and any data partition
  directory no retained manifest references; ``retain`` bounds how
  long an in-flight reader's snapshot stays valid, identical to the
  mart contract.

Writer topology: publishes are normally serialized by the pipeline's
single-flight ledger (C5). Since r10 the publish lifecycle is the
shared :class:`~.pointer.VersionedPointerPublisher` protocol, whose
COMMIT is a conditional pointer put (``SnapshotFS.set_pointer_if``):
if two publishers do race — the scheduler and a streaming foreachBatch
publisher are both capable — exactly one wins and the loser's txn/
manifest are reaped with an explicit retryable
:class:`~.pointer.ConcurrentPublishError`, never a silent last-writer-
wins clobber. Pass ``grace_seconds`` > the longest publish when
overlap is possible so in-flight claims aren't reaped as crashed
orphans; concurrent READERS are the whole point and need nothing.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import LAKE_PARTITION_COLS
from .fs import LocalFS, SnapshotFS
from .pointer import VersionedPointerPublisher

POINTER = "_CURRENT"
ROLLBACK_KEEP = "_ROLLBACK_KEEP"  # manifests/ marker: highest once-live id

# Hive/Spark partition-path escaping (ADVICE r9): the writer escapes
# these characters as %XX in partition directory names (Spark's
# ExternalCatalogUtils.escapePathName, mirroring Hive FileUtils), and a
# NULL partition value is written as __HIVE_DEFAULT_PARTITION__. The
# manifest stores rel paths in the ESCAPED (on-disk) form; every
# surface that decodes values out of (partitions()) or composes rel
# paths from raw values (drop_partition_values, apply_rebuild's
# changed-set) must round-trip through these two functions or a value
# containing ':', '/', '=', … silently fails to match.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_HIVE_ESCAPE_CHARS = frozenset('"#%\'*/:=?\\\x7f{[]^') | frozenset(
    chr(i) for i in range(1, 32)
)


def escape_partition_value(v) -> str:
    """Raw partition value -> the directory-name form Spark writes."""
    if v is None:
        return _HIVE_NULL
    return "".join(
        f"%{ord(c):02X}" if c in _HIVE_ESCAPE_CHARS else c for c in str(v)
    )


def unescape_partition_value(s: str):
    """Directory-name form -> raw value (None for the Hive null dir)."""
    if s == _HIVE_NULL:
        return None
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 3 <= n:
            try:
                out.append(chr(int(s[i + 1 : i + 3], 16)))
                i += 3
                continue
            except ValueError:
                pass
        out.append(c)
        i += 1
    return "".join(out)


class _LakeProtocol(VersionedPointerPublisher):
    """The shared pointer lifecycle bound to the lake's two-piece
    artifact layout: a version id *i* owns ``manifests/m<i>.json`` AND
    ``data/txn=<i>/``. The txn directory is the exclusive-create CLAIM
    (unique ids even under racing publishers); retain GC stays
    lake-specific (manifest window + referenced-partition reaping)."""

    def __init__(self, lake: "SnapshotLakeTable"):
        super().__init__(
            lake.fs,
            lake.root,
            prefix="m",
            retain=lake.retain,
            grace_seconds=lake.grace_seconds,
            what="snapshot lake",
            recover_hint="set it to m<max manifest id>",
        )
        self.lake = lake

    def keep_marker_path(self) -> str:
        return f"{self.root}/manifests/{ROLLBACK_KEEP}"

    def version_ids(self) -> list[int]:
        return self.lake._manifest_ids()

    def orphan_ids(self) -> list[int]:
        ids = set(self.lake._manifest_ids())
        data = f"{self.root}/data"
        if self.fs.is_dir(data):
            ids.update(
                int(d[4:])
                for d in self.fs.list_dir(data)
                if d.startswith("txn=") and d[4:].isdigit()
            )
        return sorted(ids)

    def claim(self, i: int) -> bool:
        return self.fs.make_dir_exclusive(f"{self.root}/data/txn={i}")

    def reap(self, i: int) -> None:
        self.fs.remove_file(f"{self.root}/manifests/m{i}.json")
        self.fs.rmtree(f"{self.root}/data/txn={i}")

    def artifact_age(self, i: int) -> float:
        return min(
            self.fs.age_seconds(f"{self.root}/data/txn={i}"),
            self.fs.age_seconds(f"{self.root}/manifests/m{i}.json"),
        )

    def gc(self, current: int) -> None:
        self.lake._gc(current)


class SnapshotLakeTable:
    """Drop-in for :class:`~.lake.LakeTable` in the CDC pipeline with
    snapshot-isolated publishes (same read/rebuild surface; rebuilds go
    through :meth:`apply_rebuild` for a single visibility event)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        partition_cols: Sequence[str] = LAKE_PARTITION_COLS,
        schema=None,
        fs: SnapshotFS | None = None,
        retain: int = 1,
        grace_seconds: float = 0.0,
    ):
        self.spark = spark
        self.root = root
        self.partition_cols = tuple(partition_cols)
        self.fs = fs or LocalFS()
        self.retain = retain
        self.grace_seconds = grace_seconds
        if schema is None:
            from ..schemas import SALES_HISTORY

            schema = SALES_HISTORY
        self.schema = schema
        self._proto = _LakeProtocol(self)

    # -- snapshot resolution ------------------------------------------------

    def current_id(self) -> int | None:
        return self._proto.current_id()

    def _manifest_ids(self) -> list[int]:
        mdir = f"{self.root}/manifests"
        if not self.fs.is_dir(mdir):
            return []
        return sorted(
            int(n[1:-5])
            for n in self.fs.list_dir(mdir)
            if n.startswith("m") and n.endswith(".json") and n[1:-5].isdigit()
        )

    def _read_manifest(self, mid: int) -> dict[str, int]:
        raw = self.fs.read_pointer(f"{self.root}/manifests/m{mid}.json")
        if raw is None:
            raise FileNotFoundError(f"manifest m{mid} missing under {self.root}")
        return {rel: int(txn) for rel, txn in json.loads(raw)["txns"].items()}

    def current_manifest(self) -> dict[str, int] | None:
        """The live snapshot's {partition rel path -> owning txn} map,
        or None before the first publish."""
        cur = self.current_id()
        return None if cur is None else self._read_manifest(cur)

    def exists(self) -> bool:
        m = self.current_manifest()
        return bool(m)

    def register_view(self, name: str) -> None:
        """S4/S7 twin for SQL readers: a temp view over the LIVE
        snapshot. The view pins the snapshot resolved NOW (the
        explicit-path scan), so `spark.sql` consumers get the same
        repeatable-read semantics as :meth:`read` — re-register to see
        a later publish. (A metastore table can't express per-query
        pointer resolution; the view is the honest SQL surface.)"""
        self.read().createOrReplaceTempView(name)

    def snapshots(self) -> list[int]:
        """Manifest ids readable right now (the retain window + live)."""
        return self._manifest_ids()

    def read_snapshot(self, mid: int) -> DataFrame:
        """Time travel: scan a RETAINED older snapshot by manifest id —
        the lake twin of the mart's ``read_version`` / the stores'
        ``rollback_store_version`` target. Within the retain window the
        referenced partition dirs are immutable and un-GC'd, so the
        read is exactly the table as of that publish ("what did the
        June partitions look like before this morning's CDC run")."""
        m = self._read_manifest(mid)
        if not m:
            return self.spark.createDataFrame([], self.schema)
        paths = [f"{self.root}/data/txn={txn}/{rel}" for rel, txn in sorted(m.items())]
        return (
            self.spark.read.option("basePath", f"{self.root}/data")
            .parquet(*paths)
            .drop("txn")
        )

    def rollback(self, mid: int) -> int:
        """Point the live pointer BACK at a retained manifest — the
        operational undo for a bad publish. Pure pointer swap; nothing
        is deleted. The rolled-back-FROM manifest is recorded as a
        retained survivor (shared protocol, ADVICE r9) so the next
        publish's crashed-orphan reap does NOT mistake it — a once-live
        snapshot a retain-window reader may still be pinned to — for a
        crashed publish; it ages out of the retain window like any
        other snapshot."""
        return self._proto.rollback(mid)

    def read(self) -> DataFrame:
        """Scan the LIVE snapshot — pinned: the resolved leaf dirs are
        immutable once referenced, so a concurrent rebuild (or ten) is
        invisible to this DataFrame. Partition columns come from the
        directory structure under the shared basePath, so Catalyst's
        PartitionFilters pruning works exactly as on a plain
        partitioned table; the synthetic ``txn`` level is dropped."""
        m = self.current_manifest()
        if not m:
            return self.spark.createDataFrame([], self.schema)
        paths = [f"{self.root}/data/txn={txn}/{rel}" for rel, txn in sorted(m.items())]
        return (
            self.spark.read.option("basePath", f"{self.root}/data")
            .parquet(*paths)
            .drop("txn")
        )

    def partitions(self) -> DataFrame:
        """Distinct live partition values — decoded from the MANIFEST
        (pure metadata; no file listing), cast to the scanned types."""
        m = self.current_manifest() or {}
        rows = []
        for rel in m:
            vals = dict(p.split("=", 1) for p in rel.split("/"))
            rows.append(
                tuple(
                    unescape_partition_value(vals[c])
                    for c in self.partition_cols
                )
            )
        df = self.spark.createDataFrame(
            rows, ", ".join(f"{c} string" for c in self.partition_cols)
        )
        # cast targets come from the DECLARED schema (an empty local
        # frame resolves a DDL-string schema too) — not from read(),
        # whose explicit-path resolution would list every live
        # partition just to learn two dtypes
        sch = {
            f.name: f.dataType
            for f in self.spark.createDataFrame([], self.schema).schema.fields
        }
        return df.select(
            *[F.col(c).cast(sch[c]).alias(c) for c in self.partition_cols]
        )

    # -- publishes ----------------------------------------------------------

    def write_full(self, df: DataFrame) -> list[str]:
        """Initial full load: one txn owning every partition."""
        return self._publish(df, replace_all=True)

    def overwrite_partitions(self, df: DataFrame) -> list[str]:
        """M6 twin: replace exactly the partitions present in ``df``,
        atomically for readers (one pointer swap, not one commit per
        partition)."""
        return self._publish(df, replace_all=False)

    def apply_rebuild(
        self, df: DataFrame, changed_year_months: Sequence | None = None
    ) -> list[str]:
        """One CDC rebuild as ONE visibility event: write ``df``'s
        partitions to a fresh txn and swap in a manifest where every
        prior entry under ``changed_year_months`` is replaced by (or,
        if the extract no longer produces it, dropped with) the new
        txn's partitions. Subsumes the plain lake's overwrite +
        stale-partition-drop two-step — and removes the extra
        distinct-partitions Spark job the two-step needed."""
        return self._publish(
            df, replace_all=False, changed_year_months=changed_year_months
        )

    def drop_partition_values(self, rows: Sequence[Sequence]) -> None:
        """Metadata-only partition drop: publish a manifest without the
        entries (no data move; GC reaps the bytes once unreferenced)."""
        rels = set()
        for vals in rows:
            if len(vals) != len(self.partition_cols):
                raise ValueError(
                    f"expected {len(self.partition_cols)} values "
                    f"{self.partition_cols}, got {vals!r}"
                )
            rels.add(
                "/".join(
                    f"{k}={escape_partition_value(v)}"
                    for k, v in zip(self.partition_cols, vals)
                )
            )
        cur = self.current_manifest() or {}
        self._publish_manifest({r: t for r, t in cur.items() if r not in rels})

    # -- internals ----------------------------------------------------------

    def _walk_partitions(self, base: str, depth: int) -> list[str]:
        """Rel paths of partition leaf dirs under ``base`` holding at
        least one data file, via the fs seam (no Spark job)."""
        out: list[str] = []

        def rec(prefix: str, level: int) -> None:
            path = f"{base}/{prefix}" if prefix else base
            if not self.fs.is_dir(path):
                return
            if level == depth:
                if any(
                    not n.startswith(("_", ".")) for n in self.fs.list_dir(path)
                ):
                    out.append(prefix)
                return
            key = self.partition_cols[level]
            for n in self.fs.list_dir(path):
                if n.startswith(f"{key}="):
                    rec(f"{prefix}/{n}" if prefix else n, level + 1)

        rec("", 0)
        return sorted(out)

    def _publish(
        self,
        df: DataFrame,
        replace_all: bool,
        changed_year_months: Sequence | None = None,
    ) -> list[str]:
        nxt, observed = self._proto.begin()  # claims data/txn=<nxt>
        txn_dir = f"{self.root}/data/txn={nxt}"
        # one file per partition via the partition-key hash repartition
        # (same small-files stance as LakeTable._writer); the write is
        # invisible — nothing references txn=<nxt> yet
        ordered = df.select(
            *[c for c in df.columns if c not in self.partition_cols],
            *self.partition_cols,
        )
        try:
            (
                ordered.repartition(*[F.col(c) for c in self.partition_cols])
                .write.partitionBy(*self.partition_cols)
                .mode("overwrite")
                .parquet(txn_dir)
            )
            written = self._walk_partitions(txn_dir, len(self.partition_cols))
        except Exception:
            self._proto.abort(nxt)
            raise
        if replace_all:
            manifest = {rel: nxt for rel in written}
        else:
            manifest = dict(self.current_manifest() or {})
            if changed_year_months is not None:
                lead = self.partition_cols[0]
                dropped = {
                    f"{lead}={escape_partition_value(v)}/"
                    for v in changed_year_months
                }
                manifest = {
                    rel: txn
                    for rel, txn in manifest.items()
                    if not any(rel.startswith(d) for d in dropped)
                }
            manifest.update({rel: nxt for rel in written})
        if not written:
            self.fs.rmtree(txn_dir)  # empty extract: manifest-only publish
        self._commit_manifest(manifest, nxt, observed)
        return written

    def _publish_manifest(self, manifest: dict[str, int]) -> None:
        """Manifest-only publish (metadata drop): same claim → write →
        conditional-swap lifecycle, no data write."""
        nxt, observed = self._proto.begin()
        self.fs.rmtree(f"{self.root}/data/txn={nxt}")  # claim dir unused
        self._commit_manifest(manifest, nxt, observed)

    def _commit_manifest(
        self, manifest: dict[str, int], nxt: int, observed: str | None
    ) -> None:
        self.fs.makedirs(f"{self.root}/manifests")
        # unique name (the txn claim made <nxt> ours alone) + fsync'd
        # write; invisible until the pointer swap
        self.fs.set_pointer(
            f"{self.root}/manifests/m{nxt}.json",
            json.dumps({"id": nxt, "txns": manifest}, sort_keys=True),
        )
        # the ONLY visibility event — CONDITIONAL: a concurrent publish
        # that moved the pointer first wins; ours is reaped and
        # ConcurrentPublishError raised (shared protocol)
        self._proto.commit(nxt, observed)

    def _gc(self, current: int) -> None:
        """Reap manifests behind the retain window and data partition
        dirs no retained manifest references. Never touches anything a
        reader inside the retain window can still resolve, nor a
        concurrent publisher's in-flight (younger than grace) claim.
        The keep set is the protocol's live LINEAGE (last retain+1
        lives), not an id-arithmetic window — see
        ``VersionedPointerPublisher.retained_ids``."""
        keep_ids = [
            i
            for i in self._manifest_ids()
            if i in self._proto.retained_ids(current)
        ]
        grace = self.grace_seconds
        for i in self._manifest_ids():
            if i in keep_ids:
                continue
            if i > current and self._proto.artifact_age(i) < grace:
                continue  # in-flight concurrent publish — not ours to reap
            self.fs.remove_file(f"{self.root}/manifests/m{i}.json")
        referenced: set[tuple[int, str]] = set()
        for i in keep_ids:
            for rel, txn in self._read_manifest(i).items():
                referenced.add((txn, rel))
        data = f"{self.root}/data"
        if not self.fs.is_dir(data):
            return
        for d in self.fs.list_dir(data):
            if not (d.startswith("txn=") and d[4:].isdigit()):
                continue
            txn = int(d[4:])
            base = f"{data}/{d}"
            if txn > current and self.fs.age_seconds(base) < grace:
                continue  # in-flight concurrent publish's data write
            live = False
            for rel in self._walk_partitions(base, len(self.partition_cols)):
                if (txn, rel) in referenced:
                    live = True
                else:
                    self.fs.rmtree(f"{base}/{rel}")
            if not live:
                self.fs.rmtree(base)
