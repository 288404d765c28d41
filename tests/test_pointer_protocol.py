"""Shared versioned-pointer protocol (VERDICT r9 #2+#3): the
conditional pointer put and the unified publish lifecycle.

Contention contract: two racing publishers resolve to EXACTLY ONE
winner; the loser raises ConcurrentPublishError after reaping its own
claimed artifacts; readers — live or pinned — are never disrupted.
Proven on LocalFS (POSIX lockfile CAS) AND ObjectStoreSimFS (the
simulated conditional PutObject), for the index-store protocol, the
mart publisher, and the snapshot lake.
"""

from __future__ import annotations

import os
import threading

import pytest

from bigdatapipelinepysparksqlserver_spark.sources import fs as fsmod
from bigdatapipelinepysparksqlserver_spark.sources.pointer import (
    ConcurrentPublishError,
    VersionedPointerPublisher,
)

FS = ["LocalFS", "ObjectStoreSimFS"]


def _fs(name):
    return getattr(fsmod, name)()


# ---------------------------------------------------------------------------
# The fs primitive itself
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fs_cls", FS)
def test_set_pointer_if_semantics(tmp_path, fs_cls):
    fs = _fs(fs_cls)
    ptr = str(tmp_path / "_CURRENT")
    # create-if-absent (If-None-Match: *)
    assert fs.set_pointer_if(ptr, None, "v1") is True
    assert fs.read_pointer(ptr) == "v1"
    # create-if-absent fails once it exists — nothing changes
    assert fs.set_pointer_if(ptr, None, "v9") is False
    assert fs.read_pointer(ptr) == "v1"
    # compare mismatch fails
    assert fs.set_pointer_if(ptr, "v0", "v9") is False
    assert fs.read_pointer(ptr) == "v1"
    # compare match swaps
    assert fs.set_pointer_if(ptr, "v1", "v2") is True
    assert fs.read_pointer(ptr) == "v2"


@pytest.mark.parametrize("fs_cls", FS)
def test_make_dir_exclusive_claims_once(tmp_path, fs_cls):
    fs = _fs(fs_cls)
    p = str(tmp_path / "store" / "v1")
    assert fs.make_dir_exclusive(p) is True
    assert fs.make_dir_exclusive(p) is False  # second claimer loses


def test_set_pointer_if_threaded_exactly_one_winner(tmp_path):
    """N threads CAS from the same observed value: exactly one wins."""
    fs = _fs("LocalFS")
    ptr = str(tmp_path / "_CURRENT")
    fs.set_pointer(ptr, "v1")
    results = []
    barrier = threading.Barrier(8)

    def racer(i):
        barrier.wait()
        results.append((i, fs.set_pointer_if(ptr, "v1", f"v{i + 2}")))

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, ok in results if ok]
    assert len(winners) == 1
    assert fs.read_pointer(ptr) == f"v{winners[0] + 2}"


# ---------------------------------------------------------------------------
# Store-protocol contention (publish_store_version)
# ---------------------------------------------------------------------------


def _stage(tmp_path, tag):
    p = str(tmp_path / f"staging_{tag}")
    os.makedirs(p)
    with open(os.path.join(p, "data.txt"), "w") as f:
        f.write(tag)
    return p


@pytest.mark.parametrize("fs_cls", FS)
def test_store_contention_exactly_one_wins(tmp_path, fs_cls):
    """Deterministic interleave: A begins (claims its id), B publishes
    fully, A commits → A loses with ConcurrentPublishError, A's claim
    is reaped, B's snapshot is live, the retained previous version is
    untouched."""
    from bigdatapipelinepysparksqlserver_spark.operators.stores import (
        publish_store_version,
        store_live_path,
    )

    fs = _fs(fs_cls)
    root = str(tmp_path / "store")
    GRACE = 3600.0  # multi-writer mode: in-flight claims are protected
    assert (
        publish_store_version(
            root, _stage(tmp_path, "base"), fs, retain=1, grace_seconds=GRACE
        )
        == 1
    )

    # publisher A: begin, write artifacts, but don't commit yet
    pub_a = VersionedPointerPublisher(
        fs, root, retain=1, grace_seconds=GRACE, what="versioned store"
    )
    nxt_a, obs_a = pub_a.begin()
    assert nxt_a == 2
    fs.rename_dir(_stage(tmp_path, "a"), f"{root}/v{nxt_a}")

    # publisher B: full publish wins the pointer — B's begin must NOT
    # reap A's in-flight claim (grace window) and must claim PAST it
    vb = publish_store_version(
        root, _stage(tmp_path, "b"), fs, retain=1, grace_seconds=GRACE
    )
    assert vb == 3
    assert store_live_path(root, fs).endswith("/v3")

    # A's commit: explicit retryable loss; A's artifacts reaped
    with pytest.raises(ConcurrentPublishError, match="concurrent publish won"):
        pub_a.commit(nxt_a, obs_a)
    assert not fs.is_dir(f"{root}/v2")
    # no reader disruption: live is whole, previous retained
    with open(os.path.join(store_live_path(root, fs), "data.txt")) as f:
        assert f.read() == "b"
    with open(os.path.join(root, "v1", "data.txt")) as f:
        assert f.read() == "base"


@pytest.mark.parametrize("fs_cls", FS)
def test_store_contention_first_publish(tmp_path, fs_cls):
    """Racing FIRST publishes (pointer does not exist yet): the CAS
    create-if-absent picks exactly one winner."""
    from bigdatapipelinepysparksqlserver_spark.operators.stores import (
        publish_store_version,
        store_live_path,
    )

    fs = _fs(fs_cls)
    root = str(tmp_path / "store")
    fs.makedirs(root)
    pub_a = VersionedPointerPublisher(
        fs, root, retain=1, grace_seconds=3600.0, what="versioned store"
    )
    nxt_a, obs_a = pub_a.begin()
    assert (nxt_a, obs_a) == (1, None)
    fs.rename_dir(_stage(tmp_path, "a"), f"{root}/v{nxt_a}")

    vb = publish_store_version(
        root, _stage(tmp_path, "b"), fs, retain=1, grace_seconds=3600.0
    )
    assert vb == 2
    with pytest.raises(ConcurrentPublishError):
        pub_a.commit(nxt_a, obs_a)
    assert not fs.is_dir(f"{root}/v1")
    with open(os.path.join(store_live_path(root, fs), "data.txt")) as f:
        assert f.read() == "b"


def test_store_threaded_publish_race(tmp_path):
    """4 threads publish concurrently (grace-protected): every thread
    either succeeds or raises ConcurrentPublishError, at least one
    succeeds, the final pointer names a WHOLE snapshot, and no loser
    artifacts survive beyond the retain window."""
    from bigdatapipelinepysparksqlserver_spark.operators.stores import (
        publish_store_version,
        store_live_path,
    )

    fs = _fs("LocalFS")
    root = str(tmp_path / "store")
    publish_store_version(
        root, _stage(tmp_path, "base"), fs, retain=8, grace_seconds=3600.0
    )
    outcomes = []
    barrier = threading.Barrier(4)

    def publisher(i):
        barrier.wait()
        try:
            v = publish_store_version(
                root,
                _stage(tmp_path, f"t{i}"),
                fs,
                retain=8,
                grace_seconds=3600.0,
            )
            outcomes.append(("ok", i, v))
        except ConcurrentPublishError:
            outcomes.append(("lost", i, None))

    threads = [threading.Thread(target=publisher, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(outcomes) == 4
    oks = [o for o in outcomes if o[0] == "ok"]
    assert len(oks) >= 1
    live = store_live_path(root, fs)
    with open(os.path.join(live, "data.txt")) as f:
        content = f.read()
    # the live snapshot is one of the WINNERS' payloads, whole
    assert content in {f"t{i}" for _, i, _ in oks}
    # every loser's claim was reaped: remaining dirs are base + winners
    names = sorted(n for n in os.listdir(root) if n.startswith("v"))
    assert len(names) == 1 + len(oks)


# ---------------------------------------------------------------------------
# Mart contention (MartPublisher delegates to the same protocol)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fs_cls", FS)
def test_mart_contention_exactly_one_wins(spark, tmp_path, fs_cls):
    from bigdatapipelinepysparksqlserver_spark.pipelines import MartPublisher

    fs = _fs(fs_cls)
    mart = MartPublisher(str(tmp_path / "mart"), fs=fs, grace_seconds=3600.0)
    t = "sales_history_1"
    mart.write_staging(t, spark.range(5).selectExpr("id", "id * 2 AS x"))
    mart.publish(t)
    assert mart.current_version(t) == 1
    pinned = mart.read(spark, t)

    # A begins through the mart's own protocol object, B wins
    pub_a = mart._protocol(t)
    nxt_a, obs_a = pub_a.begin()
    mart.write_staging(t, spark.range(3).selectExpr("id", "id * 3 AS x"))
    mart.publish(t)  # B
    with pytest.raises(ConcurrentPublishError):
        pub_a.commit(nxt_a, obs_a)
    assert mart.read(spark, t).count() == 3
    assert pinned.count() == 5  # pinned reader undisturbed (retain=1)


# ---------------------------------------------------------------------------
# Snapshot-lake contention
# ---------------------------------------------------------------------------


def test_lake_manifest_only_publish_keeps_claim_until_commit(spark, tmp_path):
    """A metadata-only publish (partition drop) must HOLD its claimed
    txn dir until after the pointer commit: releasing it mid-publish
    would let a concurrent publisher claim the same id and overwrite
    the in-flight manifest file before the CAS arbitrates. Post-commit
    GC reaps the empty reservation."""
    from bigdatapipelinepysparksqlserver_spark.sources.lake_snapshot import (
        SnapshotLakeTable,
    )

    fs = _fs("LocalFS")
    root = str(tmp_path / "lake")
    w1 = SnapshotLakeTable(spark, root, fs=fs, retain=1, grace_seconds=3600.0)
    w2 = SnapshotLakeTable(spark, root, fs=fs, retain=1, grace_seconds=3600.0)
    w1.write_full(
        spark.createDataFrame(
            [(1, 202405, "US", 1.0), (2, 202406, "DE", 2.0)],
            "id int, year_month int, country string, paid double",
        )
    )
    # w1 starts a manifest-only publish: begin() reserves the id via
    # the (empty) txn dir — it must still exist mid-flight
    n1, o1 = w1._proto.begin()
    assert fs.is_dir(f"{root}/data/txn={n1}")
    # a concurrent begin claims a DIFFERENT id
    n2, o2 = w2._proto.begin()
    assert n2 != n1
    w2._proto.abort(n2)
    # w1 completes; the empty reservation dir is GC'd post-commit
    cur = w1.current_manifest() or {}
    w1._commit_manifest(cur, n1, o1)
    assert w1.current_id() == n1
    assert not fs.is_dir(f"{root}/data/txn={n1}")
    assert w1.read().count() == 2  # content untouched by the no-op drop


def test_randomized_protocol_lifecycle_matches_model(tmp_path):
    """Model-based check over the SHARED protocol (no Spark): a
    deterministic random sequence of publishes, crashed publishes
    (claim + artifacts, no commit), rollbacks, and losing concurrent
    publishes must always leave (a) the pointer naming a version whose
    payload matches a dict model, (b) every lineage-retained version
    readable, (c) no silent content loss — the loser of every race
    raised ConcurrentPublishError."""
    import os
    import random

    rng = random.Random(7)
    fs = _fs("LocalFS")
    root = str(tmp_path / "store")
    fs.makedirs(root)
    RETAIN = 2
    GRACE = 3600.0  # multi-writer mode: in-flight claims protected

    def new_pub():
        return VersionedPointerPublisher(
            fs, root, retain=RETAIN, grace_seconds=GRACE, what="t"
        )

    def payload(i):
        p = os.path.join(root, f"v{i}", "data.txt")
        with open(p) as f:
            return f.read()

    live = None          # model: payload of the live version
    history = []         # model: payloads in live order
    seq = 0
    for step in range(60):
        op = rng.choice(["publish", "publish", "publish", "crash", "race", "rollback"])
        pub = new_pub()
        if op == "publish":
            seq += 1
            tag = f"p{seq}"
            nxt, obs = pub.begin()
            with open(os.path.join(root, f"v{nxt}", "data.txt"), "w") as f:
                f.write(tag)
            pub.commit(nxt, obs)
            live = tag
            history.append((nxt, tag))
        elif op == "crash":
            seq += 1
            nxt, obs = pub.begin()
            with open(os.path.join(root, f"v{nxt}", "data.txt"), "w") as f:
                f.write(f"crashed{seq}")
            # no commit: in-flight/crashed claim; grace keeps it on
            # disk, the pointer never names it
        elif op == "race":
            seq += 1
            a = new_pub()
            na, oa = a.begin()
            with open(os.path.join(root, f"v{na}", "data.txt"), "w") as f:
                f.write(f"loser{seq}")
            b = new_pub()
            nb, ob = b.begin()
            tag = f"winner{seq}"
            with open(os.path.join(root, f"v{nb}", "data.txt"), "w") as f:
                f.write(tag)
            b.commit(nb, ob)
            with pytest.raises(ConcurrentPublishError):
                a.commit(na, oa)
            assert not fs.is_dir(os.path.join(root, f"v{na}"))
            live = tag
            history.append((nb, tag))
        else:  # rollback to a still-on-disk once-live version
            cur = pub.current_id()
            candidates = [
                (i, t) for i, t in history
                if cur is not None and i < cur and fs.is_dir(f"{root}/v{i}")
            ]
            if not candidates:
                continue
            target, tag = candidates[-1]
            pub.rollback(target)
            live = tag
            history.append((target, tag))

        # invariants after every step
        pub = new_pub()
        cur = pub.current_id()
        if live is None:
            assert cur is None
            continue
        assert cur is not None
        assert payload(cur) == live, f"step {step}: live content diverged"
        # every retained-by-lineage id still on disk is readable and
        # holds exactly the payload the model recorded for it
        by_id = dict(history)
        for i in pub.retained_ids(cur):
            if fs.is_dir(f"{root}/v{i}") and i in by_id:
                assert payload(i) == by_id[i], f"step {step}: v{i} corrupted"


@pytest.mark.parametrize("fs_cls", FS)
def test_lake_contention_exactly_one_wins(spark, tmp_path, fs_cls):
    """Two writers over the SAME lake root: A claims its txn, B's full
    rebuild publishes first, A's conditional swap loses → A's txn AND
    manifest are reaped, B's snapshot is live and whole, a reader
    pinned before the race still resolves."""
    from bigdatapipelinepysparksqlserver_spark.sources.lake_snapshot import (
        SnapshotLakeTable,
    )

    fs = _fs(fs_cls)
    root = str(tmp_path / "lake")
    mk = lambda paid: spark.createDataFrame(  # noqa: E731
        [(1, 202405, "US", paid), (2, 202406, "DE", paid * 2)],
        "id int, year_month int, country string, paid double",
    )
    w1 = SnapshotLakeTable(spark, root, fs=fs, retain=1, grace_seconds=3600.0)
    w2 = SnapshotLakeTable(spark, root, fs=fs, retain=1, grace_seconds=3600.0)
    w1.write_full(mk(1.0))
    pinned = w1.read()

    # writer 1 begins (claims txn=2) but has not committed
    nxt1, obs1 = w1._proto.begin()
    assert nxt1 == 2
    # writer 2 publishes fully — claims PAST the in-flight txn
    w2.overwrite_partitions(mk(100.0))
    assert w2.current_id() == 3

    # writer 1's commit loses explicitly; its artifacts are reaped
    with pytest.raises(ConcurrentPublishError):
        w1._commit_manifest({"x": nxt1}, nxt1, obs1)
    assert not fs.is_dir(f"{root}/data/txn={nxt1}")
    assert w1.current_id() == 3
    assert w1.read().agg({"paid": "sum"}).first()[0] == 300.0
    assert pinned.agg({"paid": "sum"}).first()[0] == 3.0  # undisturbed


# ---------------------------------------------------------------------------
# Rollback is a CAS too (ADVICE r10 medium)
# ---------------------------------------------------------------------------


class _CommitBetweenReadAndSwap(fsmod.LocalFS):
    """Injects a concurrent commit between a rollback's pointer read
    and its swap: the first conditional put that tries to move the
    pointer BACKWARD first applies the racing commit's forward move."""

    def __init__(self, race_to: str):
        self.race_to = race_to
        self.tripped = False

    def set_pointer_if(self, path, expect, value) -> bool:
        exp_n = int(expect[1:]) if expect else 0
        val_n = int(value[1:])
        if not self.tripped and val_n < exp_n:
            self.tripped = True
            assert super().set_pointer_if(path, expect, self.race_to)
        return super().set_pointer_if(path, expect, value)


def test_rollback_loses_cas_to_concurrent_commit(tmp_path):
    """A rollback racing a concurrent commit must NOT silently erase
    the commit (the pre-fix unconditional set_pointer could land
    between the commit's read-compare and set). With every pointer
    mutation a CAS, the rollback loses explicitly and the committed
    snapshot stays live."""
    fs = _CommitBetweenReadAndSwap(race_to="v3")
    root = str(tmp_path / "store")
    pub = VersionedPointerPublisher(
        fs, root, retain=2, grace_seconds=3600.0, what="versioned store"
    )
    for _ in (1, 2):
        nxt, obs = pub.begin()
        pub.commit(nxt, obs)
    assert pub.current_id() == 2
    # v3's artifacts exist (the racing publisher's claimed+written id)
    assert fs.make_dir_exclusive(f"{root}/v3")

    with pytest.raises(ConcurrentPublishError, match="rolling back"):
        pub.rollback(1)
    assert fs.tripped
    # the concurrent commit survived; nothing was silently overwritten
    assert pub.current_id() == 3
    # the retained rollback target is still on disk — re-issuable
    assert fs.is_dir(f"{root}/v1")
    clean = fsmod.LocalFS()
    pub2 = VersionedPointerPublisher(
        clean, root, retain=2, grace_seconds=3600.0, what="versioned store"
    )
    assert pub2.rollback(1) == 1
    assert pub2.current_id() == 1


def test_rollback_cas_success_path_unchanged(tmp_path):
    """No race → rollback still lands, records lineage, and protects
    the rolled-back-from id via the keep marker."""
    fs = fsmod.LocalFS()
    root = str(tmp_path / "store")
    pub = VersionedPointerPublisher(fs, root, retain=2, what="versioned store")
    for _ in (1, 2, 3):
        nxt, obs = pub.begin()
        pub.commit(nxt, obs)
    assert pub.rollback(2) == 2
    assert pub.current_id() == 2
    assert pub.keep_id() == 3          # once-live v3 protected
    assert pub._lineage()[-1] == 2     # live transition recorded


# ---------------------------------------------------------------------------
# Lineage capacity must track retain (ADVICE r10 low)
# ---------------------------------------------------------------------------


def test_lineage_holds_retain_plus_one_lives_when_retain_large(tmp_path):
    """With retain >= LINEAGE_KEEP the lineage file must still hold
    retain+1 recorded lives; a fixed 16-entry cap would push the oldest
    owed lives out and fall back to the arithmetic id window — the
    skipped-id blind spot the lineage exists to close."""
    fs = fsmod.LocalFS()
    root = str(tmp_path / "store")
    retain = 20
    pub = VersionedPointerPublisher(
        fs, root, retain=retain, grace_seconds=3600.0, what="versioned store"
    )
    lives = []
    for k in range(30):
        nxt, obs = pub.begin()
        pub.commit(nxt, obs)
        lives.append(nxt)
        # a dead claim after every commit forces the next id to SKIP,
        # pushing old lives below the arithmetic [cur-retain, cur]
        # window so only the lineage can retain them
        assert fs.make_dir_exclusive(f"{root}/v{nxt + 1}")
    assert len(pub._lineage()) >= retain + 1
    keep = pub.retained_ids(lives[-1])
    for owed in lives[-(retain + 1):]:
        assert owed in keep, f"live id {owed} fell out of the keep set"


def test_gc_never_reaps_young_claimant_below_winner(tmp_path):
    """Adversarial GC (the pointer.py gc() `i != current` guard): a
    claimant that crashed BELOW the eventual winner's id (A claimed 2,
    B won with 3) sits outside the keep set with retain=0 — GC must
    still leave it alone while younger than the grace window (it is
    indistinguishable from an in-flight publisher), and reap it only
    once aged past the grace."""
    import os as _os
    import time as _time

    fs = fsmod.LocalFS()
    root = str(tmp_path / "store")
    GRACE = 3600.0
    pub = VersionedPointerPublisher(
        fs, root, retain=0, grace_seconds=GRACE, what="versioned store"
    )
    n1, o1 = pub.begin()
    pub.commit(n1, o1)
    # A claims v2 and crashes before commit
    nxt_a, _ = pub.begin()
    assert nxt_a == 2
    # B publishes fully — claims PAST the young v2, wins with v3
    nxt_b, obs_b = pub.begin()
    assert nxt_b == 3
    pub.commit(nxt_b, obs_b)  # runs gc(3)
    # the young crashed claim BELOW the winner survives the GC
    assert fs.is_dir(f"{root}/v2"), "young below-winner claim reaped"
    # age it past the grace: the next commit's GC reaps it
    old = _time.time() - GRACE - 10
    _os.utime(f"{root}/v2", (old, old))
    n4, o4 = pub.begin()
    pub.commit(n4, o4)
    assert not fs.is_dir(f"{root}/v2"), "aged crashed claim not reaped"
    # ...and nothing live was touched
    assert pub.current_id() == n4
