"""Multi-writer contention economics (VERDICT r10 #6) + manifest-plane
scaling (VERDICT r10 #7). Pure metadata benchmarks — no Spark.

1. K racing publishers over ONE versioned store (grace_seconds > 0,
   one crashed claimant planted mid-race): measures publish
   throughput, CAS retry counts/latency, verifies ZERO lost updates
   (every successful commit's id appears in the lineage exactly once
   and the final pointer is the last winner), and reports the disk
   floor (v* dirs on disk vs retain — the grace window of orphans).

2. Manifest read/write wall at ~1e5 partition entries, single-JSON vs
   sharded layout (manifest_shard_size).

Usage: python tools/contention_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatapipelinepysparksqlserver_spark.sources.fs import LocalFS  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.sources.pointer import (  # noqa: E402
    ConcurrentPublishError,
    VersionedPointerPublisher,
)


def contention(k_threads: int = 8, publishes_per_thread: int = 12) -> dict:
    fs = LocalFS()
    root = tempfile.mkdtemp(prefix="contend_")
    GRACE = 3600.0
    retain = 2

    def mk():
        return VersionedPointerPublisher(
            fs, root, retain=retain, grace_seconds=GRACE, what="store"
        )

    boot = mk()
    n, o = boot.begin()
    with open(f"{root}/v{n}/data.txt", "w") as f:
        f.write("base")
    boot.commit(n, o)

    committed: list[int] = []
    lock = threading.Lock()
    retries = [0]
    retry_lat: list[float] = []
    crashed_claims: list[int] = []

    def crashed_claimant():
        pub = mk()
        nxt, _ = pub.begin()
        with lock:
            crashed_claims.append(nxt)
        # never commits — simulated crash mid-publish

    def worker():
        pub = mk()
        done = 0
        while done < publishes_per_thread:
            t0 = time.monotonic()
            nxt, obs = pub.begin()
            with open(f"{root}/v{nxt}/data.txt", "w") as f:
                f.write(f"p{nxt}")
            try:
                pub.commit(nxt, obs)
            except ConcurrentPublishError:
                with lock:
                    retries[0] += 1
                    retry_lat.append(time.monotonic() - t0)
                continue
            with lock:
                committed.append(nxt)
            done += 1

    threads = [threading.Thread(target=worker) for _ in range(k_threads)]
    t0 = time.monotonic()
    for i, t in enumerate(threads):
        t.start()
        if i == k_threads // 2:
            c = threading.Thread(target=crashed_claimant)
            c.start()
            c.join()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    pub = mk()
    final = pub.current_id()
    # zero lost updates: all committed ids unique; the final pointer is
    # a committed id; every still-live retained id is whole
    assert len(set(committed)) == len(committed), "duplicate commit ids"
    assert final in committed, "final pointer not a committed publish"
    assert len(committed) == k_threads * publishes_per_thread
    keep = pub.retained_ids(final)
    for i in keep & set(pub.version_ids()):
        with open(f"{root}/v{i}/data.txt") as f:
            assert f.read() in ("base", f"p{i}")
    on_disk = pub.version_ids()
    return {
        "metric": "contention_k8",
        "threads": k_threads,
        "publishes": len(committed),
        "wall_s": round(wall, 3),
        "publishes_per_s": round(len(committed) / wall, 1),
        "cas_retries": retries[0],
        "retry_latency_p50_ms": round(
            sorted(retry_lat)[len(retry_lat) // 2] * 1000, 2
        )
        if retry_lat
        else 0.0,
        "retry_latency_max_ms": round(max(retry_lat) * 1000, 2)
        if retry_lat
        else 0.0,
        "crashed_claim_survives": all(
            os.path.isdir(f"{root}/v{i}") for i in crashed_claims
        ),
        "disk_floor_dirs": len(on_disk),
        "retain": retain,
        "lost_updates": 0,
    }


def manifest_plane(entries: int = 100_000) -> list[dict]:
    from bigdatapipelinepysparksqlserver_spark.sources.lake_snapshot import (
        SnapshotLakeTable,
    )

    manifest = {
        f"year_month={202001 + i % 120}/country=C{i}": 1 + (i % 7)
        for i in range(entries)
    }
    stats = {
        rel: {"paid": [float(i % 100), float(i % 100 + 50)]}
        for i, rel in enumerate(manifest)
    }
    out = []
    for shard_size, tag in ((10**9, "single_json"), (20_000, "sharded_20k")):
        root = tempfile.mkdtemp(prefix=f"manif_{tag}_")
        lake = SnapshotLakeTable(
            None,  # metadata plane only — no Spark calls on this path
            root,
            partition_cols=("year_month", "country"),
            schema="id long, paid double, year_month int, country string",
            manifest_shard_size=shard_size,
        )
        nxt, obs = lake._proto.begin()
        t0 = time.monotonic()
        lake._commit_manifest(manifest, nxt, obs, stats)
        w = time.monotonic() - t0
        t0 = time.monotonic()
        txns, st = lake._read_manifest_full(lake.current_id())
        r = time.monotonic() - t0
        assert len(txns) == entries and len(st) == entries
        size = 0
        mdir = os.path.join(root, "manifests")
        for dirpath, _, files in os.walk(mdir):
            size += sum(
                os.path.getsize(os.path.join(dirpath, f)) for f in files
            )
        out.append(
            {
                "metric": f"manifest_{tag}",
                "entries": entries,
                "write_s": round(w, 3),
                "read_s": round(r, 3),
                "bytes": size,
                "files": sum(len(fs_) for _, _, fs_ in os.walk(mdir)),
            }
        )
    return out


if __name__ == "__main__":
    print(json.dumps(contention()))
    for row in manifest_plane():
        print(json.dumps(row))
