"""Process-scoped temp locations for query-built index stores.

The store-backed graded queries (bloom point lookup, IVF partitioned
ANN) rebuild their index artifact per call under the system temp root —
never inside the read-only testdata tree. The path embeds

- the uid in the ROOT dir (avoids the shared-/tmp trap where another
  user owns the parent),
- the pid in the LEAF (isolates concurrent harnesses — bench vs
  checker vs parallel pytest — whose overwrite would otherwise race a
  sibling's lazy probe plan).

pid-scoped leaves can't be removed at query end (the returned plan is
LAZY; the caller materializes it after the query function returns), so
each path request instead SWEEPS siblings owned by dead processes:
every harness run garbage-collects its predecessors' leftovers, which
bounds the tempdir footprint to the set of live harnesses. A live
sibling is never touched (``kill -0`` liveness probe; EPERM counts as
alive — someone owns that pid).
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
import tempfile

_PID_SUFFIX = re.compile(r"_p(\d+)\Z")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except Exception:  # EPERM etc. — pid exists but isn't ours
        return True
    return True


def _sweep_dead_siblings(root: str) -> None:
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return
    for name in names:
        m = _PID_SUFFIX.search(name)
        if not m:
            continue
        pid = int(m.group(1))
        if pid == os.getpid() or _pid_alive(pid):
            continue
        shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def process_scoped_store_path(kind: str, sf_dir: str) -> str:
    """Stable-within-process store path for ``kind`` keyed by ``sf_dir``,
    sweeping dead-process leftovers under the same root first."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    uid = getattr(os, "getuid", lambda: 0)()
    root = os.path.join(tempfile.gettempdir(), f"bdppss_{kind}_u{uid}")
    _sweep_dead_siblings(root)
    return os.path.join(
        root, f"{os.path.basename(sf_dir.rstrip('/'))}_{tag}_p{os.getpid()}"
    )
