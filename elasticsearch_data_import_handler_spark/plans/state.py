"""Build state: lineage manifests, locks, and snapshot checkpoints.

Re-expresses the reference's state semantics (SURVEY.md §2A A5–A7) without an
external service:

- A6 state read/write — the reference stored ``{statementId, lastRunDate}``
  in a hidden ES index, advanced only on success, so a failed window is
  re-imported next run.  Here: ``_state/state.json`` + a ``lineage`` parquet
  table, committed only after the batch's data files are fully written.
- A7 statement lock — the reference aborted if another run held the
  per-statement lock.  Here: an O_EXCL lock file under the index dir
  (single-writer per index; a real deployment swaps this for an Iceberg
  conditional commit — same contract).
- A5 {lastRun} macro — the reference substituted the last successful
  timestamp into the SQL.  Here: ``last_indexed_batch`` in state.json is the
  snapshot watermark; the builder indexes batches strictly after it.

Lineage rows: (build_id, batch_id, status, n_docs, n_postings, wall_ms,
attempt) — per-batch metrics + resume bookkeeping (C13/C14).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field


@dataclass
class IndexState:
    """Contents of _state/state.json — the committed view of the index."""

    last_indexed_batch: int = -1
    committed_batches: list[int] = field(default_factory=list)
    s_shards: int = 1          # global doc-hash shard count (power of two)
    n_buckets: int = 8         # term-hash partition count for postings
    build_id: str = ""
    analyzer: dict = field(default_factory=dict)  # A8: per-index analysis chain
    has_positions: bool = False    # positional postings written per batch


def _state_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_state", "state.json")


def read_state(index_dir: str) -> IndexState | None:
    p = _state_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return IndexState(**json.load(f))


def write_state(index_dir: str, state: IndexState) -> None:
    """Atomic commit: write temp + rename (the batch is not visible until
    this succeeds — A6's 'state advanced only on success')."""
    os.makedirs(os.path.join(index_dir, "_state"), exist_ok=True)
    tmp = _state_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(state), f, indent=1)
    os.replace(tmp, _state_path(index_dir))


class BuildLock:
    """A7: single-writer lock per index dir.  O_EXCL create; stale locks
    (dead pid) are reclaimed."""

    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, "_state", "build.lock")
        self.acquired = False

    def acquire(self) -> bool:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(self.path) as f:
                    pid = int(f.read().strip() or "0")
                os.kill(pid, 0)  # raises if the holder is dead
                return False
            except FileNotFoundError:
                return self.acquire()  # holder released between open attempts
            except (ProcessLookupError, ValueError):
                # Stale lock (dead pid).  Reclaim ATOMICALLY: rename the stale
                # file to a unique name first — os.rename fails for every
                # contender but one, so exactly one process removes it and
                # nobody can delete a NEW holder's freshly created lock.
                claim = f"{self.path}.reclaim.{os.getpid()}"
                try:
                    os.rename(self.path, claim)
                except (FileNotFoundError, OSError):
                    time.sleep(0.01)  # another contender won the reclaim race
                else:
                    os.remove(claim)
                return self.acquire()
            except PermissionError:
                return False
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        self.acquired = True
        return True

    def release(self) -> None:
        if self.acquired and os.path.exists(self.path):
            os.remove(self.path)
            self.acquired = False

    def __enter__(self):
        if not self.acquire():
            raise RuntimeError(f"index {os.path.dirname(self.path)} is locked "
                               "by another build (reference A7 semantics: abort)")
        return self

    def __exit__(self, *exc):
        self.release()


def new_build_id() -> str:
    return f"b{int(time.time())}_{uuid.uuid4().hex[:8]}"


def lineage_row(build_id: str, batch_id: int, status: str, n_docs: int,
                n_postings: int, wall_ms: int, attempt: int = 1) -> dict:
    return {
        "build_id": build_id,
        "batch_id": batch_id,
        "status": status,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "wall_ms": wall_ms,
        "attempt": attempt,
    }


def append_lineage(index_dir: str, rows: list[dict]) -> None:
    """Append lineage rows as a new parquet file (commit-log style — append
    only, no rewrite; mirrors an Iceberg append)."""
    import pandas as pd

    d = os.path.join(index_dir, "lineage")
    os.makedirs(d, exist_ok=True)
    pd.DataFrame(rows).to_parquet(
        os.path.join(d, f"{rows[0]['build_id']}_{rows[0]['batch_id']}_{int(time.time()*1000)}.parquet")
    )


def read_lineage(index_dir: str):
    import glob

    import pandas as pd

    files = glob.glob(os.path.join(index_dir, "lineage", "*.parquet"))
    if not files:
        return pd.DataFrame(columns=["build_id", "batch_id", "status", "n_docs",
                                     "n_postings", "wall_ms", "attempt"])
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
