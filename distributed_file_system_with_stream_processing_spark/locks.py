"""Opt-in per-table append lock: strict publication-order stamps.

The TableStore append log names batches by 20-digit time_ns stamps; a
CDC reader's offset is the max published stamp. Lock-free, there is a
documented race (sources/pyds.py): writer A lists existing stamps and
picks S, writer B starts later (stamp P > S) but RENAMES first — a CDC
poll in that window records high-water P, then A publishes S < P and
the reader never revisits it. The single-writer deployment the
reference also assumes makes this moot; deployments that interleave
plain ``TableStore.append`` with a running sink and need hard ordering
opt into this lock (``TableStore(..., serialize_appends=True)`` and
``.option("serializeAppends", "true")`` on the tablestore writers).

Under the lock, every writer (a) takes the stamp by bumping past the
newest existing one and (b) publishes the rename BEFORE releasing — so
stamp order == publication order and a reader can never observe a
high-water mark ahead of an unpublished earlier stamp.

``fcntl.flock`` on ``appends/_append.lock`` serializes across
processes on one host or a shared POSIX filesystem — the deployments
where multiple uncoordinated writers are even possible. (On object
stores there is no rename either; a commit log service replaces this
whole protocol there.)
"""

from __future__ import annotations

import contextlib
import os

LOCK_FILE = "_append.lock"


@contextlib.contextmanager
def append_lock(appends_dir: str, enabled: bool = True):
    """Exclusive per-table append lock; a no-op when ``enabled`` is
    False so lock-free call sites share one code path."""
    if not enabled:
        yield
        return
    import fcntl

    os.makedirs(appends_dir, exist_ok=True)
    fd = os.open(os.path.join(appends_dir, LOCK_FILE), os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        try:
            fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)
