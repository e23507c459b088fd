"""Advisory index write lock.

The reference serializes writers with a storage lock file
(index.py:342-372 acquires WRITELOCK; filestore locks). Here every
manifest read-modify-write (segment commit, tombstone write, merge
commit, schema evolution) runs under an ``O_CREAT|O_EXCL`` lock file in
the index directory, so two concurrent committers can't interleave their
read/write and silently drop each other's update (the manifest rename
itself is atomic, but last-rename-wins loses the other writer's segment).

Locks are driver-side and coarse: one manifest mutation at a time per
index. Spark executors never touch the manifest — segment data writes
stay fully parallel; this only covers the tiny commit step.

A lock is considered stale and broken after ``STALE_SECS`` (a crashed
driver must not wedge the index forever).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time

LOCK_NAME = "write.lock"
STALE_SECS = 300.0
RETRY_SECS = 0.05
TIMEOUT_SECS = 60.0


class LockError(Exception):
    pass


@contextlib.contextmanager
def index_lock(index_dir: str, timeout: float = TIMEOUT_SECS):
    """Hold the index's advisory write lock for a manifest mutation."""
    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, LOCK_NAME)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()} {time.time()}\n".encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - os.stat(path).st_mtime
            except FileNotFoundError:
                continue  # released between open and stat; retry now
            if age > STALE_SECS:
                # break a dead writer's lock (reference storage locks are
                # advisory the same way)
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(path)
                continue
            if time.monotonic() > deadline:
                raise LockError(
                    f"could not acquire {path} within {timeout}s "
                    f"(held for {age:.0f}s)") from None
            time.sleep(RETRY_SECS)
    # keepalive: a mutation legitimately holding the lock through long
    # Spark jobs (e.g. tombstone writes over many segments) must not look
    # stale to other writers — touch the lock while held
    stop = threading.Event()

    def _heartbeat():
        while not stop.wait(STALE_SECS / 3):
            with contextlib.suppress(FileNotFoundError):
                os.utime(path)

    hb = threading.Thread(target=_heartbeat, daemon=True)
    hb.start()
    try:
        yield
    finally:
        stop.set()
        hb.join(timeout=1.0)
        with contextlib.suppress(FileNotFoundError):
            os.unlink(path)
