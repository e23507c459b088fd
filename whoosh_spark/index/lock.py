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
import uuid

LOCK_NAME = "write.lock"
STALE_SECS = 300.0
RETRY_SECS = 0.05
TIMEOUT_SECS = 60.0


class LockError(Exception):
    pass


def _read_owner(path: str) -> str | None:
    try:
        with open(path, "r") as f:
            return f.readline().strip()
    except OSError:
        return None


@contextlib.contextmanager
def index_lock(index_dir: str, timeout: float = TIMEOUT_SECS):
    """Hold the index's advisory write lock for a manifest mutation.

    Every acquisition writes an owner token (pid + random nonce) as the
    lock file's first line; release, heartbeat, and stale-breaking all
    verify the token, so (a) two waiters can't both break the same stale
    lock and both acquire, (b) a breaker can't remove a lock that was
    heartbeat-refreshed or re-acquired between its stat and unlink, and
    (c) a holder's finally-release can't remove a successor's lock after
    its own was broken. Breaking goes through rename-to-unique-name: only
    one renamer can win, and the staleness re-check happens on the renamed
    file, which the breaker owns exclusively."""
    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, LOCK_NAME)
    token = f"{os.getpid()}:{uuid.uuid4().hex}"
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{token}\n{time.time()}\n".encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - os.stat(path).st_mtime
            except FileNotFoundError:
                continue  # released between open and stat; retry now
            if age > STALE_SECS:
                # break a dead writer's lock (reference storage locks are
                # advisory the same way). Rename-to-unique first: exactly
                # one breaker wins the rename; the loser just retries.
                probe = f"{path}.stale.{uuid.uuid4().hex}"
                try:
                    os.rename(path, probe)
                except FileNotFoundError:
                    continue
                try:
                    still_stale = time.time() - os.stat(probe).st_mtime > STALE_SECS
                except FileNotFoundError:
                    continue
                if still_stale:
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(probe)
                    continue  # compete for the lock via O_EXCL as usual
                # raced a heartbeat refresh — the holder is alive. Restore
                # the lock without clobbering anyone who slipped in
                # (os.link fails on an existing target, unlike rename).
                with contextlib.suppress(FileExistsError, FileNotFoundError):
                    os.link(probe, path)
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(probe)
                continue
            if time.monotonic() > deadline:
                raise LockError(
                    f"could not acquire {path} within {timeout}s "
                    f"(held for {age:.0f}s)") from None
            time.sleep(RETRY_SECS)
    # keepalive: a mutation legitimately holding the lock through long
    # Spark jobs (e.g. tombstone writes over many segments) must not look
    # stale to other writers — touch the lock while held (only while we
    # still own it: a broken-then-reacquired lock must not be refreshed
    # by the old holder)
    stop = threading.Event()

    def _heartbeat():
        while not stop.wait(STALE_SECS / 3):
            if _read_owner(path) == token:
                with contextlib.suppress(FileNotFoundError):
                    os.utime(path)

    hb = threading.Thread(target=_heartbeat, daemon=True)
    hb.start()
    try:
        yield
    finally:
        stop.set()
        hb.join(timeout=1.0)
        if _read_owner(path) == token:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(path)
