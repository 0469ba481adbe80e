"""O_EXCL lock-file guard for read-merge-replace metadata mutations.

Every corpus-level metadata file (tombstones, dropped-column schema) is
updated by reading the current state, merging, and atomically replacing —
safe against readers, but two concurrent WRITERS would each replace
atomically and last-writer-wins, silently dropping the other's mutation
(the ADVICE r3 tombstone race). This guard serializes the writers: a
contended lock blocks up to ``timeout`` seconds then raises loudly; a lock
older than ``stale_after`` (a crashed writer — these are sub-second
metadata merges) is stolen. ``stale_after`` must stay well above
``timeout`` so a merely-slow holder is never mistaken for a dead one.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


@contextmanager
def excl_lock(
    lock_path: str,
    timeout: float = 10.0,
    stale_after: float = 60.0,
    what: str = "metadata",
):
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                stale = time.time() - os.path.getmtime(lock_path) > stale_after
            except OSError:
                continue  # lock vanished between open and stat — retry now
            if stale:
                try:
                    os.unlink(lock_path)  # crashed writer; steal
                except OSError:
                    pass
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"{what} lock {lock_path} held past {timeout}s — "
                    "another writer in flight? (refusing to race: a lost "
                    "read-merge-replace would silently drop its mutation)"
                )
            time.sleep(0.05)
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(lock_path)
        except OSError:
            pass
