"""glibc malloc tuning for page-fault-heavy virtualized hosts.

On this container, freed large (mmap-backed) allocations are returned to the
OS and every fresh large numpy temporary re-faults its pages at ~40 MB/s —
dominating vectorized kernels. Raising the mmap/trim thresholds keeps freed
memory in the process heap so steady-state allocations reuse warm pages.

Call ``tune_malloc()`` once per process: the bench/test harness does it on
the driver, and stateful stage constructors (actor ``__init__``) do it on
workers. Idempotent; silently a no-op where glibc is unavailable.
"""

from __future__ import annotations

import ctypes
import os

_done = False

# env-var forms, inherited by Ray worker processes forked after us
_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
    "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
}

_M_MMAP_THRESHOLD = -3
_M_TRIM_THRESHOLD = -1


def tune_malloc() -> bool:
    global _done
    if _done:
        return True
    for k, v in _ENV.items():
        os.environ.setdefault(k, v)
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        _done = True
        return True
    except Exception:
        return False
