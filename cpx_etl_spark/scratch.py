"""Per-process scratch directories with guaranteed cleanup.

Round-trip queries (xlsx, db-load, interchange, partitioned sink) need a
fresh directory per invocation so concurrent or stale runs never share
mutable state — but a bare ``tempfile.mkdtemp`` per call leaks /tmp
space across gate sweeps and min-of-N bench passes (r3 ADVICE). All
scratch dirs are created under one process-owned root that is removed
atexit, so repeated invocations stay isolated *and* bounded.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    if _ROOT is None or not os.path.isdir(_ROOT):
        _ROOT = tempfile.mkdtemp(prefix="cpx_etl_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str = "d_") -> str:
    """A fresh empty directory, auto-removed when the process exits."""
    return tempfile.mkdtemp(prefix=prefix, dir=_root())
