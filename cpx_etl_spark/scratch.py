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


def user_cache_root() -> str:
    """Persistent per-user 0700 cache root for standing artifacts that
    deliberately OUTLIVE the process (trained ANN / signature indexes:
    build once, serve many). A predictable name directly under shared
    /tmp would let another local user pre-plant an artifact that a
    gated query then silently serves (the vendor-zip threat model,
    code-review r10) — so the root carries the uid, is created 0700,
    and a pre-existing dir with the wrong owner or looser permissions
    is refused rather than trusted."""
    import stat as stat_mod

    d = os.path.join(tempfile.gettempdir(), f"cpx_cache_{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    # lstat, NOT stat: a pre-planted SYMLINK at the predictable name
    # would pass a follow-the-link ownership check while redirecting
    # every cache write into an attacker-chosen victim-owned directory
    # (code-review r10)
    st = os.lstat(d)
    if stat_mod.S_ISLNK(st.st_mode) or not stat_mod.S_ISDIR(st.st_mode):
        raise RuntimeError(
            f"refusing cache root {d!r}: not a real directory "
            "(symlink pre-plant?)"
        )
    if st.st_uid != os.getuid() or (st.st_mode & 0o077):
        raise RuntimeError(
            f"refusing cache root {d!r}: owned by uid {st.st_uid} with "
            f"mode {oct(st.st_mode & 0o777)}; expected uid {os.getuid()} "
            "and mode 0700"
        )
    return d


def corpus_index_dir(sf_dir: str, source: str, prefix: str,
                     tag_parts: list[str]) -> str:
    """Deterministic per-(corpus, params) cache location for a
    persisted standing index under user_cache_root(): the digest
    covers ``tag_parts`` plus the source parquet's per-file
    size+mtime, so regenerated testdata invalidates the cache instead
    of serving a stale artifact. The single home of the convention
    every build_*_standing_index shares (extracted from seven
    hand-copies, code-review r13).

    CONTRACT (ADVICE r16 item 1, resolved as documentation): every
    corpus_index_dir artifact — data, meta AND build markers (_BUILT,
    _APPENDED, knn-graph meta) — is DRIVER-LOCAL-ONLY by definition:
    the digest itself comes from local os.stat/os.listdir of the
    source, and user_cache_root() is a local per-user directory. A
    deployment whose fs.defaultFS is remote must not point these
    caches at it; the Hadoop-FS meta helpers (_read/_write_shard_meta)
    exist for the SHARD artifacts, whose paths are caller-supplied and
    may be remote."""
    import hashlib

    parts = [os.path.abspath(sf_dir), *tag_parts]
    src = os.path.join(sf_dir, source)
    files = (
        sorted(os.path.join(src, e) for e in os.listdir(src))
        if os.path.isdir(src) else [src]
    )
    for p in files:
        st = os.stat(p)
        parts.append(f"{os.path.basename(p)}:{st.st_size}:{int(st.st_mtime)}")
    digest = hashlib.md5("|".join(parts).encode()).hexdigest()[:16]
    return os.path.join(user_cache_root(), f"{prefix}{digest}")
