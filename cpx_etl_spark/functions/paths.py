"""applyPath-style path expressions over nested columns.

Parity: the reference resolves dotted paths against a record with
special tokens — leading '$' jumps to the message root, bare '#' is
the element's index in its parent array, and '#field' is the length of
the array at `field` (reference: src/main/etl.js:35-75). Columnar
re-expression: a path compiles to a Column over the row (the row IS
the root), so '$' is a no-op prefix, and '#field' becomes size().
Bare '#' is only defined inside array-element mapping (plans/mapping.py
threads the index through F.transform's lambda).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_col(path: str, root: Column | None = None) -> Column:
    """Compile an applyPath expression to a Column.

    `root` anchors relative parts when mapping inside a nested scope;
    None means the row itself.
    """
    parts = path.split(".")
    col: Column | None = root
    for i, part in enumerate(parts):
        if part == "$":
            col = None  # reset to row root
            continue
        if part.startswith("#"):
            if i != len(parts) - 1:
                raise ValueError(f"applyPath: {path}: '#' must be last element")
            if part == "#":
                raise ValueError(
                    "applyPath: bare '#' (array index) is only valid inside an "
                    "array mapping scope"
                )
            target = part[1:]
            inner = F.col(target) if col is None else col.getField(target)
            return F.size(inner).cast("long")
        col = F.col(part) if col is None else col.getField(part)
    if col is None:
        raise ValueError(f"applyPath: {path}: empty path")
    return col


def path_lineage(path: str) -> tuple[str, str, bool]:
    """Static mirror of :func:`path_col` for lineage: returns
    ``(kind, normalized_path, scoped)`` without building a Column.
    ``kind`` is 'path' or 'length'; ``normalized_path`` has '$' resets
    applied and the '#' length marker stripped; ``scoped`` is False
    when a '$' reset discarded the enclosing array scope. Raises the
    same ValueErrors path_col would, so lineage rejects exactly what
    the compiler rejects."""
    parts = path.split(".")
    kind = "path"
    kept: list[str] = []
    scoped = True
    for i, part in enumerate(parts):
        if part == "$":
            kept = []
            scoped = False
            continue
        if part.startswith("#"):
            if i != len(parts) - 1:
                raise ValueError(f"applyPath: {path}: '#' must be last element")
            if part == "#":
                raise ValueError(
                    "applyPath: bare '#' (array index) is only valid inside an "
                    "array mapping scope"
                )
            kind = "length"
            kept.append(part[1:])
            continue
        kept.append(part)
    if not kept:
        raise ValueError(f"applyPath: {path}: empty path")
    return kind, ".".join(kept), scoped
