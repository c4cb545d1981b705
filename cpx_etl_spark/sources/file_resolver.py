"""Glob-tree file resolution.

Parity: the reference's FileResolver builds a tree of glob matches
rooted at a URL and resolves logical pathnames to the deepest matching
physical file (reference: src/main/FileResolver.js). Driver-side by
design — path resolution feeds spark.read, it is not data-plane work.
"""

from __future__ import annotations

import glob as _glob
import os


class FileResolver:
    def __init__(self, url: str, globs: dict):
        self.url = url
        self.tree: dict = {}
        self._initialize(globs, ".", self.tree)

    def _initialize(self, globs: dict, cwd: str, tree: dict) -> None:
        for pattern, sub in globs.items():
            base = os.path.normpath(os.path.join(self.url, cwd))
            if pattern == "_":
                files = sorted(_glob.glob(sub, root_dir=base))
                tree["_"] = dict.fromkeys(files)
            else:
                for match in sorted(_glob.glob(pattern, root_dir=base)):
                    subtree: dict = {}
                    self._initialize(sub, os.path.join(cwd, match), subtree)
                    tree[match] = subtree

    def resolve(self, pathname: str) -> str:
        """Longest-prefix walk, then innermost-first leaf lookup."""
        parts = [{"tree": self.tree, "prefix": ""}]
        tree, index, prefix = self.tree, 0, ""
        while True:
            frag = next(
                (k for k in tree if k != "_" and pathname[index:].startswith(k)),
                None,
            )
            if frag is None:
                break
            index += len(frag)
            prefix += frag
            tree = tree[frag]
            parts.append({"tree": tree, "prefix": prefix})
        suffix = pathname[index:]
        for part in reversed(parts):
            leaves = part["tree"].get("_", {})
            if suffix in leaves:
                return os.path.normpath(os.path.join(self.url, part["prefix"], suffix))
        raise FileNotFoundError(f"FileResolver.resolve: file not found: {pathname}")
