"""Minimal XSLT 1.0 subset interpreter on the stdlib xml.etree — so a
REAL ``.xsl`` stylesheet executes in this container (libxslt/lxml are
absent; lxml is used as the fast path when importable).

Parity: the reference's ``xslTransform``/``xslPipeline``
(src/main/index.js:87-126) resolves a control document's ``xi:include``
chain to stylesheets and applies them in document order, each step
consuming the previous step's serialized output. This module supplies
the per-step execution those functions delegate to libxslt for; the
chain resolution lives in plans/xsl_chain.py and the Spark wiring
(Arrow-batched column transform) alongside it.

Supported subset (raises XsltUnsupported on anything else, so silent
wrong answers are impossible):

- ``xsl:template`` with match patterns ``/``, ``name``, ``a/b``,
  ``*``, ``text()``, with ``[...]`` predicates; last-declared wins on
  equal specificity (document/built-in rules per XSLT 1.0 5.8)
- ``xsl:apply-templates`` (optional ``select``), ``xsl:for-each``,
  ``xsl:value-of``, ``xsl:if``, ``xsl:choose/when/otherwise``,
  ``xsl:text``, literal result elements with ``{expr}`` attribute
  value templates
- select/test paths: relative child steps, ``@attr``, ``.``,
  ``text()``, ``*``, ``[...]`` predicates; tests support ``not(...)``,
  existence, and ``= != < <= > >=`` against quoted-string or numeric
  literals
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

XSL_NS = "http://www.w3.org/1999/XSL/Transform"
_OPS = ("!=", ">=", "<=", "=", "<", ">")


class XsltUnsupported(ValueError):
    """Stylesheet uses XSLT outside the implemented subset."""


class _Doc:
    """XPath document-node stand-in (ElementTree has no document node)."""

    __slots__ = ("root",)

    def __init__(self, root: ET.Element):
        self.root = root


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) and tag.startswith("{") else tag


def _is_xsl(elem, name: str | None = None) -> bool:
    tag = getattr(elem, "tag", None)
    if not isinstance(tag, str) or not tag.startswith("{" + XSL_NS + "}"):
        return False
    return name is None or _local(tag) == name


def _string(item) -> str:
    if isinstance(item, str):
        return item
    if isinstance(item, _Doc):
        return "".join(item.root.itertext())
    return "".join(item.itertext())


import functools


@functools.lru_cache(maxsize=4096)
def _parse_step(step: str) -> tuple[str, tuple[str, ...]]:
    preds: list[str] = []
    while step.endswith("]"):
        i = step.rindex("[")
        preds.insert(0, step[i + 1 : -1])
        step = step[:i]
    if "(" in step and step != "text()":
        raise XsltUnsupported(f"path function {step!r}")
    return step, tuple(preds)


@functools.lru_cache(maxsize=4096)
def _path_steps(path: str) -> tuple[tuple[str, tuple[str, ...]], ...]:
    """Pre-split a select path into (name, predicates) steps — paths in
    a stylesheet are few and static, but _select runs per node per row;
    caching removes the per-row string parsing from the hot loop."""
    return tuple(_parse_step(raw) for raw in path.split("/") if raw)


@functools.lru_cache(maxsize=4096)
def _split_comparison(expr: str):
    """Find the top-level comparison operator: outside quotes AND
    outside [...] predicates (which contain their own comparisons)."""
    in_quote = False
    depth = 0
    i = 0
    while i < len(expr):
        ch = expr[i]
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif depth == 0:
                for op in _OPS:
                    if expr.startswith(op, i):
                        return expr[:i].strip(), op, expr[i + len(op) :].strip()
        i += 1
    return None


def _literal(token: str):
    """Quoted-string or numeric literal, else None (it's a path)."""
    if len(token) >= 2 and token[0] == "'" and token[-1] == "'":
        return token[1:-1]
    try:
        return float(token)
    except ValueError:
        return None


class MiniXslt:
    """One compiled stylesheet; ``apply(xml) -> str`` runs it."""

    def __init__(self, src: str):
        root = ET.fromstring(src)
        if _local(root.tag) not in ("stylesheet", "transform"):
            raise XsltUnsupported(f"root element {root.tag!r}")
        self.templates: list[tuple[str, ET.Element]] = []
        for child in root:
            if _is_xsl(child, "template"):
                match = child.get("match")
                if not match:
                    raise XsltUnsupported("template without match (named templates)")
                if match.startswith("/") and match != "/":
                    raise XsltUnsupported(f"absolute match pattern {match!r}")
                self.templates.append((match, child))
            elif _is_xsl(child, "output"):
                continue  # serialization is always unindented UTF-8 text
            elif isinstance(child.tag, str):
                raise XsltUnsupported(f"top-level {child.tag!r}")
        # ancestry is only consulted by multi-step match patterns (a/b);
        # skip the per-document parent-map pass when none exist
        self._needs_parents = any(
            "/" in match and match != "/" for match, _ in self.templates
        )
        self._parents: dict = {}

    # -- public -----------------------------------------------------------

    def apply(self, xml: str) -> str:
        src_root = ET.fromstring(xml)
        if self._needs_parents:
            self._parents = {c: p for p in src_root.iter() for c in p}
        self._depth = 0
        return self._apply_to([_Doc(src_root)])

    # -- template dispatch ------------------------------------------------

    def _apply_to(self, nodes) -> str:
        # depth guard: a template that re-applies to its own context
        # (legal-but-divergent XSLT) fails fast instead of blowing the
        # recursion limit 1000 frames deep inside an executor
        self._depth += 1
        if self._depth > 64:
            # each template cycle costs ~8 interpreter frames, so 64
            # stays far from CPython's 1000-frame default while being
            # deeper than any sane row-document stylesheet
            raise XsltUnsupported("template recursion deeper than 64")
        try:
            return "".join(self._apply_one(n) for n in nodes)
        finally:
            self._depth -= 1

    def _apply_one(self, node) -> str:
        best = None
        for idx, (pattern, telem) in enumerate(self.templates):
            score = self._match_score(pattern, node)
            if score is not None and (best is None or score + (idx,) >= best[0]):
                best = (score + (idx,), telem)
        if best is not None:
            return self._run_children(best[1], node)
        # built-in rules: recurse into children; copy text through
        if isinstance(node, str):
            return escape(node)
        if isinstance(node, _Doc):
            return self._apply_to([node.root])
        return self._apply_to(self._node_children(node))

    def _match_score(self, pattern: str, node):
        pattern = pattern.strip()
        if pattern == "/":
            return (0, 0, 2) if isinstance(node, _Doc) else None
        if isinstance(node, (str, _Doc)):
            return (0, 0, 0) if pattern == "text()" and isinstance(node, str) else None
        steps = pattern.split("/")
        target = node
        n_preds = 0
        for i, raw in enumerate(reversed(steps)):
            if i > 0:
                target = self._parents.get(target)
                if target is None:
                    return None
            name, preds = _parse_step(raw)
            if name == "text()":
                return None  # element node can't match a text step
            if name != "*" and _local(target.tag) != name:
                return None
            if not all(self._test(target, p) for p in preds):
                return None
            n_preds += len(preds)
        name0, _ = _parse_step(steps[-1])
        return (len(steps) - 1, n_preds, 0 if name0 == "*" else 1)

    def _node_children(self, elem: ET.Element) -> list:
        out: list = []
        if elem.text:
            out.append(elem.text)
        for child in elem:
            out.append(child)
            if child.tail:
                out.append(child.tail)
        return out

    # -- instruction execution --------------------------------------------

    def _run_children(self, container: ET.Element, ctx) -> str:
        frags: list[str] = []
        if container.text and container.text.strip():
            frags.append(escape(container.text))
        for child in container:
            frags.append(self._run_node(child, ctx))
            if child.tail and child.tail.strip():
                frags.append(escape(child.tail))
        return "".join(frags)

    def _run_node(self, elem: ET.Element, ctx) -> str:
        if not isinstance(elem.tag, str):  # comments / PIs in the stylesheet
            return ""
        if _is_xsl(elem):
            name = _local(elem.tag)
            if name == "value-of":
                items = self._select(ctx, elem.get("select", "."))
                return escape(_string(items[0])) if items else ""
            if name == "for-each":
                return "".join(
                    self._run_children(elem, n)
                    for n in self._select(ctx, elem.get("select", "."))
                )
            if name == "if":
                return self._run_children(elem, ctx) if self._test(ctx, elem.get("test", "")) else ""
            if name == "choose":
                for branch in elem:
                    if _is_xsl(branch, "when") and self._test(ctx, branch.get("test", "")):
                        return self._run_children(branch, ctx)
                for branch in elem:
                    if _is_xsl(branch, "otherwise"):
                        return self._run_children(branch, ctx)
                return ""
            if name == "apply-templates":
                sel = elem.get("select")
                if sel is not None:
                    nodes = self._select(ctx, sel)
                elif isinstance(ctx, _Doc):
                    nodes = [ctx.root]
                elif isinstance(ctx, ET.Element):
                    nodes = self._node_children(ctx)
                else:
                    nodes = []
                return self._apply_to(nodes)
            if name == "text":
                return escape(elem.text or "")
            raise XsltUnsupported(f"xsl:{name}")
        # literal result element
        attrs = "".join(
            f" {k}={quoteattr(self._avt(v, ctx))}" for k, v in elem.attrib.items()
        )
        inner = self._run_children(elem, ctx)
        tag = _local(elem.tag)
        return f"<{tag}{attrs}>{inner}</{tag}>" if inner else f"<{tag}{attrs}/>"

    def _avt(self, value: str, ctx) -> str:
        out: list[str] = []
        i = 0
        while i < len(value):
            ch = value[i]
            if ch == "{":
                if value.startswith("{{", i):
                    out.append("{")
                    i += 2
                    continue
                end = value.index("}", i)
                items = self._select(ctx, value[i + 1 : end])
                if items:
                    out.append(_string(items[0]))
                i = end + 1
            elif ch == "}":
                i += 2 if value.startswith("}}", i) else 1
                out.append("}")
            else:
                out.append(ch)
                i += 1
        return "".join(out)

    # -- path / test evaluation -------------------------------------------

    def _select(self, ctx, path: str) -> list:
        path = path.strip()
        if path == ".":
            return [ctx]
        if path.startswith("/"):
            raise XsltUnsupported(f"absolute select path {path!r}")
        cur = [ctx]
        for name, preds in _path_steps(path):
            nxt: list = []
            for node in cur:
                if isinstance(node, str):
                    continue
                children = [node.root] if isinstance(node, _Doc) else list(node)
                if name == ".":
                    cand: list = [node]
                elif name.startswith("@"):
                    cand = (
                        [node.attrib[name[1:]]]
                        if isinstance(node, ET.Element) and name[1:] in node.attrib
                        else []
                    )
                elif name == "text()":
                    cand = (
                        [node.text]
                        if isinstance(node, ET.Element) and node.text
                        else []
                    )
                elif name == "*":
                    cand = children
                else:
                    cand = [c for c in children if _local(c.tag) == name]
                for c in cand:
                    if all(self._test(c, p) for p in preds):
                        nxt.append(c)
            cur = nxt
        return cur

    def _test(self, ctx, expr: str) -> bool:
        expr = expr.strip()
        if not expr:
            return False
        if expr.startswith("not(") and expr.endswith(")"):
            return not self._test(ctx, expr[4:-1])
        cmp = _split_comparison(expr)
        if cmp is None:
            return bool(self._select(ctx, expr))
        lhs, op, rhs = cmp
        rhs_lit = _literal(rhs)
        if rhs_lit is None:
            lhs, rhs = rhs, lhs  # literal-first spelling: 'x' = path
            rhs_lit = _literal(rhs)
            if rhs_lit is None:
                raise XsltUnsupported(f"path-to-path comparison {expr!r}")
        values = [_string(v) for v in self._select(ctx, lhs)]
        if isinstance(rhs_lit, float):
            nums = []
            for v in values:
                try:
                    nums.append(float(v))
                except ValueError:
                    pass
            values = nums
        if op == "=":
            return any(v == rhs_lit for v in values)
        if op == "!=":
            return any(v != rhs_lit for v in values)
        if not isinstance(rhs_lit, float):
            raise XsltUnsupported(f"ordered comparison with string literal {expr!r}")
        return any(
            (op == "<" and v < rhs_lit)
            or (op == "<=" and v <= rhs_lit)
            or (op == ">" and v > rhs_lit)
            or (op == ">=" and v >= rhs_lit)
            for v in values
        )


def compile_stylesheet(src: str):
    """``src`` -> callable(xml_string) -> transformed string. lxml's
    real libxslt is the fast path when present; the MiniXslt subset
    interpreter otherwise (tests assert the two agree when both run)."""
    try:
        from lxml import etree as LX  # pragma: no cover - absent in container

        xslt = LX.XSLT(LX.fromstring(src.encode()))
        return lambda xml: str(xslt(LX.fromstring(xml.encode())))
    except ImportError:
        return MiniXslt(src).apply


def xslt_pipeline(xml: str, transforms) -> str:
    """Apply compiled transforms head-first, each consuming the previous
    output — the reference's xslPipeline recursion (index.js:87-106)."""
    for fn in transforms:
        xml = fn(xml)
    return xml
