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
- NAMED templates + ``xsl:call-template`` with ``xsl:with-param``
  (r6); ``xsl:param`` declares defaults in both named and match
  templates (``xsl:apply-templates`` may also carry with-param)
- ``xsl:variable`` / ``xsl:param``, global and local, ``select`` or
  body content (result-tree fragments: string-value for comparisons
  and value-of, markup for copy-of); referenced as ``$name`` in
  selects, tests, and AVTs; lexically scoped, shadowing allowed
- ``xsl:apply-templates`` (optional ``select``), ``xsl:for-each``,
  both with ``xsl:sort`` keys (select / data-type text|number /
  order ascending|descending, stable multi-key)
- ``xsl:value-of``, ``xsl:if``, ``xsl:choose/when/otherwise``,
  ``xsl:text``, ``xsl:copy-of``, ``xsl:element`` (AVT name) and
  ``xsl:attribute`` on any constructed element, literal result
  elements with ``{expr}`` attribute value templates
- ``position()`` / ``last()`` inside iterations and predicates,
  ``count(path)``, ``concat(...)``, ``string-length(...)``,
  ``normalize-space(...)``, ``string(...)``, numeric index predicates
  (``item[2]``, ``item[last()]``) with XPath 1.0
  sequential-renumbering semantics
- select/test paths: relative child steps, absolute ``/a/b`` selects,
  ``@attr``, ``.``, ``text()``, ``*``, ``[...]`` predicates (predicates
  may contain nested paths — bracket/quote-aware parsing); tests
  support ``not(...)``, existence, and ``= != < <= > >=`` against
  quoted-string or numeric literals or ``$var`` references
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

XSL_NS = "http://www.w3.org/1999/XSL/Transform"
_OPS = ("!=", ">=", "<=", "=", "<", ">")
_MISSING = object()  # "kind not passed" sentinel for _run_node


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


class _RTF:
    """Result-tree fragment from an xsl:variable body: ``markup`` is
    the rendered XML; the XPath string-value (text content only) is
    recovered lazily by re-parsing — our own output is well-formed."""

    __slots__ = ("markup", "_text")

    def __init__(self, markup: str):
        self.markup = markup
        self._text: str | None = None

    def text(self) -> str:
        if self._text is None:
            frag = ET.fromstring(f"<r>{self.markup}</r>")
            self._text = "".join(frag.itertext())
        return self._text


def _string(item) -> str:
    # str first — the hot operand shape (attribute values, text nodes);
    # bool is not a str subclass, so the reorder is safe
    if isinstance(item, str):
        return item
    if isinstance(item, bool):  # XPath boolean->string
        return "true" if item else "false"
    if isinstance(item, _RTF):
        return item.text()
    if isinstance(item, _Doc):
        return "".join(item.root.itertext())
    return "".join(item.itertext())


import functools

_RECLIMIT_OK = False


def _ensure_recursion_limit() -> None:
    """Raise the interpreter recursion limit to 5000 once per process
    (template recursion needs ~8 CPython frames per level and is
    already bounded by _MAX_TDEPTH). Never lowers an existing limit."""
    global _RECLIMIT_OK
    if not _RECLIMIT_OK:
        import sys

        if sys.getrecursionlimit() < 5000:
            sys.setrecursionlimit(5000)
        _RECLIMIT_OK = True


def _close_paren(s: str, start: int) -> int:
    """Index of the ')' matching the '(' at ``start``, quote-aware."""
    depth = 0
    in_q = False
    for i in range(start, len(s)):
        ch = s[i]
        if ch == "'":
            in_q = not in_q
        elif not in_q:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i
    raise XsltUnsupported(f"unbalanced parentheses in {s!r}")


def _scan_brackets(s: str):
    """Yield (i, ch, depth, in_quote) with depth counted OUTSIDE quotes."""
    depth = 0
    in_q = False
    for i, ch in enumerate(s):
        if ch == "'":
            in_q = not in_q
        elif not in_q:
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
        yield i, ch, depth, in_q


@functools.lru_cache(maxsize=4096)
def _parse_step(step: str) -> tuple[str, tuple[str, ...]]:
    preds: list[str] = []
    while step.endswith("]"):
        # balanced, quote-aware scan for the matching '[' of the final
        # ']' — rindex broke on nested predicates and paths inside
        # predicates like a[b[c]] or a[b/c] (ADVICE r5)
        opens: list[int] = []
        close_match: int | None = None
        for i, ch, depth, in_q in _scan_brackets(step):
            if in_q:
                continue
            if ch == "[" and depth == 1:
                opens.append(i)
            elif ch == "]" and depth == 0 and i == len(step) - 1:
                close_match = opens[-1] if opens else None
        if close_match is None:
            raise XsltUnsupported(f"unbalanced predicate in step {step!r}")
        preds.insert(0, step[close_match + 1 : -1])
        step = step[:close_match]
    if "(" in step and step not in ("text()", "node()"):
        raise XsltUnsupported(f"path function {step!r}")
    return step, tuple(preds)


@functools.lru_cache(maxsize=4096)
def _split_union(expr: str) -> tuple[str, ...]:
    """Split on top-level '|' (pattern alternation), quote/bracket
    aware."""
    parts: list[str] = []
    start = 0
    for i, ch, depth, in_q in _scan_brackets(expr):
        if ch == "|" and depth == 0 and not in_q:
            parts.append(expr[start:i])
            start = i + 1
    parts.append(expr[start:])
    return tuple(p.strip() for p in parts if p.strip())


@functools.lru_cache(maxsize=4096)
def _split_path(path: str) -> tuple[str, ...]:
    """Split a path on '/' at bracket depth 0 outside quotes, so
    predicates containing path steps (a[b/c]) stay intact (ADVICE r5)."""
    parts: list[str] = []
    start = 0
    for i, ch, depth, in_q in _scan_brackets(path):
        if ch == "/" and depth == 0 and not in_q:
            parts.append(path[start:i])
            start = i + 1
    parts.append(path[start:])
    return tuple(p for p in parts if p)


@functools.lru_cache(maxsize=4096)
def _split_path_marked(path: str) -> tuple[tuple[str, bool], ...]:
    """Split on '/' keeping '//' semantics: each returned (segment,
    is_descendant) marks whether the step is reached via the
    descendant axis. A leading empty part (absolute path) is skipped —
    the caller roots absolute paths itself. Malformed runs ('///',
    trailing '//') fail fast. Before this, 'a//b' silently collapsed
    to 'a/b' — a contract violation (silent wrong answers)."""
    parts: list[str] = []
    start = 0
    for i, ch, depth, in_q in _scan_brackets(path):
        if ch == "/" and depth == 0 and not in_q:
            parts.append(path[start:i])
            start = i + 1
    parts.append(path[start:])
    if path == "/":  # document-root selection: zero steps, legal XSLT
        return ()
    out: list[tuple[str, bool]] = []
    pending = False
    for j, seg in enumerate(parts):
        if seg == "":
            if j == 0:
                continue
            if pending:
                raise XsltUnsupported(f"malformed path {path!r}")
            pending = True
            continue
        out.append((seg, pending))
        pending = False
    if pending:
        raise XsltUnsupported(f"trailing '//' in path {path!r}")
    return tuple(out)


@functools.lru_cache(maxsize=4096)
def _split_args(inner: str) -> tuple[str, ...]:
    """Split a function-argument list on top-level commas (outside
    quotes, brackets, and nested parens)."""
    parts: list[str] = []
    depth = 0
    in_q = False
    start = 0
    for i, ch in enumerate(inner):
        if ch == "'":
            in_q = not in_q
        elif not in_q:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(inner[start:i])
                start = i + 1
    parts.append(inner[start:])
    return tuple(p.strip() for p in parts if p.strip())


@functools.lru_cache(maxsize=8192)
def _select_plan(path: str) -> tuple:
    """Classify a select expression once (selects are
    stylesheet-static): the per-call string scans that dominated
    _select's dispatch — strip, endswith/index, isalnum — run here a
    single time per distinct expression. Returns (tag, payload,
    stripped_path); tags: 0 '.', 1 position()/last(), 2 function call
    (payload = (fname, inner)), 3 bare @attr, 4 bare name, 5 $var
    (payload = the name), 6 general path."""
    p = path.strip()
    if p == ".":
        return (0, None, p)
    if p in ("position()", "last()"):
        return (1, None, p)
    if p.endswith(")") and "(" in p:
        i = p.index("(")
        return (2, (p[:i], p[i + 1 : -1]), p)
    if p.startswith("@") and "[" not in p and "/" not in p:
        return (3, p[1:], p)
    if (
        p.isalnum() or p.replace("-", "").replace("_", "").isalnum()
    ) and not p.startswith("$"):
        return (4, None, p)
    if p.startswith("$"):
        return (5, p[1:], p)
    return (6, None, p)


@functools.lru_cache(maxsize=4096)
def _pred_kind(p: str):
    """Classify a predicate once (predicates are stylesheet-static):
    ('index', k) | ('last',) | ('positional', stripped) | ('plain',
    stripped)."""
    ps = p.strip()
    if ps.isdigit():
        return ("index", int(ps))
    if ps == "last()":
        return ("last",)
    if "position()" in ps or "last()" in ps:
        return ("positional", ps)
    return ("plain", ps)


@functools.lru_cache(maxsize=4096)
def _avt_segments(value: str) -> tuple[tuple[str, str], ...]:
    """Attribute-value-template -> ('lit'|'expr', payload) segments,
    cached: AVT strings are stylesheet-static but rendered per row."""
    segs: list[tuple[str, str]] = []
    lit: list[str] = []
    i = 0
    while i < len(value):
        ch = value[i]
        if ch == "{":
            if value.startswith("{{", i):
                lit.append("{")
                i += 2
                continue
            end = value.index("}", i)
            if lit:
                segs.append(("lit", "".join(lit)))
                lit = []
            segs.append(("expr", value[i + 1 : end]))
            i = end + 1
        elif ch == "}":
            i += 2 if value.startswith("}}", i) else 1
            lit.append("}")
        else:
            lit.append(ch)
            i += 1
    if lit or not segs:
        segs.append(("lit", "".join(lit)))
    return tuple(segs)


@functools.lru_cache(maxsize=4096)
def _path_steps(path: str) -> tuple[tuple[str, tuple[str, ...], bool], ...]:
    """Pre-split a select path into (name, predicates, is_descendant)
    steps — paths in a stylesheet are few and static, but _select runs
    per node per row; caching removes the per-row string parsing from
    the hot loop."""
    return tuple(
        (*_parse_step(seg), desc) for seg, desc in _split_path_marked(path)
    )


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


@functools.lru_cache(maxsize=8192)
def _test_plan(expr: str) -> tuple:
    """Classify a test expression once (tests are stylesheet-static).
    Returns (kind, payload): 0 empty, 1 or-list, 2 and-list,
    3 parenthesized group, 4 not(...), 5 existence select,
    6 comparison (payload = (lhs, op, rhs)). XPath precedence: or
    lowest, then and, then grouping, then comparison."""
    e = expr.strip()
    if not e:
        return (0, None)
    ors = _split_bool(e, "or")
    if len(ors) > 1:
        return (1, ors)
    ands = _split_bool(e, "and")
    if len(ands) > 1:
        return (2, ands)
    if e.startswith("(") and _close_paren(e, 0) == len(e) - 1:
        return (3, e[1:-1])
    if e.startswith("not(") and e.endswith(")"):
        return (4, e[4:-1])
    cmp = _split_comparison(e)
    if cmp is None:
        return (5, e)
    return (6, cmp)


@functools.lru_cache(maxsize=4096)
def _split_bool(expr: str, word: str) -> tuple[str, ...]:
    """Split on the XPath boolean operator ``word`` (' and ' / ' or ')
    at paren/bracket depth 0 outside quotes. Cached like _path_steps:
    the expression set is stylesheet-static but _test runs per node
    per row."""
    parts: list[str] = []
    depth = 0
    in_q = False
    start = 0
    i = 0
    token = f" {word} "
    n = len(token)
    while i < len(expr):
        ch = expr[i]
        if ch == "'":
            in_q = not in_q
        elif not in_q:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif depth == 0 and expr.startswith(token, i):
                parts.append(expr[start:i])
                i += n
                start = i
                continue
        i += 1
    parts.append(expr[start:])
    return tuple(p for p in parts)


# the default decimal-format (XSLT 1.0 §12.3) — a named/unnamed
# xsl:decimal-format declaration overrides these per stylesheet
_DEFAULT_DF = {
    "decimal": ".",
    "group": ",",
    "minus": "-",
    "percent": "%",
    "nan": "NaN",
    "infinity": "Infinity",
}
# declaration attribute -> symbol key; attributes outside this map
# (zero-digit, digit, pattern-separator, per-mille) stay out of subset
_DF_ATTRS = {
    "decimal-separator": "decimal",
    "grouping-separator": "group",
    "minus-sign": "minus",
    "percent": "percent",
    "NaN": "nan",
    "infinity": "infinity",
}


def _format_number(value: float, pattern: str, sym: dict | None = None) -> str:
    """XSLT 1.0 format-number() subset: '0' (required digit), '#'
    (optional digit), the decimal point, the grouping separator
    (distance from the LAST separator to the decimal point), and a
    trailing percent (multiply by 100). ``sym`` carries the active
    xsl:decimal-format's symbols (default §12.3 set when None) — the
    PATTERN is written in those symbols too, per JDK DecimalFormat.
    Rounding is half-even, as Java DecimalFormat specifies. No
    negative sub-pattern (the minus sign is prefixed), no
    currency/permille — out-of-subset patterns fail fast."""
    import decimal

    sym = sym or _DEFAULT_DF
    dec, grp, pct_ch = sym["decimal"], sym["group"], sym["percent"]
    if any(c not in ("0#" + dec + grp + pct_ch) for c in pattern):
        raise XsltUnsupported(f"format-number pattern {pattern!r}")
    pct = pattern.endswith(pct_ch)
    if pct:
        pattern = pattern[: -len(pct_ch)]
        value = value * 100
    if pattern.count(dec) > 1 or not pattern:
        raise XsltUnsupported(f"format-number pattern {pattern!r}")
    int_pat, _, frac_pat = pattern.partition(dec)
    group = 0
    if grp in int_pat:
        group = len(int_pat) - int_pat.rindex(grp) - 1
        int_pat = int_pat.replace(grp, "")
    max_frac = len(frac_pat)
    min_frac = len(frac_pat.rstrip("#"))
    min_int = max(1, len(int_pat.lstrip("#"))) if int_pat else 1
    d = decimal.Decimal(repr(value)).quantize(
        decimal.Decimal(1).scaleb(-max_frac), rounding=decimal.ROUND_HALF_EVEN
    )
    neg = d < 0
    d = abs(d)
    int_part, _, frac_part = format(d, "f").partition(".")
    frac_part = frac_part.rstrip("0")
    while len(frac_part) < min_frac:
        frac_part += "0"
    int_part = int_part.lstrip("0") or ""
    while len(int_part) < min_int:
        int_part = "0" + int_part
    if group:
        rev = int_part[::-1]
        int_part = grp.join(
            rev[i : i + group] for i in range(0, len(rev), group)
        )[::-1]
    out = int_part + (f"{dec}{frac_part}" if frac_part else "")
    if pct:
        out += pct_ch
    return (sym["minus"] + out) if neg else out


def _roman(n: int) -> str:
    out = []
    for v, sym in ((1000, "m"), (900, "cm"), (500, "d"), (400, "cd"),
                   (100, "c"), (90, "xc"), (50, "l"), (40, "xl"),
                   (10, "x"), (9, "ix"), (5, "v"), (4, "iv"), (1, "i")):
        while n >= v:
            out.append(sym)
            n -= v
    return "".join(out)


def _alpha(n: int) -> str:
    """Bijective base-26: 1->a .. 26->z, 27->aa."""
    out = []
    while n > 0:
        n, r = divmod(n - 1, 26)
        out.append(chr(ord("a") + r))
    return "".join(reversed(out))


def _format_one_token(n: int, tok: str) -> str:
    import re

    if re.fullmatch(r"0*1", tok):
        return str(n).zfill(len(tok)) if n >= 0 else str(n)
    if tok in ("a", "A"):
        return str(n) if n < 1 else (
            _alpha(n).upper() if tok == "A" else _alpha(n)
        )
    if tok in ("i", "I"):
        return str(n) if n < 1 else (
            _roman(n).upper() if tok == "I" else _roman(n)
        )
    raise XsltUnsupported(f"xsl:number format token {tok!r}")


def _format_xsl_number(nums, fmt: str) -> str:
    """xsl:number format strings (XSLT 1.0 §7.7.1): alternating
    separators and format tokens; the n-th number uses the n-th token,
    extra numbers reuse the LAST token with the last separator ('.'
    when the format has no interior separator). Tokens: '1' (decimal),
    '0…01' (zero-padded), 'a'/'A' (bijective base-26), 'i'/'I'
    (roman). Non-positive numbers fall back to plain decimal for the
    letter/roman alphabets (they have no zero). ``nums`` is one int
    (level single/any/value) or a list (level multiple)."""
    import re

    if isinstance(nums, int):
        nums = [nums]
    lead = re.match(r"^[^0-9A-Za-z]*", fmt).group(0)
    trail = re.search(r"[^0-9A-Za-z]*$", fmt).group(0)
    core = fmt[len(lead):len(fmt) - len(trail)] if trail else fmt[len(lead):]
    tokens = re.findall(r"[0-9A-Za-z]+", core) or ["1"]
    seps = [s for s in re.split(r"[0-9A-Za-z]+", core) if s][: len(tokens) - 1]
    out = [lead]
    for i, n in enumerate(nums):
        if i > 0:
            out.append(seps[i - 1] if i - 1 < len(seps)
                       else (seps[-1] if seps else "."))
        out.append(_format_one_token(n, tokens[min(i, len(tokens) - 1)]))
    return "".join(out) + trail


class MiniXslt:
    """One compiled stylesheet; ``apply(xml) -> str`` runs it.

    ``base_dir`` anchors relative ``document(uri)`` references (the
    stylesheet's own directory in a file deployment). External
    documents are parsed ONCE per compiled stylesheet and cached —
    they are static configuration, so per-row apply() calls reuse the
    tree (in a cluster deployment the referenced files must be
    present on executors, e.g. via SparkContext.addFile)."""

    def __init__(self, src: str, base_dir: str | None = None):
        self.base_dir = base_dir
        self._ext_docs: dict[str, _Doc] = {}
        self._ext_parents: dict = {}
        root = ET.fromstring(src)
        # position()/last() cost a context push per iterated node; skip
        # the bookkeeping entirely for stylesheets that never use them
        # (re-checked against every imported/included sheet's source)
        self._needs_pos = "position()" in src or "last()" in src
        if _local(root.tag) not in ("stylesheet", "transform"):
            raise XsltUnsupported(f"root element {root.tag!r}")
        # (match, mode, telem, import_precedence): higher precedence =
        # importing sheet; per XSLT 1.0 §2.6.2 precedence eliminates
        # candidates BEFORE priority/specificity is consulted
        self.templates: list[tuple[str, str | None, ET.Element, int]] = []
        self.named: dict[str, ET.Element] = {}
        self._globals: list[ET.Element] = []
        # xsl:key declarations: name -> [(match_pattern, use_expr)];
        # XSLT 1.0 allows several declarations per key name (union)
        self._key_decls: dict[str, list[tuple[str, str]]] = {}
        # xsl:decimal-format symbol sets; "" is the unnamed default
        self._decimal_formats: dict[str, dict] = {}
        # xsl:strip-space / xsl:preserve-space element-name tests
        self._strip_names: set[str] = set()
        self._preserve_names: set[str] = set()
        # xsl:attribute-set: name -> declarations in load order (merged
        # per XSLT 1.0 §7.1.4 — later/higher-precedence wins per attr)
        self._attr_sets: dict[str, list[ET.Element]] = {}
        # document-root id -> directory anchoring that document's
        # relative document() references (the 2-arg form's base)
        self._doc_base: dict[int, str | None] = {}
        self._sheet_roots: list[ET.Element] = []
        self._load_stack: list[str] = []  # ACTIVE import/include chain (cycle guard)
        self._prec_counter = 0
        self._load_sheet(root)
        self._finish_compile()

    def _load_ref(self, elem: ET.Element, what: str,
                  prec: int | None) -> None:
        """Load the stylesheet referenced by an xsl:import/xsl:include
        href, resolved against base_dir. Cycle detection follows the
        ACTIVE load chain only — a diamond (two imports sharing a base
        sheet) is legal XSLT 1.0 and loads the shared sheet once per
        reference, each at its own precedence; only a sheet reachable
        from itself is an error."""
        import os

        href = elem.get("href")
        if not href:
            raise XsltUnsupported(f"xsl:{what} requires an href")
        if self.base_dir is None:
            raise XsltUnsupported(
                f"xsl:{what} href={href!r}: stylesheet compiled without a base_dir"
            )
        full = os.path.normpath(os.path.join(self.base_dir, href))
        if full in self._load_stack:
            raise XsltUnsupported(f"xsl:{what} cycle through {href!r}")
        with open(full, encoding="utf-8") as fh:
            src_text = fh.read()
        sub = ET.fromstring(src_text)
        if _local(sub.tag) not in ("stylesheet", "transform"):
            raise XsltUnsupported(f"xsl:{what} target root {sub.tag!r}")
        self._needs_pos = (
            self._needs_pos or "position()" in src_text or "last()" in src_text
        )
        self._load_stack.append(full)
        try:
            self._load_sheet(sub, prec)
        finally:
            self._load_stack.pop()

    def _load_sheet(self, root: ET.Element, prec: int | None = None) -> None:
        """Collect one stylesheet's top-level declarations.

        xsl:import children (which XSLT 1.0 §2.6.2 requires first) are
        loaded RECURSIVELY BEFORE this sheet's own declarations with
        strictly lower import precedence (earlier imports lower than
        later ones); xsl:include splices at the includer's precedence.
        Because imported sheets load first, 'later wins' dict writes for
        named templates and global variables implement the precedence
        override for free."""
        own_prec = prec
        seen_decl = False  # any non-import declaration gates later imports
        for child in root:
            if _is_xsl(child, "import"):
                if prec is not None:
                    # an include splices at the includer's precedence,
                    # which is already assigned — an import inside it
                    # cannot get a lower one anymore
                    raise XsltUnsupported("xsl:import inside an included stylesheet")
                if own_prec is not None or seen_decl:
                    # §2.6.2 requires imports to precede EVERY other
                    # declaration; allowing a later import would hand
                    # the imported sheet's globals later-wins priority,
                    # inverting precedence (code-review r8)
                    raise XsltUnsupported("xsl:import after other declarations")
                self._load_ref(child, "import", None)
            elif _is_xsl(child, "include"):
                if own_prec is None:
                    own_prec = self._prec_counter
                    self._prec_counter += 1
                self._load_ref(child, "include", own_prec)
            elif _is_xsl(child, "template"):
                if own_prec is None:
                    own_prec = self._prec_counter
                    self._prec_counter += 1
                match = child.get("match")
                name = child.get("name")
                mode = child.get("mode")
                if name:
                    self.named[name] = child
                if match:
                    self.templates.append((match, mode, child, own_prec))
                elif not name:
                    raise XsltUnsupported("template without match or name")
            elif _is_xsl(child, "key"):
                seen_decl = True
                kname = child.get("name")
                kmatch = (child.get("match") or "").strip()
                kuse = (child.get("use") or "").strip()
                if not kname or not kmatch or not kuse:
                    raise XsltUnsupported("xsl:key requires name, match and use")
                self._key_decls.setdefault(kname, []).append((kmatch, kuse))
            elif _is_xsl(child, "decimal-format"):
                seen_decl = True
                sym = dict(_DEFAULT_DF)
                for attr, val in child.attrib.items():
                    if attr == "name":
                        continue
                    key = _DF_ATTRS.get(attr)
                    if key is None:
                        raise XsltUnsupported(
                            f"xsl:decimal-format attribute {attr!r}"
                        )
                    sym[key] = val
                dfname = child.get("name", "")
                prev = self._decimal_formats.get(dfname)
                if prev is not None and prev != sym:
                    # §12.3: duplicate declarations must agree
                    raise XsltUnsupported(
                        f"conflicting xsl:decimal-format {dfname!r}"
                    )
                self._decimal_formats[dfname] = sym
            elif _is_xsl(child, "strip-space") or _is_xsl(child, "preserve-space"):
                seen_decl = True
                names = (child.get("elements") or "").split()
                if not names:
                    raise XsltUnsupported(
                        f"xsl:{_local(child.tag)} requires elements"
                    )
                target = (
                    self._strip_names
                    if _is_xsl(child, "strip-space")
                    else self._preserve_names
                )
                for n in names:
                    if ":" in n:
                        raise XsltUnsupported(
                            f"namespaced name test {n!r} in "
                            f"xsl:{_local(child.tag)}"
                        )
                    target.add(n)
            elif _is_xsl(child, "attribute-set"):
                seen_decl = True
                asname = child.get("name")
                if not asname:
                    raise XsltUnsupported("xsl:attribute-set requires a name")
                for a in child:
                    if not _is_xsl(a, "attribute"):
                        raise XsltUnsupported(
                            "xsl:attribute-set children must be xsl:attribute"
                        )
                self._attr_sets.setdefault(asname, []).append(child)
            elif _is_xsl(child, "variable") or _is_xsl(child, "param"):
                # top-level params use their defaults (no external
                # parameter API); evaluated at apply() against the doc
                seen_decl = True
                self._globals.append(child)
            elif _is_xsl(child, "output"):
                continue  # serialization is always unindented UTF-8 text
            elif (
                isinstance(child.tag, str)
                and child.tag.startswith("{")
                and not _is_xsl(child)
            ):
                # top-level data element in a non-XSL namespace: legal
                # (XSLT 1.0 §2.2), reachable via document(''). An
                # unknown XSL-namespace element still fails fast below.
                continue
            elif isinstance(child.tag, str):
                raise XsltUnsupported(f"top-level {child.tag!r}")
        self._sheet_roots.append(root)

    def _finish_compile(self) -> None:
        """Whole-stylesheet compile pass, run once after every imported/
        included sheet has loaded."""
        # ancestry is consulted by multi-step match patterns (a/b) and
        # by xsl:number level='single'; skip the per-document parent-map
        # pass when neither exists
        self._needs_parents = any(
            "/" in match and match != "/" for match, _, _, _ in self.templates
        ) or any(
            "/" in m
            for decls in self._key_decls.values()
            for m, _ in decls
        ) or any(
            _is_xsl(e, "number")
            for r in self._sheet_roots
            for e in r.iter()
            if isinstance(e.tag, str)
        )
        self._parents: dict = {}
        # Compile-time annotation of the STYLESHEET trees (static across
        # rows, while apply() runs per row): per-element xsl kind,
        # xsl:sort / xsl:with-param child lists, and whether a body
        # declares bindings — so the per-row executor does dict lookups
        # instead of re-classifying namespace strings for every node of
        # every document (measured +53% on q_xsl_execute without this).
        # match patterns stripped once; _split_path/_parse_step caches
        # make the per-node match loop allocation-free. Templates are
        # grouped by mode: apply-templates with mode="m" dispatches
        # ONLY against mode-m templates (XSLT 1.0 §5.7), and the
        # built-in rules carry the current mode through their descent.
        # Each rule carries its import precedence, compared FIRST.
        self._compiled_by_mode: dict[
            str | None, list[tuple[str, int, ET.Element]]
        ] = {}
        for m, mode, t, prec in self.templates:
            # 'a|b' alternation: each alternative is its own rule with
            # its own specificity, per XSLT 1.0 §5.3
            for alt in _split_union(m):
                self._compiled_by_mode.setdefault(mode, []).append((alt, prec, t))
        # default-priority-tie detection (judge-advice r10; widened to
        # every 0.5-vs-0.5 class in r13) needs the per-node
        # matched-candidate list ONLY in modes that could produce one:
        # an anchored pattern exists, or at least two statically
        # non-trivial patterns (multi-step / '//' / absolute /
        # predicated — the XSLT 1.0 §5.5 default-priority-0.5 class)
        # coexist — precomputed so the common plain-name stylesheet
        # pays nothing on the hot path
        self._mode_tracks_ties = {
            mode: (
                any(
                    p.startswith("/") and not p.startswith("//") and p != "/"
                    for p, _prec, _t in rules
                )
                or sum(1 for p, _prec, _t in rules if "/" in p or "[" in p)
                >= 2
            )
            for mode, rules in self._compiled_by_mode.items()
        }
        collide = self._strip_names & self._preserve_names
        if collide:
            # same-specificity conflict ('*' vs '*' or a direct name
            # tie); real XSLT resolves by import precedence/doc order —
            # out of subset, refuse rather than silently deviating
            # (judge-advice r10: the old preserve-wins name-tie rule
            # could diverge from a libxslt fast path)
            raise XsltUnsupported(
                "xsl:strip-space and xsl:preserve-space both declare "
                + ", ".join(sorted(collide))
            )
        # the MAIN sheet (loaded last) anchors document('')
        self._sty_root = self._sheet_roots[-1]
        # STYLESHEET-tree parent map (static across rows): without it,
        # anchored (/a/b) match patterns over document('') nodes would
        # see parentless elements and treat EVERY element of the sheet
        # as a root child — silent wrong answers in the
        # embedded-lookup-table idiom (code-review r10)
        self._sheet_parents = (
            {c: p for r in self._sheet_roots for p in r.iter() for c in p}
            if self._needs_parents
            else {}
        )
        self._kind: dict[int, str | None] = {}
        self._sorts: dict[int, tuple] = {}
        self._wparams: dict[int, tuple] = {}
        self._hasbind: dict[int, bool] = {}
        self._dynattrs: dict[int, tuple] = {}
        for elem in (e for r in self._sheet_roots for e in r.iter()):
            if not isinstance(elem.tag, str):
                self._kind[id(elem)] = "#comment"
                continue
            kind = _local(elem.tag) if _is_xsl(elem) else None
            if (
                kind == "copy-of"
                and (elem.get("select") or "").strip() == "@*"
            ):
                # <xsl:copy-of select="@*"/> directly inside an element
                # constructor copies the context node's attributes onto
                # the element being built — the identity-transform
                # idiom. Annotated as its own kind so _run_children
                # skips it (it is consumed by _element_markup) and a
                # stray use outside an element start fails fast.
                kind = "#attr-copy"
            self._kind[id(elem)] = kind
            self._sorts[id(elem)] = tuple(c for c in elem if _is_xsl(c, "sort"))
            self._wparams[id(elem)] = tuple(
                c for c in elem if _is_xsl(c, "with-param")
            )
            self._hasbind[id(elem)] = any(
                _is_xsl(c, "variable") or _is_xsl(c, "param") for c in elem
            )
            self._dynattrs[id(elem)] = tuple(
                c for c in elem if _is_xsl(c, "attribute")
            )
        # per-container instruction lists + per-element markup statics:
        # the stylesheet tree is immutable across rows, so everything
        # derivable from it alone (child kinds, whitespace-significant
        # text/tails, literal attributes without AVT expressions,
        # use-attribute-sets / attr-copy presence) compiles ONCE here
        # instead of being re-derived on every rendered node — ~25% of
        # apply() time at the q_xsl_execute row shape went to exactly
        # these re-derivations (profiled r13)
        self._ops: dict[int, tuple] = {}
        self._emeta: dict[int, tuple] = {}
        self._lattrs: dict[int, tuple] = {}
        for elem in (e for r in self._sheet_roots for e in r.iter()):
            if not isinstance(elem.tag, str):
                continue
            kind = self._kind.get(id(elem))
            use_sets = (
                elem.get("use-attribute-sets")
                if kind in ("element", "copy")
                else elem.get("{" + XSL_NS + "}use-attribute-sets")
            )
            has_copy = any(
                self._kind.get(id(c)) == "#attr-copy" for c in elem
            )
            self._emeta[id(elem)] = (use_sets, has_copy)
            if kind is None:
                # literal result element: pre-render the attribute
                # string when no value carries an AVT expression
                # namespaced literal result attributes are OUT OF
                # SUBSET: namespace serialization isn't implemented, so
                # the engine used to emit the raw ElementTree
                # '{uri}name' form on one path and _local(k) on the
                # attribute-set merge path — two different malformed
                # spellings of the same element (code-review r13).
                # Refuse at compile time rather than silently diverge.
                for k in elem.attrib:
                    if k.startswith("{") and not k.startswith(
                        "{" + XSL_NS + "}"
                    ):
                        raise XsltUnsupported(
                            f"namespaced literal result attribute {k!r}"
                            " — namespace serialization is out of subset"
                        )
                pairs = tuple(
                    (k, v)
                    for k, v in elem.attrib.items()
                    if not k.startswith("{" + XSL_NS + "}")
                )
                tag = _local(elem.tag)
                if all(
                    len(_avt_segments(v)) == 1
                    and _avt_segments(v)[0][0] == "lit"
                    for _k, v in pairs
                ):
                    static = "".join(
                        f" {k}={quoteattr(_avt_segments(v)[0][1])}"
                        for k, v in pairs
                    )
                    self._lattrs[id(elem)] = (tag, static, None)
                else:
                    self._lattrs[id(elem)] = (tag, None, pairs)
        # ops LAST: specializing a parent's child ops reads the
        # children's _emeta/_lattrs, and iter() is preorder
        for elem in (e for r in self._sheet_roots for e in r.iter()):
            self._ops[id(elem)] = self._compile_ops(elem)
        # r18 closure compilation: every static op list, select and test
        # expression becomes a bound closure once per stylesheet — the
        # per-row executor then runs closure bodies instead of tag-
        # dispatch chains (see the compiled-evaluators section below)
        self._sel_fns: dict[str, object] = {}
        self._test_fns: dict[str, object] = {}
        self._bind_fns: dict[int, object] = {}
        self._cfns: dict[int, tuple] = {}
        # REVERSE preorder: children compile before their parents, so a
        # parent's closures can FUSE a scope-free child body (its
        # closure list inlined, no _run_children re-entry)
        for root in self._sheet_roots:
            for elem in reversed(list(root.iter())):
                if isinstance(elem.tag, str):
                    self._cfns[id(elem)] = tuple(
                        self._compile_fn(op) for op in self._ops[id(elem)]
                    )
        # fast template dispatch (r18): in a mode whose every match
        # pattern is '/' or a plain element name, the winning template
        # per node is a static function of the node's tag alone (equal
        # default priorities resolve by import precedence then
        # declaration order, both known here) — one dict lookup replaces
        # the per-node _match_score loop. Modes with any structural
        # pattern (multi-step, predicate, wildcard, text()/node()) or
        # with tie tracking keep the scored path.
        self._fast_dispatch: dict = {}
        for mode, rules in self._compiled_by_mode.items():
            if self._mode_tracks_ties.get(mode, False):
                continue
            by_name: dict[str, tuple] = {}
            doc_rule = None
            ok = True
            for pattern, prec, telem in rules:
                if pattern == "/":
                    if doc_rule is None or prec >= doc_rule[0]:
                        doc_rule = (prec, telem)
                elif (
                    "/" not in pattern
                    and "[" not in pattern
                    and "(" not in pattern
                    and not pattern.startswith("@")
                    and pattern != "*"
                ):
                    cur = by_name.get(pattern)
                    if cur is None or prec >= cur[0]:
                        by_name[pattern] = (prec, telem)
                else:
                    ok = False
                    break
            if ok:
                self._fast_dispatch[mode] = (doc_rule, by_name)

    # op tags for the precompiled _run_children lists
    (_OP_TEXT, _OP_VAR, _OP_PARAM, _OP_NODE, _OP_BADCOPY, _OP_VALUEOF,
     _OP_IF, _OP_LITELEM, _OP_APPLYT, _OP_CHOOSE) = range(10)

    def _compile_ops(self, container: ET.Element) -> tuple:
        """Compile a container's children into a flat instruction list
        mirroring _run_children's dispatch — static text/tails are
        escaped here, consumed-by-parent children (sort / with-param /
        attribute / comments) are dropped, and a stray attr-copy keeps
        its RENDER-time failure (emitted as a raising op) so behavior
        matches the interpreted path exactly. The kinds that dominate
        row stylesheets (value-of, xsl:text, xsl:if, choose,
        apply-templates, literal elements with static attributes)
        specialize to dedicated ops with their static payloads
        extracted, skipping the generic _run_node dispatch; everything
        else stays on the generic (_OP_NODE) path."""
        ops: list[tuple] = []
        t = container.text
        if t and t.strip():
            ops.append((self._OP_TEXT, escape(t)))
        ckind = self._kind.get(id(container))
        for child in container:
            kind = self._kind.get(id(child), None)
            if kind is None:
                la = self._lattrs.get(id(child))
                if (
                    la is not None
                    and la[1] is not None
                    and self._emeta.get(id(child)) == (None, False)
                    and not self._dynattrs.get(id(child))
                ):
                    ops.append((self._OP_LITELEM, la[0], la[1], child))
                else:
                    ops.append((self._OP_NODE, child, None))
            elif kind == "value-of":
                ops.append((self._OP_VALUEOF, child.get("select", ".")))
            elif kind == "text":
                txt = escape(child.text or "")
                if txt:
                    ops.append((self._OP_TEXT, txt))
            elif kind == "if":
                ops.append((self._OP_IF, child.get("test", ""), child))
            elif kind == "choose":
                whens = tuple(
                    (b.get("test", ""), b)
                    for b in child
                    if _is_xsl(b, "when")
                )
                otherw = next(
                    (b for b in child if _is_xsl(b, "otherwise")), None
                )
                ops.append((self._OP_CHOOSE, whens, otherw))
            elif kind == "apply-templates":
                ops.append((
                    self._OP_APPLYT,
                    child.get("select"),
                    child.get("mode"),
                    child,
                    bool(self._sorts.get(id(child))),
                    bool(self._wparams.get(id(child))),
                ))
            elif kind == "variable":
                ops.append((self._OP_VAR, child))
            elif kind == "param":
                ops.append((self._OP_PARAM, child))
            elif kind in ("sort", "with-param", "attribute", "#comment"):
                pass  # consumed by the enclosing instruction/element
            elif kind == "#attr-copy":
                if ckind not in (None, "element", "copy"):
                    ops.append((self._OP_BADCOPY, child))
            else:
                ops.append((self._OP_NODE, child, kind))
            tl = child.tail
            if tl and tl.strip():
                ops.append((self._OP_TEXT, escape(tl)))
        return tuple(ops)

    def _compile_fn(self, op):
        """One op tuple -> fn(ctx) -> str (r18). Each closure is the
        exact body of the corresponding _run_children dispatch arm with
        its static payload pre-bound (and selects/tests pre-compiled),
        so the per-row loop never re-inspects op tags or re-plans
        expressions. Side-effecting ops (variable/param bindings)
        return ''."""

        def body(elem):
            """Runner for a nested instruction body: when the body
            declares no bindings (the common case), its already-
            compiled closure list is inlined — no _run_children
            re-entry, no scope push (identical semantics: the generic
            path skips the scope for binding-free bodies too).
            Requires children-first compilation order."""
            fns = self._cfns.get(id(elem))
            if fns is None or self._hasbind.get(id(elem), True):
                return lambda ctx, _e=elem: self._run_children(_e, ctx)
            if not fns:
                return lambda ctx: ""
            if len(fns) == 1:
                return fns[0]
            return lambda ctx, _f=fns: "".join(f(ctx) for f in _f)

        tag = op[0]
        if tag == self._OP_TEXT:
            return lambda ctx, _s=op[1]: _s
        if tag == self._OP_VALUEOF:
            sel = self._compile_select(op[1])

            def f_valueof(ctx, _s=sel):
                items = _s(ctx)
                return escape(_string(items[0])) if items else ""
            return f_valueof
        if tag == self._OP_LITELEM:
            sub = body(op[3])

            def f_lit(ctx, _t=op[1], _a=op[2], _b=sub):
                inner = _b(ctx)
                return (f"<{_t}{_a}>{inner}</{_t}>" if inner
                        else f"<{_t}{_a}/>")
            return f_lit
        if tag == self._OP_IF:
            tst = self._compile_test(op[1])
            sub = body(op[2])

            def f_if(ctx, _t=tst, _b=sub):
                return _b(ctx) if _t(ctx) else ""
            return f_if
        if tag == self._OP_CHOOSE:
            whens = tuple(
                (self._compile_test(t), body(b)) for t, b in op[1]
            )
            otherw = body(op[2]) if op[2] is not None else None

            def f_choose(ctx, _w=whens, _o=otherw):
                for t, br in _w:
                    if t(ctx):
                        return br(ctx)
                return _o(ctx) if _o is not None else ""
            return f_choose
        if tag == self._OP_APPLYT:
            _, sel, mode, elem2, has_sorts, has_wp = op
            selfn = self._compile_select(sel) if sel is not None else None
            if not has_sorts and not has_wp:
                def f_applyt(ctx, _s=selfn, _m=mode):
                    if _s is not None:
                        nodes = _s(ctx)
                    elif isinstance(ctx, ET.Element):
                        nodes = self._node_children(ctx)
                    elif isinstance(ctx, _Doc):
                        nodes = [ctx.root]
                    else:
                        nodes = []
                    return self._iterate(
                        nodes, lambda n: self._apply_one(n, None, _m)
                    )
                return f_applyt

            def f_applyt_full(ctx, _s=selfn, _m=mode, _e=elem2,
                              _hs=has_sorts, _hw=has_wp):
                if _s is not None:
                    nodes = _s(ctx)
                elif isinstance(ctx, ET.Element):
                    nodes = self._node_children(ctx)
                elif isinstance(ctx, _Doc):
                    nodes = [ctx.root]
                else:
                    nodes = []
                if _hs:
                    nodes = self._sorted_nodes(nodes, _e, ctx)
                tparams = (
                    (self._gather_params(_e, ctx) or None) if _hw else None
                )
                return self._iterate(
                    nodes,
                    lambda n, _p=tparams: self._apply_one(n, _p, _m),
                )
            return f_applyt_full
        if tag == self._OP_NODE:
            elem, kind = op[1], op[2]
            if kind == "for-each":
                sel = self._compile_select(elem.get("select", "."))
                has_sorts = bool(self._sorts.get(id(elem)))
                sub = body(elem)
                if not has_sorts and not self._needs_pos:
                    def f_foreach(ctx, _s=sel, _b=sub):
                        return "".join(_b(n) for n in _s(ctx))
                    return f_foreach

                def f_foreach_full(ctx, _s=sel, _e=elem, _b=sub,
                                   _hs=has_sorts):
                    nodes = _s(ctx)
                    if _hs:
                        nodes = self._sorted_nodes(nodes, _e, ctx)
                    return self._iterate(nodes, _b)
                return f_foreach_full
            if kind == "call-template":
                tname = elem.get("name", "")
                telem = self.named.get(tname)
                if telem is not None:
                    wps = tuple(
                        (wp.get("name", ""), self._compile_binding(wp))
                        for wp in self._wparams.get(id(elem), ())
                    )

                    def f_callt(ctx, _t=telem, _w=wps):
                        params = {n: f(ctx) for n, f in _w} or None
                        self._enter_template()
                        try:
                            return self._run_children(_t, ctx,
                                                      params=params)
                        finally:
                            self._tdepth -= 1
                    return f_callt
                # undeclared target: the interpreter raises when the
                # call RUNS — preserve that timing
                def f_callt_missing(ctx, _n=tname):
                    raise XsltUnsupported(
                        f"call to undeclared template {_n!r}"
                    )
                return f_callt_missing
            return lambda ctx, _e=elem, _k=kind: self._run_node(_e, ctx, _k)
        if tag == self._OP_VAR:
            bind = self._compile_binding(op[1])

            def f_var(ctx, _b=bind, _n=op[1].get("name", "")):
                self._scopes[-1][_n] = _b(ctx)
                return ""
            return f_var
        if tag == self._OP_PARAM:
            bind = self._compile_binding(op[1])

            def f_param(ctx, _b=bind, _n=op[1].get("name", "")):
                if _n not in self._scopes[-1]:
                    self._scopes[-1][_n] = _b(ctx)
                return ""
            return f_param

        def f_badcopy(ctx):
            raise XsltUnsupported(
                'copy-of select="@*" outside an element constructor'
            )
        return f_badcopy

    # -- whitespace stripping (xsl:strip-space / xsl:preserve-space) -------

    def _strips_name(self, name: str) -> bool:
        """Does xsl:strip-space apply to elements named ``name``? An
        explicit name beats '*' on either side; a direct name tie (and
        '*' vs '*') is refused at compile time, so the two name sets
        are disjoint here."""
        if name in self._preserve_names:
            return False
        if name in self._strip_names:
            return True
        return "*" in self._strip_names and "*" not in self._preserve_names

    def _apply_strip_space(self, root: ET.Element) -> None:
        """Drop whitespace-only text children of matched elements
        (XSLT 1.0 §3.4), honoring xml:space='preserve' inheritance.
        Runs once per parsed document, BEFORE the parent map is built,
        so match patterns / keys / xsl:number see the stripped tree."""
        if not self._strip_names:
            return
        xml_space = "{http://www.w3.org/XML/1998/namespace}space"
        stack: list[tuple[ET.Element, bool]] = [(root, False)]
        while stack:
            elem, preserve = stack.pop()
            xs = elem.get(xml_space)
            if xs == "preserve":
                preserve = True
            elif xs == "default":
                preserve = False
            if (
                not preserve
                and isinstance(elem.tag, str)
                and self._strips_name(_local(elem.tag))
            ):
                if elem.text is not None and not elem.text.strip():
                    elem.text = None
                for c in elem:
                    if c.tail is not None and not c.tail.strip():
                        c.tail = None
            for c in elem:
                if isinstance(c.tag, str):
                    stack.append((c, preserve))

    # -- public -----------------------------------------------------------

    def apply(self, xml: str) -> str:
        src_root = ET.fromstring(xml)
        self._apply_strip_space(src_root)
        if self._needs_parents:
            self._parents = {c: p for p in src_root.iter() for c in p}
            self._parents.update(self._ext_parents)
            self._parents.update(self._sheet_parents)
        self._tdepth = 0
        # (import precedence, mode, node) of the currently-executing
        # matched template — consumed by xsl:apply-imports
        self._tframes: list[tuple[int, str | None, object]] = []
        self._root = src_root
        # keyed by (id(doc_root), key name): §12.2 scopes key() to the
        # context node's document, so each document gets its own index
        self._key_index: dict[tuple[int, str], dict[str, list]] = {}
        self._doc_orders: dict[int, dict[int, int]] = {}
        self._doc_members: dict[int, set[int]] = {}
        self._doc_seqs: dict[int, int] = {}  # generate-id doc numbering
        doc = _Doc(src_root)
        self._scopes = [{}]
        self._ctx_pos: list[tuple[int, int]] = []
        for g in self._globals:
            self._scopes[0][g.get("name", "")] = self._eval_binding(g, doc)
        # template-dispatch depth is bounded at _MAX_TDEPTH below, but
        # a legitimate deep recursion still needs ~8 CPython frames per
        # template level — lift the interpreter limit once per process
        # (r18: the per-row raise/restore pair was two C calls per
        # apply; the raised limit is harmless to keep)
        _ensure_recursion_limit()
        return self._apply_to([doc])

    # -- template dispatch ------------------------------------------------

    # Guard counts TEMPLATE-BODY invocations only (matched templates and
    # call-template), not built-in-rule descent — built-in recursion
    # strictly consumes document children and terminates on its own, so
    # deep documents no longer trip the guard (ADVICE r5); a divergent
    # stylesheet must pass through a template body each cycle and still
    # fails fast.
    _MAX_TDEPTH = 256

    def _apply_to(self, nodes, mode: str | None = None) -> str:
        return "".join(self._apply_one(n, mode=mode) for n in nodes)

    def _enter_template(self):
        self._tdepth += 1
        if self._tdepth > self._MAX_TDEPTH:
            raise XsltUnsupported(
                f"template recursion deeper than {self._MAX_TDEPTH}"
            )

    def _apply_one(self, node, params: dict | None = None,
                   mode: str | None = None, max_prec: int | None = None) -> str:
        """Match-and-run the best template for ``node``. ``max_prec``
        (exclusive) restricts candidates to templates of LOWER import
        precedence — the xsl:apply-imports dispatch (XSLT 1.0 §5.6).
        Import precedence eliminates candidates before specificity
        (§2.6.2): the comparison key leads with prec."""
        fast = self._fast_dispatch.get(mode) if max_prec is None else None
        if fast is not None:
            doc_rule, by_name = fast
            if isinstance(node, ET.Element):
                hit = by_name.get(_local(node.tag))
            elif isinstance(node, str):
                return escape(node)  # no text()/node() rules in a fast mode
            else:  # _Doc
                hit = doc_rule
            if hit is not None:
                self._enter_template()
                self._tframes.append((hit[0], mode, node))
                try:
                    return self._run_children(hit[1], node, params=params)
                finally:
                    self._tframes.pop()
                    self._tdepth -= 1
            # built-in rules, carrying the mode
            if isinstance(node, _Doc):
                return self._apply_to([node.root], mode=mode)
            return self._apply_to(self._node_children(node), mode=mode)
        best = None
        track = self._mode_tracks_ties.get(mode, False)
        rules = self._compiled_by_mode.get(mode, ())
        matched: list[tuple[int, tuple, int]] = []
        for idx, (pattern, prec, telem) in enumerate(rules):
            if max_prec is not None and prec >= max_prec:
                continue
            score = self._match_score(pattern, node)
            if score is not None:
                if track:
                    matched.append((prec, score, idx))
                if best is None or (prec,) + score[:3] + (idx,) >= best[0]:
                    best = ((prec,) + score[:3] + (idx,), prec, telem, score)
        if best is not None and best[3][3] and len(matched) > 1:
            # The winner is an ANCHORED pattern whose +1 match-depth is
            # a house scoring bonus. XSLT 1.0 §5.5 gives EVERY
            # non-trivial pattern (absolute, multi-step, '//', or
            # predicated) the same default priority 0.5, resolved by
            # declaration order (libxslt picks the later) — so if an
            # UNANCHORED candidate of priority 0.5 at the same import
            # precedence ties the winner once the anchor bonus is
            # removed, the bonus alone decided: out of subset, refuse
            # rather than silently diverging from a libxslt fast path
            # (judge-advice r10). A bare QName candidate (priority 0,
            # e.g. 'r' vs '/r') is NOT a tie — the anchored win is the
            # spec outcome and passes through (code-review r11).
            d, n, s = best[3][:3]
            wprec = best[1]
            for mprec, msc, _midx in matched:
                if (
                    mprec == wprec
                    and not msc[3]
                    and msc[4]
                    and msc[:3] == (d - 1, n, s)
                    # union alternatives of the SAME template can't
                    # diverge: either way the identical template runs
                    # (code-review r13)
                    and rules[_midx][2] is not best[2]
                ):
                    raise XsltUnsupported(
                        "anchored and unanchored match patterns tie on "
                        "XSLT 1.0 default priority (0.5) for the same "
                        "node; conflict resolution is declaration-order "
                        "in libxslt — out of subset"
                    )
        if best is not None and best[3][4] and len(matched) > 1:
            # Widened 0.5-tie guard (ADVICE r12): the winner carries
            # XSLT 1.0 §5.5 default priority 0.5. If ANOTHER 0.5
            # candidate at the same import precedence matched this node
            # and was declared LATER, libxslt's recoverable-error rule
            # picks that later declaration while the house specificity
            # key picked the earlier one (an equal-key tie already goes
            # to the larger idx, so a surviving later candidate always
            # scored lower) — out of subset, refuse rather than
            # silently diverging. Covers unanchored-vs-unanchored and
            # anchored-vs-anchored classes the r10 anchored-only guard
            # below does not.
            widx, wprec = best[0][-1], best[1]
            for mprec, msc, midx in matched:
                # a later-declared alternative of the SAME template is
                # not a divergence — declaration-order resolution runs
                # the identical template (code-review r13)
                if (mprec == wprec and msc[4] and midx > widx
                        and rules[midx][2] is not best[2]):
                    raise XsltUnsupported(
                        "two match patterns share XSLT 1.0 default "
                        "priority (0.5) for the same node and the "
                        "later declaration is not the specificity "
                        "winner; conflict resolution is declaration-"
                        "order in libxslt — out of subset"
                    )
        if best is not None:
            self._enter_template()
            self._tframes.append((best[1], mode, node))
            try:
                return self._run_children(best[2], node, params=params)
            finally:
                self._tframes.pop()
                self._tdepth -= 1
        # built-in rules: recurse into children (carrying the current
        # mode, per XSLT 1.0 §5.8); copy text through
        if isinstance(node, str):
            return escape(node)
        if isinstance(node, _Doc):
            return self._apply_to([node.root], mode=mode)
        return self._apply_to(self._node_children(node), mode=mode)

    def _match_score(self, pattern: str, node):
        # patterns are compile-time constants; the parse caches resolve
        # to tuple lookups on the hot per-node path. Returns
        # (match depth incl. the +1 anchor bonus, predicate count,
        # specificity, anchored flag, spec-priority-0.5 flag) — the two
        # flags are NOT part of the ordering key; _apply_one uses them
        # to detect selections decided solely by the anchor bonus
        # against a pattern of EQUAL XSLT 1.0 default priority (0.5)
        # and refuse. A bare QName pattern has default priority 0 (not
        # 0.5), so anchored-beats-bare-name is the SPEC outcome, not a
        # deviation (code-review r11 corrected the r10 advice here).
        if pattern == "/":
            return (0, 0, 2, 0, 1) if isinstance(node, _Doc) else None
        if isinstance(node, (str, _Doc)):
            if isinstance(node, str) and pattern in ("text()", "node()"):
                return (0, 0, 0, 0, 0)
            return None
        # '/a/b' anchors at the document node; a LEADING '//' adds no
        # constraint (descendant-or-self from the root = anywhere), so
        # '//a' matches like plain 'a'
        anchored = pattern.startswith("/") and not pattern.startswith("//")
        steps = _split_path_marked(pattern)  # ((step, via-descendant), ...)
        if not steps:
            return None

        def walk(i: int, target) -> int | None:
            """Match steps[..i] with steps[i] at ``target``; returns the
            total predicate count of the matched chain or None. A step
            reached via '//' may bind its left neighbor to ANY proper
            ancestor — the while loop backtracks up the chain."""
            step, via_desc = steps[i]
            name, preds = _parse_step(step)
            if name == "text()":
                return None  # element node can't match a text step
            if name not in ("*", "node()") and _local(target.tag) != name:
                return None
            if preds and not all(self._test(target, p) for p in preds):
                return None
            n = len(preds)
            if i == 0:
                if anchored and self._parents.get(target) is not None:
                    return None  # '/x/...': x must sit under the root
                return n
            p = self._parents.get(target)
            while p is not None:
                sub = walk(i - 1, p)
                if sub is not None:
                    return n + sub
                if not via_desc:
                    return None  # '/' separator: exactly the parent
                p = self._parents.get(p)
            return None

        n_preds = walk(len(steps) - 1, node)
        if n_preds is None:
            return None
        name0, _ = _parse_step(steps[-1][0])
        # three specificity levels mirroring XSLT 1.0 default priorities:
        # name test (0) > '*' (-0.25) > 'node()' (-0.5) — judge-advice r7:
        # scoring node() == '*' let declaration order decide where
        # libxslt (the lxml fast path) always prefers '*'
        spec = 0 if name0 == "node()" else (1 if name0 == "*" else 2)
        # XSLT 1.0 §5.5: anything beyond a single plain node test —
        # absolute, multi-step, '//'-reached, or predicated — has
        # default priority 0.5; only those can TIE an anchored pattern
        spec_half = (
            anchored
            or len(steps) > 1
            or steps[0][1]
            or n_preds > 0
        )
        # the root anchor counts as a step of structural depth
        return (
            len(steps) - 1 + (1 if anchored else 0),
            n_preds,
            spec,
            1 if anchored else 0,
            1 if spec_half else 0,
        )

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

    def _eval_binding(self, elem: ET.Element, ctx):
        """Value of an xsl:variable / xsl:param / xsl:with-param: the
        ``select`` expression — a quoted-string or numeric literal, or
        a path's string-value — or the body as a result-tree fragment."""
        sel = elem.get("select")
        if sel is not None:
            sel = sel.strip()
            if len(sel) >= 2 and sel[0] == "'" and sel[-1] == "'":
                return sel[1:-1]
            if _literal(sel) is not None:
                return sel  # numeric literal: keep its lexical form
            items = self._select(ctx, sel)
            return _string(items[0]) if items else ""
        return _RTF(self._run_children(elem, ctx))

    def _lookup_var(self, name: str):
        for scope in reversed(self._scopes):
            if name in scope:
                return scope[name]
        raise XsltUnsupported(f"reference to undeclared variable ${name}")

    def _run_children(self, container: ET.Element, ctx,
                      params: dict | None = None) -> str:
        # scope push only when this body can bind anything — the common
        # body (pure output instructions) skips the stack churn
        scoped = params is not None or self._hasbind.get(id(container), True)
        if scoped:
            self._scopes.append(dict(params) if params else {})
        try:
            # compiled path (r18): every stylesheet-tree container has a
            # closure list; run it directly
            fns = self._cfns.get(id(container))
            if fns is not None:
                if len(fns) == 1:
                    return fns[0](ctx)
                return "".join(f(ctx) for f in fns)
            ops = self._ops.get(id(container))
            if ops is None:
                # element outside the compiled sheet trees — compute
                # WITHOUT memoizing: id() of a dead temporary can be
                # reused by a different element, so caching by id is
                # only sound for the immortal stylesheet nodes
                ops = self._compile_ops(container)
            frags: list[str] = []
            run_node = self._run_node
            select = self._select
            # local bindings of the named opcodes: the dispatcher must
            # track _compile_ops through any reorder of the constants
            _OP_TEXT, _OP_VAR, _OP_PARAM, _OP_NODE, _OP_BADCOPY = (
                self._OP_TEXT, self._OP_VAR, self._OP_PARAM,
                self._OP_NODE, self._OP_BADCOPY)
            _OP_VALUEOF, _OP_IF, _OP_LITELEM, _OP_APPLYT, _OP_CHOOSE = (
                self._OP_VALUEOF, self._OP_IF, self._OP_LITELEM,
                self._OP_APPLYT, self._OP_CHOOSE)
            for op in ops:
                tag = op[0]
                if tag == _OP_VALUEOF:
                    items = select(ctx, op[1])
                    if items:
                        frags.append(escape(_string(items[0])))
                elif tag == _OP_LITELEM:  # static attrs, no dynattrs
                    inner = self._run_children(op[3], ctx)
                    t, a = op[1], op[2]
                    frags.append(
                        f"<{t}{a}>{inner}</{t}>" if inner else f"<{t}{a}/>"
                    )
                elif tag == _OP_TEXT:
                    frags.append(op[1])
                elif tag == _OP_APPLYT:
                    _, sel, mode, elem2, has_sorts, has_wp = op
                    if sel is not None:
                        nodes = select(ctx, sel)
                    elif isinstance(ctx, _Doc):
                        nodes = [ctx.root]
                    elif isinstance(ctx, ET.Element):
                        nodes = self._node_children(ctx)
                    else:
                        nodes = []
                    if has_sorts:
                        nodes = self._sorted_nodes(nodes, elem2, ctx)
                    # tparams, not params: rebinding the function
                    # parameter would shadow the caller's with-param
                    # dict for the rest of the loop (code-review r13)
                    tparams = (
                        (self._gather_params(elem2, ctx) or None)
                        if has_wp else None
                    )
                    frags.append(self._iterate(
                        nodes,
                        lambda n, _p=tparams, _m=mode: self._apply_one(n, _p, _m),
                    ))
                elif tag == _OP_IF:
                    if self._test(ctx, op[1]):
                        frags.append(self._run_children(op[2], ctx))
                elif tag == _OP_CHOOSE:
                    for tst, br in op[1]:
                        if self._test(ctx, tst):
                            frags.append(self._run_children(br, ctx))
                            break
                    else:
                        if op[2] is not None:
                            frags.append(self._run_children(op[2], ctx))
                elif tag == _OP_NODE:  # generic dispatch
                    frags.append(run_node(op[1], ctx, op[2]))
                elif tag == _OP_VAR:
                    self._scopes[-1][op[1].get("name", "")] = (
                        self._eval_binding(op[1], ctx)
                    )
                elif tag == _OP_PARAM:
                    pname = op[1].get("name", "")
                    if pname not in self._scopes[-1]:  # with-param wins
                        self._scopes[-1][pname] = self._eval_binding(op[1], ctx)
                else:  # _OP_BADCOPY: attr-copy outside an element
                    # constructor — no element to attach to; fail fast
                    raise XsltUnsupported(
                        'copy-of select="@*" outside an element constructor'
                    )
            return "".join(frags)
        finally:
            if scoped:
                self._scopes.pop()

    def _gather_params(self, elem: ET.Element, ctx) -> dict:
        # with-param elements are sheet-static -> compiled bindings
        return {
            wp.get("name", ""): self._compile_binding(wp)(ctx)
            for wp in self._wparams.get(id(elem), ())
        }

    def _sorted_nodes(self, nodes: list, elem: ET.Element, ctx) -> list:
        """Apply the instruction's xsl:sort keys (stable multi-key:
        last key first). Unparseable number keys sort first ascending."""
        sorts = self._sorts.get(id(elem), ())
        for s in reversed(sorts):
            sel = s.get("select", ".")
            numeric = s.get("data-type", "text") == "number"
            reverse = s.get("order", "ascending") == "descending"
            sfn = self._compile_select(sel)  # sort selects are static

            def key(n, _s=sfn, _num=numeric):
                items = _s(n)
                v = _string(items[0]) if items else ""
                if _num:
                    try:
                        return float(v)
                    except ValueError:
                        return float("-inf")
                return v

            nodes = sorted(nodes, key=key, reverse=reverse)
        return nodes

    def _serialize(self, item) -> str:
        """copy-of rendering: elements as markup, text/attrs escaped."""
        if isinstance(item, str):
            return escape(item)
        if isinstance(item, _RTF):
            return item.markup
        if isinstance(item, _Doc):
            return self._serialize(item.root)
        attrs = "".join(
            f" {_local(k)}={quoteattr(v)}" for k, v in item.attrib.items()
        )
        inner = (escape(item.text) if item.text else "") + "".join(
            self._serialize(c) + (escape(c.tail) if c.tail else "")
            for c in item
        )
        tag = _local(item.tag)
        return f"<{tag}{attrs}>{inner}</{tag}>" if inner else f"<{tag}{attrs}/>"

    def _run_node(self, elem: ET.Element, ctx, kind=_MISSING) -> str:
        name = self._kind.get(id(elem)) if kind is _MISSING else kind
        if name == "#comment":  # comments / PIs in the stylesheet
            return ""
        if name is not None:
            if name == "value-of":
                items = self._select(ctx, elem.get("select", "."))
                return escape(_string(items[0])) if items else ""
            if name == "copy-of":
                items = self._select(ctx, elem.get("select", "."))
                return "".join(self._serialize(it) for it in items)
            if name == "for-each":
                nodes = self._sorted_nodes(
                    self._select(ctx, elem.get("select", ".")), elem, ctx
                )
                return self._iterate(nodes, lambda n: self._run_children(elem, n))
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
                nodes = self._sorted_nodes(nodes, elem, ctx)
                params = self._gather_params(elem, ctx)
                mode = elem.get("mode")
                return self._iterate(
                    nodes, lambda n: self._apply_one(n, params or None, mode)
                )
            if name == "call-template":
                tname = elem.get("name", "")
                telem = self.named.get(tname)
                if telem is None:
                    raise XsltUnsupported(f"call to undeclared template {tname!r}")
                params = self._gather_params(elem, ctx)
                self._enter_template()
                try:
                    return self._run_children(telem, ctx, params=params or None)
                finally:
                    self._tdepth -= 1
            if name == "apply-imports":
                if not self._tframes:
                    raise XsltUnsupported(
                        "xsl:apply-imports outside a matched template"
                    )
                cur_prec, cur_mode, _ = self._tframes[-1]
                return self._apply_one(ctx, mode=cur_mode, max_prec=cur_prec)
            if name == "number":
                return self._xsl_number(elem, ctx)
            if name == "text":
                return escape(elem.text or "")
            if name == "element":
                tag = self._avt(elem.get("name", ""), ctx)
                return self._element_markup(tag, elem, ctx, "")
            if name == "copy":
                # shallow copy of the context node (XSLT 1.0 §7.5):
                # elements copy the tag but NOT attributes (xsl:attribute
                # children of the body add them); text copies through;
                # the document node just runs the body
                if isinstance(ctx, str):
                    return escape(ctx)
                if isinstance(ctx, (_Doc, _RTF)):
                    return self._run_children(elem, ctx)
                return self._element_markup(_local(ctx.tag), elem, ctx, "")
            raise XsltUnsupported(f"xsl:{name}")
        # literal result element; XSL-namespaced attributes
        # (xsl:use-attribute-sets) are instructions, not output
        la = self._lattrs.get(id(elem))
        if la is None:  # element outside the compiled sheet trees
            attrs = "".join(
                f" {k}={quoteattr(self._avt(v, ctx))}"
                for k, v in elem.attrib.items()
                if not k.startswith("{" + XSL_NS + "}")
            )
            return self._element_markup(_local(elem.tag), elem, ctx, attrs)
        tag, static, pairs = la
        if static is None:
            static = "".join(
                f" {k}={quoteattr(self._avt(v, ctx))}" for k, v in pairs
            )
        return self._element_markup(tag, elem, ctx, static)

    def _iterate(self, nodes: list, render) -> str:
        """Run ``render`` per node with (position, last) context pushed,
        so position()/last() see the iteration per XSLT 1.0."""
        if not self._needs_pos:
            return "".join(render(n) for n in nodes)
        size = len(nodes)
        parts: list[str] = []
        for i, n in enumerate(nodes, 1):
            self._ctx_pos.append((i, size))
            try:
                parts.append(render(n))
            finally:
                self._ctx_pos.pop()
        return "".join(parts)

    def _attrset_attrs(self, names: str, ctx,
                       seen: frozenset = frozenset()) -> dict[str, str]:
        """Evaluate the named xsl:attribute-sets (whitespace-separated
        use-attribute-sets value) against ``ctx``. Same-named
        declarations merge in load order (imported sheets load first,
        so later-wins implements import precedence, as for named
        templates); a set's own use-attribute-sets contributes FIRST
        (§7.1.4 — its attributes are overridden by the set's own)."""
        out: dict[str, str] = {}
        for name in names.split():
            if name in seen:
                raise XsltUnsupported(
                    f"xsl:attribute-set cycle through {name!r}"
                )
            decls = self._attr_sets.get(name)
            if decls is None:
                raise XsltUnsupported(
                    f"use of undeclared xsl:attribute-set {name!r}"
                )
            for d in decls:
                nested = d.get("use-attribute-sets")
                if nested:
                    out.update(
                        self._attrset_attrs(nested, ctx, seen | {name})
                    )
                for a in d:
                    out[self._avt(a.get("name", ""), ctx)] = _RTF(
                        self._run_children(a, ctx)
                    ).text()
        return out

    def _element_markup(self, tag: str, elem: ET.Element, ctx,
                        static_attrs: str) -> str:
        """Render an element (literal or xsl:element): direct
        xsl:attribute children contribute dynamic attributes (AVT name,
        body string-value), a direct copy-of select="@*" child copies
        the context node's attributes (identity-transform idiom), and
        use-attribute-sets (attribute on xsl:element/xsl:copy,
        xsl:use-attribute-sets on a literal result element) splices
        named attribute sets in at the LOWEST precedence; the body
        renders with those skipped. Later additions replace earlier
        ones per XSLT 1.0 §7.1.3/§7.1.4: attribute sets, then literal
        attrs, then copied, then xsl:attribute."""
        kind = self._kind.get(id(elem))
        meta = self._emeta.get(id(elem))
        if meta is None:
            # element outside the compiled sheet trees — no memoizing
            # (id() reuse hazard; see _run_children)
            meta = (
                elem.get("use-attribute-sets")
                if kind in ("element", "copy")
                else elem.get("{" + XSL_NS + "}use-attribute-sets"),
                any(self._kind.get(id(c)) == "#attr-copy" for c in elem),
            )
        use_sets, has_copy = meta
        if has_copy or use_sets:
            merged: dict[str, str] = {}
            if use_sets:
                merged.update(self._attrset_attrs(use_sets, ctx))
            if kind is None:  # literal result element
                for k, v in elem.attrib.items():
                    if k.startswith("{" + XSL_NS + "}"):
                        continue
                    merged[_local(k)] = self._avt(v, ctx)
            if has_copy and isinstance(ctx, ET.Element):
                for k, v in ctx.attrib.items():
                    merged[_local(k)] = v
            for a in self._dynattrs.get(id(elem), ()):
                merged[self._avt(a.get("name", ""), ctx)] = _RTF(
                    self._run_children(a, ctx)
                ).text()
            attrs = "".join(f" {k}={quoteattr(v)}" for k, v in merged.items())
        else:
            dyn = "".join(
                f" {self._avt(a.get('name', ''), ctx)}="
                + quoteattr(_RTF(self._run_children(a, ctx)).text())
                for a in self._dynattrs.get(id(elem), ())
            )
            attrs = static_attrs + dyn
        inner = self._run_children(elem, ctx)
        return f"<{tag}{attrs}>{inner}</{tag}>" if inner else f"<{tag}{attrs}/>"

    def _avt(self, value: str, ctx) -> str:
        segs = _avt_segments(value)
        if len(segs) == 1 and segs[0][0] == "lit":
            return segs[0][1]
        out: list[str] = []
        for kind, payload in segs:
            if kind == "lit":
                out.append(payload)
            else:
                items = self._select(ctx, payload)
                if items:
                    out.append(_string(items[0]))
        return "".join(out)

    # -- keys --------------------------------------------------------------

    def _containing_root(self, ctx) -> "ET.Element":
        """The root of the document containing ``ctx`` — XSLT 1.0 §12.2
        scopes key() to the context node's document, so a key() call
        while iterating a document()-loaded tree must index THAT tree,
        not the source (judge-advice r7). Membership sets are built
        lazily per known root; non-node contexts fall back to the
        source document."""
        if isinstance(ctx, _Doc):
            return ctx.root
        if not isinstance(ctx, ET.Element):
            return self._root
        cid = id(ctx)
        roots = [self._root, self._sty_root] + [
            d.root for d in self._ext_docs.values()
        ]
        for root in roots:
            members = self._doc_members.get(id(root))
            if members is None:
                members = {id(e) for e in root.iter()}
                self._doc_members[id(root)] = members
            if cid in members:
                return root
        raise XsltUnsupported("key(): context node not in a known document")

    def _build_key(self, name: str, root: "ET.Element") -> dict[str, list]:
        """Lazily index ONE document for one xsl:key: walk every
        element once, test it against each declaration's match pattern,
        and file it under the string-value(s) of the use expression
        (one entry per node when use selects a node-set, per XSLT 1.0
        §12.2). Built once per (document, key) — O(doc); every key()
        call afterwards is a dict lookup, which is the whole point of
        keys vs re-scanning predicates."""
        decls = self._key_decls.get(name)
        if decls is None:
            raise XsltUnsupported(f"key() with undeclared key {name!r}")
        index: dict[str, list] = {}
        if id(root) not in self._doc_orders:
            self._doc_orders[id(root)] = {
                id(e): i for i, e in enumerate(root.iter())
            }
        for elem in root.iter():
            for kmatch, kuse in decls:
                # 'a|b' alternation in key match patterns, same as
                # template rules (code-review r7: the un-split pattern
                # silently matched nothing)
                if all(
                    self._match_score(alt, elem) is None
                    for alt in _split_union(kmatch)
                ):
                    continue
                # EVERY matching declaration files the node (XSLT 1.0
                # §12.2 unions declarations; no first-match-wins here)
                for item in self._select(elem, kuse):
                    vals = index.setdefault(_string(item), [])
                    if not vals or vals[-1] is not elem:
                        vals.append(elem)
        return index

    def _document(self, inner: str, ctx=None) -> "_Doc":
        """document(uri[, node-set]): the external XML document at
        ``uri``; document('') is the stylesheet itself (XSLT 1.0 §12.1
        — the embedded-lookup-table idiom). A relative uri resolves
        against base_dir, or — 2-arg form — against the base of the
        document containing the node-set's first node (so a document
        loaded from a subdirectory can chain relative references).
        Only string-literal URIs are in the subset; parsed once per
        resolved path, cached, whitespace-stripped like the source."""
        import os

        args = _split_args(inner)
        if len(args) not in (1, 2):
            raise XsltUnsupported("document() takes (uri[, node-set])")
        uri = _literal(args[0].strip())
        if not isinstance(uri, str):
            raise XsltUnsupported("document() URI must be a string literal")
        if uri == "":
            return _Doc(self._sty_root)
        base = self.base_dir
        if len(args) == 2:
            items = self._select(ctx, args[1].strip())
            if not items:
                raise XsltUnsupported(
                    "document() second argument selected no nodes"
                )
            root = self._containing_root(items[0])
            # the source and stylesheet documents resolve against
            # base_dir structurally — only document()-loaded trees own
            # a _doc_base entry (their roots live in _ext_docs for the
            # compiled sheet's lifetime, so the id keys stay valid;
            # keying per-apply src roots would leak and risk recycled
            # ids — code-review r10)
            if root is self._root or root is self._sty_root:
                base = self.base_dir
            else:
                base = self._doc_base.get(id(root))
        if base is None:
            raise XsltUnsupported(
                f"document({uri!r}): no base_dir to resolve against"
            )
        full = os.path.normpath(os.path.join(base, uri))
        if full in self._ext_docs:
            return self._ext_docs[full]
        root = ET.parse(full).getroot()
        self._apply_strip_space(root)
        doc = _Doc(root)
        self._ext_docs[full] = doc
        self._doc_base[id(root)] = os.path.dirname(full)
        if self._needs_parents:
            ext = {c: p for p in root.iter() for c in p}
            self._ext_parents.update(ext)
            self._parents.update(ext)
        return doc

    def _key_lookup(self, inner: str, ctx) -> list:
        args = _split_args(inner)
        if len(args) != 2:
            raise XsltUnsupported(f"key() takes 2 arguments, got {len(args)}")
        kname = _literal(args[0].strip())
        if not isinstance(kname, str):
            raise XsltUnsupported("key() name must be a string literal")
        doc_root = self._containing_root(ctx)
        ikey = (id(doc_root), kname)
        if ikey not in self._key_index:
            self._key_index[ikey] = self._build_key(kname, doc_root)
        index = self._key_index[ikey]
        arg = args[1].strip()
        lit = _literal(arg)
        if lit is not None:
            if isinstance(lit, str):
                values = [lit]
            else:  # numeric literal: XPath number->string form
                values = [str(int(lit)) if lit.is_integer() else str(lit)]
        else:
            values = [_string(it) for it in self._select(ctx, arg)]
        hits: list = []
        seen: set[int] = set()
        for v in values:
            for node in index.get(v, ()):
                if id(node) not in seen:
                    seen.add(id(node))
                    hits.append(node)
        # union in document order, as XPath node-sets require
        hits.sort(key=lambda n: self._doc_orders[id(doc_root)][id(n)])
        return hits

    # -- path / test evaluation -------------------------------------------

    # -- compiled evaluators (r18) ------------------------------------------
    #
    # Selects, tests and instruction lists are stylesheet-static while
    # apply() runs per row: the _select_plan/_test_plan caches already
    # removed the string PARSING, but every evaluation still re-entered
    # the generic dispatchers (plan-tag branch chains in _select/_test,
    # the op-tag loop in _run_children, the per-rule _match_score loop
    # in _apply_one). These compilers turn each static expression into
    # a bound Python closure ONCE per stylesheet, so the per-row cost
    # is the closure body alone. Semantics are identical by
    # construction: every closure is a specialization of the exact
    # branch the generic evaluator would have taken, and anything
    # outside the specialized shapes falls back to the generic path.

    def _compile_select(self, path: str):
        """path -> fn(ctx) -> list, memoized per stylesheet."""
        fn = self._sel_fns.get(path)
        if fn is not None:
            return fn
        tag, payload, p = _select_plan(path)
        if tag == 0:  # '.'
            def fn(ctx):
                return [ctx]
        elif tag == 3:  # bare @attr
            def fn(ctx, _a=payload):
                if isinstance(ctx, ET.Element):
                    v = ctx.attrib.get(_a)
                    return [v] if v is not None else []
                return []
        elif tag == 4:  # bare element name
            def fn(ctx, _n=p):
                if isinstance(ctx, ET.Element):
                    return [c for c in ctx if _local(c.tag) == _n]
                if isinstance(ctx, _Doc):
                    return [ctx.root] if _local(ctx.root.tag) == _n else []
                return []
        elif tag == 5 and "/" not in payload and "[" not in payload:
            def fn(ctx, _n=payload):
                return [self._lookup_var(_n)]
        else:
            fn = None
            if tag in (2, 6) and p.startswith("key("):
                fn = self._compile_key_select(p)
            if fn is None and tag == 6 and not p.startswith(
                ("/", "key(", "document(")
            ):
                # single child-name step with static predicates (the
                # common predicated select, e.g. v[@key=$k]): compile
                # the predicate tests and run the step inline. Any
                # positional predicate or structural step falls back.
                try:
                    steps = _path_steps(p)
                except XsltUnsupported:
                    steps = None
                if steps is not None and len(steps) == 1:
                    name, preds, desc = steps[0]
                    if (
                        not desc
                        and "(" not in name
                        and name not in (".", "*")
                        and not name.startswith("@")
                    ):
                        pks = [_pred_kind(x) for x in preds]
                        if all(k[0] in ("plain", "index", "last")
                               for k in pks):
                            plan = tuple(
                                ("plain", self._compile_test(k[1]))
                                if k[0] == "plain"
                                else (k[0], k[1] if k[0] == "index" else None)
                                for k in pks
                            )

                            def fn(ctx, _n=name, _plan=plan):
                                if isinstance(ctx, ET.Element):
                                    cand = [
                                        c for c in ctx
                                        if _local(c.tag) == _n
                                    ]
                                elif isinstance(ctx, _Doc):
                                    r = ctx.root
                                    cand = (
                                        [r] if _local(r.tag) == _n else []
                                    )
                                else:
                                    return []
                                for kind, payload2 in _plan:
                                    if kind == "plain":
                                        cand = [
                                            c for c in cand if payload2(c)
                                        ]
                                    elif kind == "index":
                                        k = payload2
                                        cand = (
                                            [cand[k - 1]]
                                            if 0 < k <= len(cand)
                                            else []
                                        )
                                    else:  # last()
                                        cand = cand[-1:]
                                return cand
            if fn is None:
                def fn(ctx, _p=path):
                    return self._select(ctx, _p)
        self._sel_fns[path] = fn
        return fn

    def _compile_key_select(self, p: str):
        """Specialize ``key('name', value)`` and
        ``key('name', value)/child`` selects: the name literal, the
        value select and the optional single trailing child step are
        static. Returns None (caller falls back to the generic path)
        for any other shape. The per-call work left is the index lookup
        plus the trailing child filter; the document-order sort only
        runs when a lookup actually returns multiple nodes."""
        open_at = p.index("(")
        try:
            end = _close_paren(p, open_at)
        except XsltUnsupported:
            return None
        inner, rest = p[open_at + 1 : end], p[end + 1 :]
        args = _split_args(inner)
        if len(args) != 2:
            return None
        kname = _literal(args[0].strip())
        if not isinstance(kname, str):
            return None
        arg = args[1].strip()
        lit = _literal(arg)
        if lit is not None:
            if isinstance(lit, str):
                static_vals = [lit]
            else:
                static_vals = [
                    str(int(lit)) if lit.is_integer() else str(lit)
                ]

            def values_fn(ctx, _v=static_vals):
                return _v
        else:
            vsel = self._compile_select(arg)

            def values_fn(ctx, _s=vsel):
                return [_string(it) for it in _s(ctx)]
        step_name = None
        if rest:
            if not rest.startswith("/"):
                return None
            step = rest[1:]
            if (
                not step
                or "/" in step
                or "[" in step
                or "(" in step
                or step in (".", "*")
                or step.startswith("@")
            ):
                return None
            step_name = step

        def fn(ctx, _k=kname, _vals=values_fn, _step=step_name):
            doc_root = self._containing_root(ctx)
            ikey = (id(doc_root), _k)
            index = self._key_index.get(ikey)
            if index is None:
                index = self._key_index[ikey] = self._build_key(
                    _k, doc_root
                )
            hits: list = []
            seen: set[int] = set()
            for v in _vals(ctx):
                for node in index.get(v, ()):
                    if id(node) not in seen:
                        seen.add(id(node))
                        hits.append(node)
            if len(hits) > 1:
                # union in document order, as XPath node-sets require
                order = self._doc_orders[id(doc_root)]
                hits.sort(key=lambda n: order[id(n)])
            if _step is None:
                return hits
            out: list = []
            for h in hits:
                out.extend(c for c in h if _local(c.tag) == _step)
            return out
        return fn

    def _compile_binding(self, elem: ET.Element):
        """xsl:variable/param/with-param -> fn(ctx) -> value, memoized
        per element — the static classification of _eval_binding
        (quoted literal / numeric literal / select path / body RTF)
        done once."""
        fn = self._bind_fns.get(id(elem))
        if fn is not None:
            return fn
        sel = elem.get("select")
        if sel is not None:
            sel = sel.strip()
            if len(sel) >= 2 and sel[0] == "'" and sel[-1] == "'":
                v = sel[1:-1]
                fn = lambda ctx, _v=v: _v  # noqa: E731
            elif _literal(sel) is not None:
                fn = lambda ctx, _v=sel: _v  # noqa: E731 (lexical form)
            else:
                sfn = self._compile_select(sel)

                def fn(ctx, _s=sfn):
                    items = _s(ctx)
                    return _string(items[0]) if items else ""
        else:
            def fn(ctx, _e=elem):
                return _RTF(self._run_children(_e, ctx))
        self._bind_fns[id(elem)] = fn
        return fn

    def _compile_test(self, expr: str):
        """test expression -> fn(ctx) -> bool, memoized. Mirrors _test
        branch for branch; the comparison kinds whose operand shapes
        are static (literal / $var / path) specialize, everything else
        delegates to the interpreted _test. An XsltUnsupported raised
        while SPECIALIZING is deferred to evaluation time — the
        interpreter only rejects an unsupported expression when it
        actually runs, and a compiled stylesheet must behave the same."""
        fn = self._test_fns.get(expr)
        if fn is not None:
            return fn
        try:
            fn = self._compile_test_inner(expr)
        except XsltUnsupported as exc:
            def fn(ctx, _e=exc):
                raise _e
        self._test_fns[expr] = fn
        return fn

    def _compile_test_inner(self, expr: str):
        kind, payload = _test_plan(expr)
        if kind == 0:
            def fn(ctx):
                return False
        elif kind == 1:
            subs = tuple(self._compile_test(p) for p in payload)

            def fn(ctx, _s=subs):
                return any(f(ctx) for f in _s)
        elif kind == 2:
            subs = tuple(self._compile_test(p) for p in payload)

            def fn(ctx, _s=subs):
                return all(f(ctx) for f in _s)
        elif kind == 3:
            fn = self._compile_test(payload)
        elif kind == 4:
            sub = self._compile_test(payload)

            def fn(ctx, _s=sub):
                return not _s(ctx)
        elif kind == 5:
            sel = self._compile_select(payload)

            def fn(ctx, _s=sel):
                items = _s(ctx)
                if len(items) == 1 and isinstance(items[0], bool):
                    return items[0]
                return bool(items)
        else:
            fn = self._compile_comparison(expr, payload)
        return fn

    def _compile_comparison(self, expr: str, payload):
        """kind-6 (comparison) specialization of _test. The operand
        handling — literal-first swap, $var-as-number coercion,
        node-set-vs-node-set sets — replays _test exactly, with the
        static decisions (is the rhs a literal? a $var? a path?) made
        once here."""
        lhs, op, rhs = payload

        def run_compare(values, rhs_lit, _op):
            if isinstance(rhs_lit, float):
                nums = []
                for v in values:
                    try:
                        nums.append(float(v))
                    except ValueError:
                        pass
                values = nums
            if _op == "=":
                return any(v == rhs_lit for v in values)
            if _op == "!=":
                return any(v != rhs_lit for v in values)
            if not isinstance(rhs_lit, float):
                raise XsltUnsupported(
                    f"ordered comparison with string literal {expr!r}"
                )
            return any(
                (_op == "<" and v < rhs_lit)
                or (_op == "<=" and v <= rhs_lit)
                or (_op == ">" and v > rhs_lit)
                or (_op == ">=" and v >= rhs_lit)
                for v in values
            )

        def side(tok):
            """('lit', value) | ('var', name) | ('path', select_fn) —
            mirrors operand_literal's classification, made static."""
            if tok.startswith("$"):
                return ("var", tok[1:])
            lit = _literal(tok)
            if lit is not None:
                return ("lit", lit)
            return ("path", tok)

        rkind, rval = side(rhs)
        if rkind == "path":
            # literal-first spelling: swap operands and mirror the
            # ordered operator (code-review r7)
            lhs, rhs = rhs, lhs
            op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(op, op)
            rkind, rval = side(rhs)
            if rkind == "path":
                # node-set vs node-set (XPath 1.0 §3.4)
                if op not in ("=", "!="):
                    raise XsltUnsupported(
                        f"ordered path-to-path comparison {expr!r}"
                    )
                lsel = self._compile_select(lhs)
                rsel = self._compile_select(rhs)

                def fn(ctx, _l=lsel, _r=rsel, _op=op):
                    lvals = {_string(v) for v in _l(ctx)}
                    rvals = {_string(v) for v in _r(ctx)}
                    if _op == "=":
                        return bool(lvals & rvals)
                    return bool(lvals and rvals and len(lvals | rvals) > 1)
                return fn
        lsel = self._compile_select(lhs)
        if rkind == "lit":
            def fn(ctx, _l=lsel, _rl=rval, _op=op):
                return run_compare([_string(v) for v in _l(ctx)], _rl, _op)
            return fn

        # $var operand: compares as a numeric literal when its string
        # value parses as a number, else as a string — resolved per
        # evaluation (the binding is scope-dependent)
        def fn(ctx, _l=lsel, _n=rval, _op=op):
            v = _string(self._lookup_var(_n))
            num = _literal(v)
            rhs_lit = v if num is None else num
            return run_compare([_string(x) for x in _l(ctx)], rhs_lit, _op)
        return fn

    def _select(self, ctx, path: str) -> list:
        tag, payload, path = _select_plan(path)
        if tag == 0:  # '.'
            return [ctx]
        if tag == 3:  # bare @attr — hot fast path
            if isinstance(ctx, ET.Element):
                v = ctx.attrib.get(payload)
                return [v] if v is not None else []
            return []
        if tag == 4:  # bare element name — hot fast path
            if isinstance(ctx, ET.Element):
                return [c for c in ctx if _local(c.tag) == path]
            if isinstance(ctx, _Doc):
                return [ctx.root] if _local(ctx.root.tag) == path else []
            return []
        if tag == 1:  # position() / last()
            if not self._ctx_pos:
                raise XsltUnsupported(f"{path} outside an iteration context")
            pos, size = self._ctx_pos[-1]
            return [str(pos if path == "position()" else size)]
        if tag == 5:  # $var reference
            if "/" in payload or "[" in payload:
                raise XsltUnsupported(f"path into variable {path!r}")
            return [self._lookup_var(payload)]
        if tag == 2:
            fname, inner = payload
            if fname == "count":
                return [str(len(self._select(ctx, inner)))]
            if fname == "key":
                return self._key_lookup(inner, ctx)
            if fname == "generate-id":
                if inner.strip():
                    items = self._select(ctx, inner)
                    if not items:
                        return [""]
                    return [self._generate_id(items[0])]
                return [self._generate_id(ctx)]
            if fname == "document":
                return [self._document(inner, ctx)]
            if fname == "concat":
                return ["".join(self._arg_string(ctx, a)
                                for a in _split_args(inner))]
            if fname == "string-length":
                v = self._arg_string(ctx, inner) if inner.strip() else _string(ctx)
                return [str(len(v))]
            if fname == "normalize-space":
                v = self._arg_string(ctx, inner) if inner.strip() else _string(ctx)
                return [" ".join(v.split())]
            if fname == "string":
                return [self._arg_string(ctx, inner) if inner.strip()
                        else _string(ctx)]
            if fname == "contains":
                a, b = self._args_strings(ctx, inner, "contains", 2)
                return [b in a]
            if fname == "starts-with":
                a, b = self._args_strings(ctx, inner, "starts-with", 2)
                return [a.startswith(b)]
            if fname == "substring-before":
                a, b = self._args_strings(ctx, inner, "substring-before", 2)
                return [a.split(b, 1)[0] if b and b in a else ""]
            if fname == "substring-after":
                a, b = self._args_strings(ctx, inner, "substring-after", 2)
                return [a.split(b, 1)[1] if b and b in a else ""]
            if fname == "translate":
                a, b, c = self._args_strings(ctx, inner, "translate", 3)
                table = {}
                for i, ch in enumerate(b):
                    if ch not in table:
                        table[ch] = c[i] if i < len(c) else None
                return ["".join(
                    table.get(ch, ch) for ch in a if table.get(ch, ch) is not None
                )]
            if fname == "substring":
                return self._substring(ctx, inner)
            if fname == "format-number":
                args = _split_args(inner)
                if len(args) not in (2, 3):
                    raise XsltUnsupported(
                        "format-number() takes (value, pattern[, format-name])"
                    )
                if len(args) == 3:
                    dfname = _literal(args[2].strip())
                    if not isinstance(dfname, str):
                        raise XsltUnsupported(
                            "format-number() format-name must be a string literal"
                        )
                    sym = self._decimal_formats.get(dfname)
                    if sym is None:
                        raise XsltUnsupported(
                            f"format-number() names undeclared "
                            f"xsl:decimal-format {dfname!r}"
                        )
                else:
                    # the UNNAMED xsl:decimal-format overrides defaults
                    sym = self._decimal_formats.get("", _DEFAULT_DF)
                try:
                    v = float(self._arg_string(ctx, args[0]))
                except ValueError:
                    return [sym["nan"]]
                # non-finite values parse fine but would blow up the
                # Decimal quantize inside _format_number; XSLT 1.0 says
                # format-number(NaN) -> the NaN symbol, infinities ->
                # the infinity symbol (minus-prefixed when negative)
                import math

                if math.isnan(v):
                    return [sym["nan"]]
                if math.isinf(v):
                    inf = sym["infinity"]
                    return [sym["minus"] + inf if v < 0 else inf]
                return [_format_number(v, self._arg_string(ctx, args[1]), sym)]
            if fname == "true" and not inner.strip():
                return [True]
            if fname == "false" and not inner.strip():
                return [False]
            if fname == "not":
                return [not self._test(ctx, inner)]
            if fname == "boolean":
                return [self._test(ctx, inner)]
            # text() falls through to step parsing; anything else is an
            # unsupported XPath function and fails fast there too
            # (the bare-@attr / bare-name / $var fast paths moved into
            # the _select_plan dispatch above)
        if path.startswith(("key(", "document(")):
            # key(...)/<steps> or document(...)/<steps>: the node-set
            # result is the path head (the whole-expression forms are
            # handled by the function dispatch above). _split_path
            # can't see into the args (its scanner only tracks
            # brackets), so find the matching close paren quote-aware.
            open_at = path.index("(")
            end = _close_paren(path, open_at)
            inner = path[open_at + 1 : end]
            if path.startswith("key("):
                cur: list = self._key_lookup(inner, ctx)
            else:
                cur = [self._document(inner, ctx)]
            path = path[end + 1 :]
            if path and not path.startswith("/"):
                raise XsltUnsupported(f"syntax after node-set function in {path!r}")
        elif path.startswith("/"):
            cur = [_Doc(self._root)]
        else:
            cur = [ctx]
        for name, preds, desc in _path_steps(path):
            nxt: list = []
            for node in cur:
                if isinstance(node, (str, _RTF)):
                    continue
                children = [node.root] if isinstance(node, _Doc) else list(node)
                if desc:
                    # descendant-or-self::node()/child:: — strict
                    # descendants of an element context; for the
                    # document, the root and everything below it.
                    # ET.iter() is preorder == XPath document order.
                    if isinstance(node, _Doc):
                        sub = list(node.root.iter())
                        or_self = sub
                    else:
                        sub = [e for e in node.iter() if e is not node]
                        # 'a//@id' / 'a//text()' expand to
                        # descendant-OR-SELF::node()/attribute::id (or
                        # child::text()), so the context element's own
                        # attribute/text is included (ADVICE r6); only
                        # element-name steps (child:: axis) keep the
                        # strict-descendant set.
                        or_self = list(node.iter())
                    if name == "*":
                        cand = sub
                    elif name == "text()":
                        cand = [e.text for e in or_self if e.text]
                    elif name == "node()":
                        # a//node(): every descendant node (elements
                        # AND text, tails included) in true document
                        # order via the interleaved child walk
                        # (code-review r7: fell through to a literal
                        # tag compare and silently selected nothing)
                        cand = []

                        def _walk(e, _out=cand):
                            for c in self._node_children(e):
                                _out.append(c)
                                if isinstance(c, ET.Element):
                                    _walk(c)

                        if isinstance(node, _Doc):
                            cand.append(node.root)
                            _walk(node.root)
                        else:
                            _walk(node)
                    elif name.startswith("@"):
                        cand = [
                            e.attrib[name[1:]] for e in or_self if name[1:] in e.attrib
                        ]
                    else:
                        cand = [e for e in sub if _local(e.tag) == name]
                    for p in preds:
                        pk = _pred_kind(p)
                        if pk[0] in ("index", "last", "positional"):
                            # XPath numbers descendant-step candidates
                            # per PARENT, not globally — refusing beats
                            # a silently wrong global index
                            raise XsltUnsupported(
                                f"positional predicate on descendant step [{p}]"
                            )
                        cand = [c for c in cand if self._test(c, pk[1])]
                    nxt.extend(cand)
                    continue
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
                elif name == "node()":
                    # child::node(): elements AND text children, in
                    # document order
                    cand = (
                        self._node_children(node)
                        if isinstance(node, ET.Element)
                        else children
                    )
                elif name == "*":
                    cand = children
                else:
                    cand = [c for c in children if _local(c.tag) == name]
                # predicates filter SEQUENTIALLY, positions renumbering
                # after each (XPath 1.0 semantics): [k] indexes, and
                # position()/last() see the current candidate list
                for p in preds:
                    pk = _pred_kind(p)
                    if pk[0] == "index":
                        k = pk[1]
                        cand = [cand[k - 1]] if 0 < k <= len(cand) else []
                    elif pk[0] == "last":
                        cand = cand[-1:]
                    elif pk[0] == "positional":
                        size = len(cand)
                        kept = []
                        for i, c in enumerate(cand, 1):
                            self._ctx_pos.append((i, size))
                            try:
                                if self._test(c, pk[1]):
                                    kept.append(c)
                            finally:
                                self._ctx_pos.pop()
                        cand = kept
                    else:
                        cand = [c for c in cand if self._test(c, pk[1])]
                nxt.extend(cand)
            cur = nxt
        return cur

    def _arg_string(self, ctx, tok: str) -> str:
        """One function argument -> string value: quoted literal,
        numeric literal (lexical form), or a path's string-value."""
        tok = tok.strip()
        if len(tok) >= 2 and tok[0] == "'" and tok[-1] == "'":
            return tok[1:-1]
        if _literal(tok) is not None:
            return tok
        items = self._select(ctx, tok)
        return _string(items[0]) if items else ""

    def _args_strings(self, ctx, inner: str, fname: str, n: int) -> list[str]:
        args = _split_args(inner)
        if len(args) != n:
            raise XsltUnsupported(
                f"{fname}() takes {n} arguments, got {len(args)}"
            )
        return [self._arg_string(ctx, a) for a in args]

    def _substring(self, ctx, inner: str) -> list:
        """XPath 1.0 substring(): 1-based, both numeric arguments pass
        through round() (floor(x+0.5)), chars kept at positions p with
        round(start) <= p < round(start)+round(length)."""
        import math

        args = _split_args(inner)
        if len(args) not in (2, 3):
            raise XsltUnsupported("substring() takes 2 or 3 arguments")
        s = self._arg_string(ctx, args[0])

        def num(tok: str) -> float:
            try:
                return float(self._arg_string(ctx, tok))
            except ValueError:
                return float("nan")

        start = num(args[1])
        if math.isnan(start):
            return [""]
        if math.isinf(start):
            # round(±Infinity) stays infinite: p >= -Infinity keeps every
            # char in the 2-arg form; any 3-arg upper bound (-inf + x, or
            # the NaN from -inf + inf) admits none, as does start = +inf
            return [s if (start < 0 and len(args) == 2) else ""]
        rstart = math.floor(start + 0.5)
        if len(args) == 2:
            return [s[max(0, rstart - 1):]]
        ln = num(args[2])
        if math.isnan(ln) or math.isinf(ln) and ln < 0:
            return [""]
        rend = rstart + (len(s) + 1 if math.isinf(ln) else math.floor(ln + 0.5))
        lo = max(1, rstart)
        hi = max(lo, min(rend, len(s) + 1))
        return [s[lo - 1 : hi - 1]]

    def _xsl_number(self, elem: ET.Element, ctx) -> str:
        """xsl:number subset (XSLT 1.0 §7.7): explicit ``value``, or
        level='single' (nearest ancestor-or-self matching ``count``,
        numbered among its preceding siblings) level='any' (matching
        nodes at-or-before the context in document order) and
        level='multiple' (hierarchical ancestor-or-self numbering with
        per-position format tokens). ``from`` fails fast; ``format``
        supports the '1'/'01'/'a'/'A'/'i'/'I' token alphabet with
        separators."""
        import math

        fmt = self._avt(elem.get("format", "1"), ctx)
        value = elem.get("value")
        if value is not None:
            try:
                v = float(self._arg_string(ctx, value))
            except ValueError:
                return "NaN"
            if math.isnan(v) or math.isinf(v):
                return "NaN" if math.isnan(v) else (
                    "-Infinity" if v < 0 else "Infinity"
                )
            return _format_xsl_number(int(math.floor(v + 0.5)), fmt)
        if elem.get("from") is not None:
            raise XsltUnsupported("xsl:number from= is out of subset")
        level = elem.get("level", "single")
        if level not in ("single", "any", "multiple"):
            raise XsltUnsupported(f"xsl:number level={level!r}")
        if not isinstance(ctx, ET.Element):
            raise XsltUnsupported("xsl:number on a non-element context")
        count = elem.get("count")
        count_alts = _split_union(count) if count else [_local(ctx.tag)]

        def matches(n) -> bool:
            return isinstance(n, ET.Element) and any(
                self._match_score(a, n) is not None for a in count_alts
            )

        def sibling_pos(target) -> int:
            parent = self._parents.get(target)
            n = 1
            if parent is not None:
                for sib in parent:
                    if sib is target:
                        break
                    if matches(sib):
                        n += 1
            return n

        if level == "multiple":
            # hierarchical numbering (1.2.3): every matching
            # ancestor-or-self, outermost first, each numbered among
            # its preceding siblings (XSLT 1.0 §7.7)
            chain = []
            t = ctx
            while t is not None:
                if matches(t):
                    chain.append(t)
                t = self._parents.get(t)
            if not chain:
                return ""
            chain.reverse()
            return _format_xsl_number([sibling_pos(t) for t in chain], fmt)
        if level == "any":
            root = self._containing_root(ctx)
            n = 0
            for e in root.iter():
                if matches(e):
                    n += 1
                if e is ctx:
                    break
            return _format_xsl_number(n, fmt) if n else ""
        # level='single'
        target = ctx
        while target is not None and not matches(target):
            target = self._parents.get(target)
        if target is None:
            return ""
        return _format_xsl_number(sibling_pos(target), fmt)

    def _generate_id(self, node) -> str:
        """generate-id(): unique, stable-within-a-transform id per node
        — document sequence number + document-order index (both lazily
        built, shared with the key() machinery)."""
        if isinstance(node, _Doc):
            return f"d{self._doc_seq(node.root)}"
        if not isinstance(node, ET.Element):
            raise XsltUnsupported(
                "generate-id() requires an element or document node "
                "(text/attribute values have no node identity here)"
            )
        root = self._containing_root(node)
        if id(root) not in self._doc_orders:
            self._doc_orders[id(root)] = {
                id(e): i for i, e in enumerate(root.iter())
            }
        return f"d{self._doc_seq(root)}e{self._doc_orders[id(root)][id(node)]}"

    def _doc_seq(self, root: ET.Element) -> int:
        seq = self._doc_seqs.get(id(root))
        if seq is None:
            seq = len(self._doc_seqs)
            self._doc_seqs[id(root)] = seq
        return seq

    def _test(self, ctx, expr: str) -> bool:
        # the structural parse (bool-operator split, group unwrap,
        # comparison split) is stylesheet-static — classified once per
        # distinct expression by _test_plan; only operand evaluation
        # runs per node
        kind, payload = _test_plan(expr)
        if kind == 0:  # empty
            return False
        if kind == 1:  # or
            return any(self._test(ctx, p) for p in payload)
        if kind == 2:  # and
            return all(self._test(ctx, p) for p in payload)
        if kind == 3:  # parenthesized group
            return self._test(ctx, payload)
        if kind == 4:  # not(...)
            return not self._test(ctx, payload)
        if kind == 5:  # existence / boolean-function select
            items = self._select(ctx, payload)
            if len(items) == 1 and isinstance(items[0], bool):
                return items[0]  # boolean function result, not a node-set
            return bool(items)
        lhs, op, rhs = payload
        expr = expr.strip()

        def operand_literal(tok: str):
            # a $var operand compares as a numeric literal when its
            # string value parses as a number, else as a string literal
            if tok.startswith("$"):
                v = _string(self._lookup_var(tok[1:]))
                num = _literal(v)
                return v if num is None else num
            return _literal(tok)

        rhs_lit = operand_literal(rhs)
        if rhs_lit is None:
            # literal-first spelling ('3 < n'): swap operands AND
            # mirror the ordered operator — '3 < n' means 'n > 3',
            # not 'n < 3' (code-review r7)
            lhs, rhs = rhs, lhs
            op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(op, op)
            rhs_lit = operand_literal(rhs)
            if rhs_lit is None:
                # node-set vs node-set (XPath 1.0 §3.4): '=' is true
                # iff ANY (a, b) pair matches; '!=' iff any pair
                # differs. Ordered node-set comparisons stay out of
                # the subset.
                if op not in ("=", "!="):
                    raise XsltUnsupported(
                        f"ordered path-to-path comparison {expr!r}"
                    )
                lvals = {_string(v) for v in self._select(ctx, lhs)}
                rvals = {_string(v) for v in self._select(ctx, rhs)}
                if op == "=":
                    return bool(lvals & rvals)
                return bool(lvals and rvals and len(lvals | rvals) > 1)
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


def compile_stylesheet(src: str, base_dir: str | None = None,
                       prefer_lxml: bool = True):
    """``src`` -> callable(xml_string) -> transformed string. The
    MiniXslt subset interpreter is the ENGINE OF RECORD; lxml's real
    libxslt is a BEST-EFFORT fast path taken when importable (it never
    is in this container — no install path — so the branch is
    unexercised here; the cross-engine agreement test stays armed and
    runs the comparison in any environment where lxml imports).
    ``base_dir`` anchors relative document() references; for the lxml
    path it becomes the parse base via a dummy base URL.
    ``prefer_lxml=False`` pins the subset interpreter — required when
    the caller depends on implementation-DEFINED behavior the spec
    leaves open (generate-id() value shape: libxslt emits 'idm...'
    strings, the subset emits document-order 'dNeM' ids)."""
    if prefer_lxml:
        try:
            from lxml import etree as LX  # pragma: no cover - absent in container

            base = f"{base_dir}/stylesheet.xsl" if base_dir else None
            xslt = LX.XSLT(LX.fromstring(src.encode(), base_url=base))
            return lambda xml: str(xslt(LX.fromstring(xml.encode())))
        except ImportError:
            pass
    return MiniXslt(src, base_dir=base_dir).apply


def xslt_pipeline(xml: str, transforms) -> str:
    """Apply compiled transforms head-first, each consuming the previous
    output — the reference's xslPipeline recursion (index.js:87-106)."""
    for fn in transforms:
        xml = fn(xml)
    return xml
