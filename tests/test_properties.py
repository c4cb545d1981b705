"""Property-based tests (hypothesis) for the coercion and fixed-width
codecs — SURVEY §5.4."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from cpx_etl_spark.functions.schema_apply import schema_apply
from cpx_etl_spark.sources.fixed_width import Field, decode, encode

# shared session comes from conftest's fixture; hypothesis drives data
SETTINGS = settings(max_examples=20, deadline=None)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-999, 9999).map(str), st.just("")),
            st.one_of(st.none(), st.dates(dt.date(1900, 1, 1), dt.date(2099, 12, 31)).map(str), st.just("0000-00-00")),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_schema_apply_nullable_never_errors(spark, rows):
    """Nullable coercion of well-formed-or-null-token inputs never
    produces an _errors entry, and outputs are null or typed."""
    df = spark.createDataFrame(rows, "n string, d string")
    out = schema_apply(df, {"n": "Number", "d": "Date"}).collect()
    for r in out:
        assert r["_errors"] == []
        assert r["n"] is None or isinstance(r["n"], int)
        assert r["d"] is None or isinstance(r["d"], dt.datetime)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 9_999_999)),
            st.one_of(st.none(), st.text(alphabet="abcdefgh XYZ", min_size=0, max_size=12)),
            st.one_of(st.none(), st.booleans()),
            st.one_of(
                st.none(),
                st.datetimes(dt.datetime(1900, 1, 1), dt.datetime(2099, 12, 31)).map(
                    lambda d: d.replace(hour=0, minute=0, second=0, microsecond=0)
                ),
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_fixed_width_roundtrip_property(spark, rows):
    """encode -> decode recovers every value (strings truncated to the
    field width and right-trimmed, numbers that fit, day-aligned dates)."""
    fields = [
        Field("n", 8, "number"),
        Field("s", 10, "string"),
        Field("b", 2, "boolean"),
        Field("d", 8, "date"),
    ]
    df = spark.createDataFrame(
        rows, "n long, s string, b boolean, d timestamp"
    )
    back = decode(encode(df, fields).select("line"), fields).collect()
    orig = df.collect()
    assert len(back) == len(orig)
    got = sorted(
        ((r["n"], r["s"], r["b"], r["d"]) for r in back),
        key=lambda t: tuple(str(x) for x in t),
    )
    want = sorted(
        (
            (
                r["n"],
                # width-10 truncation then rtrim; all-space strings decode as null
                (r["s"][:10].rstrip() or None) if r["s"] is not None else None,
                r["b"],
                r["d"],
            )
            for r in orig
        ),
        key=lambda t: tuple(str(x) for x in t),
    )
    assert got == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    codec="utf-8",
                    exclude_categories=("Cs", "Cc"),
                ),
                max_size=12,
            ),
            st.integers(-(2**40), 2**40),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_xlsx_roundtrip_property(tmp_path_factory, rows):
    """Arbitrary text (incl. XML-special chars), big ints, and finite
    doubles survive the XLSX write/read round-trip. Integer-valued
    float columns may narrow to int (documented Excel semantics) —
    values must still compare equal."""
    import os

    from cpx_etl_spark.sources.xlsx import read_xlsx_tables, write_xlsx

    path = os.path.join(str(tmp_path_factory.mktemp("xlsxprop")), "p.xlsx")
    write_xlsx(path, {"t": (["s", "i", "f"], rows)})
    got = read_xlsx_tables(path)["t"]
    assert got[0] == ["s", "i", "f"]
    assert len(got[1]) == len(rows)
    for (s, i, f), (gs, gi, gf) in zip(rows, got[1]):
        assert gs == s or (s == "" and gs is None)  # empty inline str
        assert gi == i
        assert gf == f or (gf is not None and float(gf) == f)


_path_segment = st.one_of(
    st.sampled_from(["$", "#", ""]),
    st.from_regex(r"#?[a-c]{1,3}", fullmatch=True),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_path_segment, min_size=1, max_size=4).map(".".join))
def test_path_lineage_mirrors_path_col_accept_reject(spark, path):
    """Drift guard for the static lineage mirror (ADVICE r6): for ANY
    generated applyPath string, path_lineage accepts iff path_col
    accepts — the impact-analysis view can never diverge from the
    compiler on what is a legal path. (Column construction is lazy, so
    path_col's acceptance is exactly its parse-time validation; the
    spark fixture provides the JVM that Column expressions bind to.)"""
    from cpx_etl_spark.functions.paths import path_col, path_lineage

    try:
        path_col(path)
        compiled = True
    except ValueError:
        compiled = False
    try:
        kind, _norm, _scoped = path_lineage(path)
        analyzed = True
        assert kind in ("path", "length")
    except ValueError:
        analyzed = False
    assert compiled == analyzed, (
        f"path_col and path_lineage disagree on {path!r}"
    )


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-1e12, max_value=1e12, allow_nan=False),
    st.sampled_from(["0", "0.00", "#,##0.00", "0.###", "#,##0", "0.0%"]),
)
def test_format_number_invariants(value, pattern):
    """format-number() subset invariants: output round-trips to within
    the pattern's quantum, grouping separators sit every 3 digits, and
    the sign is preserved."""
    from cpx_etl_spark.functions.xslt import _format_number

    out = _format_number(value, pattern)
    pct = pattern.endswith("%")
    body = out[:-1] if pct else out
    scaled = value * 100 if pct else value
    parsed = float(body.replace(",", ""))
    frac = pattern[:-1] if pct else pattern
    frac_digits = len(frac.partition(".")[2])
    assert abs(parsed - scaled) <= 0.5 * 10 ** -frac_digits + 1e-6 * abs(scaled)
    assert (parsed < 0) == (scaled < -0.5 * 10 ** -frac_digits)
    if "," in pattern:
        int_part = body.lstrip("-").partition(".")[0]
        for group in int_part.split(",")[1:]:
            assert len(group) == 3


_xml_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs", "Cc"), exclude_characters="\r"
    ),
    min_size=1,
    max_size=8,
)
_xml_tag = st.sampled_from(["a", "b", "c-d", "e_f"])
_xml_attrs = st.dictionaries(
    st.sampled_from(["k", "id", "v"]), _xml_text, max_size=2
)


def _mk_tree(draw, depth):
    import xml.etree.ElementTree as ET

    elem = ET.Element(draw(_xml_tag), dict(draw(_xml_attrs)))
    if draw(st.booleans()):
        elem.text = draw(_xml_text)
    if depth < 2:
        for _ in range(draw(st.integers(0, 2))):
            child = _mk_tree(draw, depth + 1)
            elem.append(child)
            if draw(st.booleans()):
                child.tail = draw(_xml_text)
    return elem


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_identity_transform_roundtrips_arbitrary_trees(data):
    """Fuzz the interpreter end-to-end: the identity transform
    (xsl:copy + copy-of @* + node() recursion) over ARBITRARY small
    trees — attribute values and text with XML-special and non-ASCII
    characters — must re-parse to an equivalent tree (tags, attrs,
    text, tails). This pins the serializer's escaping/quoting and the
    attr-copy path against the whole input space, not just the
    hand-picked cases."""
    import xml.etree.ElementTree as ET

    from cpx_etl_spark.functions.xslt import MiniXslt

    root = _mk_tree(data.draw, 0)
    src = ET.tostring(root, encoding="unicode")
    xsl = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="node()">
        <xsl:copy>
          <xsl:copy-of select="@*"/>
          <xsl:apply-templates select="node()"/>
        </xsl:copy>
      </xsl:template>
    </xsl:stylesheet>"""
    out = MiniXslt(xsl).apply(src)
    got = ET.fromstring(out)

    def eq(a, b):
        assert a.tag == b.tag
        assert dict(a.attrib) == dict(b.attrib)
        assert (a.text or "") == (b.text or "")
        assert (a.tail or "") == (b.tail or "")
        assert len(a) == len(b)
        for ca, cb in zip(a, b):
            eq(ca, cb)

    eq(root, got)
