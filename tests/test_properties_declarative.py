"""Property-based tests (hypothesis) for the declarative surface —
badgerfish convert and the transform-mapping/applyPath compiler
(SURVEY §7 r4; reference: src/main/etl.js:35-75, 324-405, 503-532).

Each suite checks the Spark-compiled operator against a tiny pure-Python
interpreter of the reference semantics, over hypothesis-generated rows
and (for mapping) hypothesis-generated specs.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from cpx_etl_spark.functions.badgerfish import convert
from cpx_etl_spark.plans.mapping import apply_mapping

SETTINGS = settings(max_examples=12, deadline=None)

# --- badgerfish round-trip ----------------------------------------------------

_SCALAR = st.one_of(
    st.none(),
    st.integers(-(2**31), 2**31),
    st.text(alphabet="abcXYZ@# .", max_size=8),
)

_BF_SCHEMA = (
    "a long, name string, "
    "meta struct<lang:string, score:long, deep:struct<k:string>>, "
    "items array<struct<x:long, y:string>>"
)


@st.composite
def _bf_rows(draw):
    n = draw(st.integers(1, 5))
    rows = []
    for _ in range(n):
        meta = draw(
            st.one_of(
                st.none(),
                st.tuples(
                    st.one_of(st.none(), st.text(alphabet="abc", max_size=4)),
                    st.one_of(st.none(), st.integers(0, 99)),
                    st.one_of(
                        st.none(),
                        st.tuples(st.one_of(st.none(), st.text(alphabet="xy", max_size=3))),
                    ),
                ),
            )
        )
        items = draw(
            st.one_of(
                st.none(),
                st.lists(
                    st.tuples(
                        st.one_of(st.none(), st.integers(0, 9)),
                        st.one_of(st.none(), st.text(alphabet="pq", max_size=3)),
                    ),
                    max_size=3,
                ),
            )
        )
        rows.append(
            (draw(st.integers(0, 99)), draw(st.one_of(st.none(), st.text(alphabet="nm", max_size=4))), meta, items)
        )
    return rows


def _leaf_names(schema, out):
    from pyspark.sql.types import ArrayType, StructType

    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, StructType):
            out.append((f.name, "container"))
            _leaf_names(dt, out)
        elif isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            out.append((f.name, "container"))
            _leaf_names(dt.elementType, out)
        else:
            out.append((f.name, "leaf"))


@SETTINGS
@given(rows=_bf_rows())
def test_badgerfish_roundtrip_property(spark, rows):
    """to-bfish prefixes exactly the scalar leaves, keeps container
    names, and from-bfish inverts it bit-exactly (schema + data)."""
    df = spark.createDataFrame(rows, _BF_SCHEMA)
    bf = convert(df, to_bfish=True)

    names = []
    _leaf_names(bf.schema, names)
    for name, kind in names:
        if kind == "leaf":
            assert name.startswith("@"), f"leaf {name!r} not prefixed"
        else:
            assert not name.startswith("@"), f"container {name!r} prefixed"

    back = convert(bf, to_bfish=False)
    # names+types must round-trip exactly; nullability flags may widen
    # (when/otherwise marks rebuilt structs nullable)
    assert back.schema.simpleString() == df.schema.simpleString()
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


@SETTINGS
@given(rows=_bf_rows())
def test_badgerfish_idempotent_property(spark, rows):
    """Converting an already-bfish frame again is a no-op (the reference
    checks the '@' prefix before adding: etl.js:510)."""
    df = spark.createDataFrame(rows, _BF_SCHEMA)
    once = convert(df, to_bfish=True)
    twice = convert(once, to_bfish=True)
    assert twice.schema.simpleString() == once.schema.simpleString()
    assert sorted(map(str, twice.collect())) == sorted(map(str, once.collect()))


# --- transform mapping vs a pure-Python applyPath oracle ----------------------

_MAP_SCHEMA = (
    "a long, s string, "
    "b struct<c:string, d:struct<e:long>>, "
    "arr array<struct<x:long, y:string>>, "
    "tags array<string>"
)

# valid path refs against _MAP_SCHEMA at row scope
_ROW_PATHS = ["a", "s", "b.c", "b.d.e", "$.a", "$.b.c", "#arr", "#tags"]
# valid refs inside the arr-element scope
_ELEM_PATHS = ["x", "y", "$.a", "$.b.c"]


def _py_path(path, scope, row):
    """Reference applyPath semantics (etl.js:35-75): '$' jumps to the
    row root; '#field' is len(field); dotted struct access else."""
    cur = scope
    parts = path.split(".")
    for i, part in enumerate(parts):
        if part == "$":
            cur = row
            continue
        if part.startswith("#"):
            assert i == len(parts) - 1
            arr = None if cur is None else cur.get(part[1:])
            return None if arr is None else len(arr)
        cur = None if cur is None else cur.get(part)
    return cur


def _py_mapping(spec, scope, row):
    out = {}
    for k, v in spec.items():
        if isinstance(v, list):
            head, rest = v[0], v[1:]
            base = _py_path(head, scope, row)
            if rest:
                elem_spec = rest[0]
                base = (
                    None
                    if base is None
                    else [_py_mapping(elem_spec, e, row) for e in base]
                )
            out[k] = base
        elif isinstance(v, dict):
            out[k] = _py_mapping(v, scope, row)
        else:
            out[k] = v
    return out


@st.composite
def _mapping_spec(draw, depth=0):
    spec = {}
    n = draw(st.integers(1, 4))
    for i in range(n):
        key = f"k{depth}_{i}"
        kind = draw(
            st.sampled_from(
                ["path", "const", "nested", "arrmap"] if depth == 0 else ["path", "const"]
            )
        )
        if kind == "path":
            spec[key] = [draw(st.sampled_from(_ROW_PATHS))]
        elif kind == "const":
            spec[key] = draw(st.one_of(st.integers(0, 9), st.sampled_from(["u", "v"])))
        elif kind == "nested":
            spec[key] = draw(_mapping_spec(depth=depth + 1))
        else:
            inner = {
                f"e{j}": [draw(st.sampled_from(_ELEM_PATHS))]
                for j in range(draw(st.integers(1, 2)))
            }
            spec[key] = ["arr", inner]
    return spec


@st.composite
def _map_rows(draw):
    n = draw(st.integers(1, 4))
    rows = []
    for _ in range(n):
        rows.append(
            (
                draw(st.integers(0, 99)),
                draw(st.one_of(st.none(), st.text(alphabet="st", max_size=3))),
                (
                    draw(st.one_of(st.none(), st.text(alphabet="c", max_size=2))),
                    (draw(st.integers(0, 9)),),
                ),
                draw(
                    st.one_of(
                        st.none(),
                        st.lists(
                            st.tuples(st.integers(0, 9), st.text(alphabet="y", max_size=2)),
                            max_size=3,
                        ),
                    )
                ),
                draw(st.lists(st.text(alphabet="t", max_size=2), max_size=3)),
            )
        )
    return rows


def _row_to_dict(r):
    return {
        "a": r[0],
        "s": r[1],
        "b": {"c": r[2][0], "d": {"e": r[2][1][0]}},
        "arr": None if r[3] is None else [{"x": x, "y": y} for x, y in r[3]],
        "tags": r[4],
    }


def _normalize(v):
    if isinstance(v, dict):
        return {k: _normalize(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_normalize(x) for x in v]
    return v


@SETTINGS
@given(rows=_map_rows(), spec=_mapping_spec())
def test_mapping_matches_python_oracle(spark, rows, spec):
    """apply_mapping (one compiled Spark projection) computes exactly
    what the reference's per-record JS interpreter would: path refs,
    '$' root jumps, '#' lengths, constants, nested objects, and
    per-element array mappings."""
    df = spark.createDataFrame(rows, _MAP_SCHEMA)
    got = [r.asDict(recursive=True) for r in apply_mapping(df, spec).collect()]
    want = [_py_mapping(spec, _row_to_dict(r), _row_to_dict(r)) for r in rows]
    got_n = sorted(map(str, (_normalize(g) for g in got)))
    want_n = sorted(map(str, (_normalize(w) for w in want)))
    assert got_n == want_n


# --- curation operator properties --------------------------------------------


@SETTINGS
@given(
    texts=st.lists(
        st.lists(st.integers(0, 999).map(str), min_size=1, max_size=90).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    chunk=st.integers(4, 40),
)
def test_chunking_coverage_property(spark, texts, chunk):
    """Every token of every doc appears in some chunk; consecutive
    chunks overlap by exactly chunk - stride tokens (except the tail);
    reassembling non-overlap prefixes recovers the document."""
    from cpx_etl_spark.operators.curation import chunk_documents

    stride = max(1, (chunk * 3) // 4)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(df, "doc_id", "text", chunk_tokens=chunk, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"].split(" ")
    for i, t in enumerate(texts):
        toks = t.split(" ")
        chunks = by_doc[i]
        assert sorted(chunks) == list(range(len(chunks)))
        # reassembly: chunk j contributes its first `stride` tokens,
        # the last chunk contributes everything
        rebuilt = []
        for j in range(len(chunks)):
            rebuilt += chunks[j] if j == len(chunks) - 1 else chunks[j][:stride]
        # trailing chunks can overlap-duplicate the doc tail; rebuilt
        # must START with the doc and contain nothing foreign
        assert rebuilt[: len(toks)] == toks
        for j in range(len(chunks)):
            assert chunks[j] == toks[j * stride : j * stride + chunk]


@SETTINGS
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["en", "de", "fr"]), st.integers(1, 400)),
        min_size=1,
        max_size=30,
    ),
    capacity=st.integers(50, 1000),
)
def test_packing_partition_property(spark, docs, capacity):
    """Packing is a partition: every doc in exactly one bin, bins are
    contiguous id ranges per group, bin token totals match, and every
    bin except possibly the last STARTS under capacity boundary."""
    from pyspark.sql import functions as F

    from cpx_etl_spark.operators.curation import pack_sequences

    rows = [(lang, i, n) for i, (lang, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n long")
    out = pack_sequences(df, "doc_id", F.col("n"), "lang", capacity=capacity).collect()
    per_lang_docs = {}
    for lang, i, n in rows:
        per_lang_docs.setdefault(lang, []).append((i, n))
    assert sum(r["n_docs"] for r in out) == len(rows)
    for lang, ds in per_lang_docs.items():
        bins = sorted(
            (r for r in out if r["lang"] == lang), key=lambda r: r["bin"]
        )
        ds.sort()
        assert sum(r["bin_tokens"] for r in bins) == sum(n for _, n in ds)
        # contiguity: first/last ids of consecutive bins never interleave
        for a, b in zip(bins, bins[1:]):
            assert a["last_id"] < b["first_id"]
        # replay the greedy fill in python and compare bin ids exactly
        cum = 0
        want = {}
        for i, n in ds:
            want.setdefault(cum // capacity, []).append(i)
            cum += n
        got = {r["bin"]: (r["first_id"], r["last_id"], r["n_docs"]) for r in bins}
        assert set(got) == set(want)
        for b_id, ids in want.items():
            assert got[b_id] == (min(ids), max(ids), len(ids))
