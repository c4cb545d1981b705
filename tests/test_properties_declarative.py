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
