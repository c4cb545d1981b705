"""Rule-based row validation.

Parity: the reference validates each field against a rule list —
valid when ANY literal equals the value or ANY predicate passes
(reference: src/main/etl.js:77-102, 407-470, 578-594). Distributed
form: each field's rules compile to one boolean Column
(`valid_<field>`), plus an overall `_valid` conjunction. Rules are a
small declarative vocabulary instead of opaque JS functions so they
stay JVM-side:

    rules = {
        "c_acctbal":    [("between", 0, 10000)],
        "c_name":       [("regex", r"^Customer#\\d+$")],
        "c_mktsegment": [("in", ["BUILDING", "MACHINERY"]), "AUTOMOBILE"],
        "c_custkey":    [("not_null",)],
    }

Bare scalars are equality literals (as in the reference); a field is
valid when any rule matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = object  # scalar literal | tuple spec


def _rule_to_col(col: Column, rule) -> Column:
    if not isinstance(rule, tuple):
        return col == F.lit(rule)
    op, *args = rule
    if op == "in":
        return col.isin(*args[0])
    if op == "between":
        return col.between(args[0], args[1])
    if op == "regex":
        return col.rlike(args[0])
    if op == "not_null":
        return col.isNotNull()
    if op == "is_null":
        return col.isNull()
    if op == "gt":
        return col > args[0]
    if op == "lt":
        return col < args[0]
    raise ValueError(f"validation: unknown rule {rule!r}")


def field_valid(col: Column, rules: list) -> Column:
    out = F.lit(False)
    for r in rules:
        out = out | F.coalesce(_rule_to_col(col, r), F.lit(False))
    return out


def validate(
    df: DataFrame,
    rules: dict[str, list],
    prefix: str = "valid_",
    overall: str = "_valid",
) -> DataFrame:
    """Append per-field boolean verdicts and the overall conjunction."""
    out = df
    verdicts = []
    for name, field_rules in rules.items():
        vcol = field_valid(F.col(name), field_rules)
        out = out.withColumn(prefix + name, vcol)
        verdicts.append(F.col(prefix + name))
    conj = F.lit(True)
    for v in verdicts:
        conj = conj & v
    return out.withColumn(overall, conj)


def expectations_report(df: DataFrame, specs: list[dict]) -> DataFrame:
    """TABLE-level expectation suite — the dbt-test / Great-Expectations
    surface on top of the per-row ``validate``: every expectation
    compiles into the SAME single aggregate pass (one scan, map-side
    partials — at 100 TB the suite costs one pass no matter how many
    expectations), then the 1-row result explodes into one verdict row
    per expectation: (expectation, observed, passed). ``passed`` is
    derived from the 4dp tie-rounded observed value so engines agree
    bit-for-bit at thresholds.

    Spec kinds: row_count_at_least(value) / unique(col: observed =
    duplicate count) / null_count_at_most(col, value) /
    accepted_values(col, values: observed = violations, NULL counts as
    a violation) / min_at_least(col, value) / max_at_most(col, value) /
    mean_between(col, lo, hi: DECIMAL-exact mean).

    Verdict names are UNIQUE within a report (ADVICE r11): a spec may
    carry an explicit ``name``, and otherwise a repeated derived name
    (two same-kind+col specs, e.g. two mean_between bands on one
    column) gets a ``#<spec index>`` suffix so its rows stay
    distinguishable and joinable back to their spec.
    """
    EPS = 1e-9
    aggs = []
    rows = []
    seen_names: set[str] = set()
    for i, spec in enumerate(specs):
        kind, col, tag = spec["kind"], spec.get("col"), f"_e{i}"
        if kind == "row_count_at_least":
            aggs.append(F.count(F.lit(1)).cast("double").alias(tag))
            name = f"row_count_at_least_{spec['value']}"
        elif kind == "unique":
            aggs.append(
                (F.count(col) - F.countDistinct(col)).cast("double").alias(tag)
            )
            name = f"unique_{col}"
        elif kind == "null_count_at_most":
            aggs.append(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                .cast("double")
                .alias(tag)
            )
            name = f"null_count_at_most_{col}_{spec['value']}"
        elif kind == "accepted_values":
            aggs.append(
                F.sum(
                    F.when(F.col(col).isin(spec["values"]), 0).otherwise(1)
                )
                .cast("double")
                .alias(tag)
            )
            name = f"accepted_values_{col}"
        elif kind == "min_at_least":
            aggs.append(F.min(col).cast("double").alias(tag))
            name = f"min_at_least_{col}_{spec['value']}"
        elif kind == "max_at_most":
            aggs.append(F.max(col).cast("double").alias(tag))
            name = f"max_at_most_{col}_{spec['value']}"
        elif kind == "mean_between":
            # count(col), not count(*): NULLs are excluded from the sum,
            # so including them in the denominator biases the mean low
            # (code-review r11)
            aggs.append(
                (
                    F.sum(F.col(col).cast("decimal(20,4)")).cast("double")
                    / F.count(F.col(col))
                ).alias(tag)
            )
            name = f"mean_between_{col}"
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")
        name = spec.get("name", name)
        if name in seen_names:
            name = f"{name}#{i}"
        seen_names.add(name)
        obs = F.round(F.col(tag) - EPS, 4)
        if kind in ("unique",):
            passed = obs == 0
        elif kind in ("accepted_values",):
            passed = obs <= 0
        elif kind in ("row_count_at_least", "min_at_least"):
            passed = obs >= spec["value"]
        elif kind in ("max_at_most", "null_count_at_most"):
            passed = obs <= spec["value"]
        else:  # mean_between
            passed = (obs >= spec["lo"]) & (obs <= spec["hi"])
        rows.append(
            F.struct(
                F.lit(name).alias("expectation"),
                (obs + 0).alias("observed"),
                # NULL observed (empty table / all-NULL column) must
                # FAIL, not float through as neither-pass-nor-fail — an
                # empty table cannot satisfy a data contract
                # (code-review r11)
                F.coalesce(passed, F.lit(False)).alias("passed"),
            )
        )
    return (
        df.agg(*aggs)
        .select(F.explode(F.array(*rows)).alias("e"))
        .select("e.*")
    )
