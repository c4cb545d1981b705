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
