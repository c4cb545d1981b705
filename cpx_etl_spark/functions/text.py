"""Text-analysis column functions (documents table and any text corpus).

All pure `pyspark.sql.functions` compositions — whole-stage codegen,
no Python in the hot path, no shuffle. Tokenization keeps exact parity
with the DuckDB oracles (split on single space == string_split).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word/number/symbol segmentation (kept RE2-simple so Java and
# DuckDB regex agree).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
PUNCT_PATTERN = "[^A-Za-z0-9 ]"

STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "los", "que"],
    "fr": ["le", "la", "les", "et", "des"],
}


def tokens(text: Column | str, delim: str = " ") -> Column:
    return F.split(text, delim)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column | str) -> Column:
    return F.regexp_count(text if isinstance(text, Column) else F.col(text), F.lit(BPE_PATTERN)).cast("long")


def shingles_expr(tokens_col: str, n: int = 2) -> str:
    """SQL expr producing the DISTINCT n-gram shingle set of a token
    array column. Guarded for short docs (Spark's sequence() runs
    descending when start > stop, so an explicit emptiness check)."""
    if n == 1:
        return f"array_distinct({tokens_col})"
    return (
        f"if(size({tokens_col}) >= {n}, "
        f"array_distinct(transform(sequence(1, size({tokens_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({tokens_col}, i, {n})))), "
        f"cast(array() as array<string>))"
    )


def sql_shingles(tokens_sql: str, n: int = 2) -> str:
    """DuckDB twin of shingles_expr (generate_series is empty-safe)."""
    if n == 1:
        return f"list_distinct({tokens_sql})"
    parts = " || ' ' || ".join(f"({tokens_sql})[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(generate_series(1, len({tokens_sql}) - {n - 1}), "
        f"i -> {parts}))"
    )


def sum_token_lengths(tokens_col: Column) -> Column:
    """Exact integer total of token lengths (no float order issues)."""
    return F.aggregate(
        F.transform(tokens_col, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def stopword_count(tokens_col: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col, lambda t: F.array_contains(arr, t))).cast("long")


def punct_count(text: Column | str) -> Column:
    return F.regexp_count(text if isinstance(text, Column) else F.col(text), F.lit(PUNCT_PATTERN)).cast("long")


def quality_score(mean_token_len: Column, stop_ratio: Column, punct_ratio: Column) -> Column:
    """Linear clipped quality signal — deliberately transcendental-free
    so Spark and any oracle agree bit-for-bit."""
    raw = 0.12 * mean_token_len + 0.5 * stop_ratio - 2.0 * punct_ratio
    clipped = F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))
    # tie-safe rounding (see queries.EPS): rational scores hit exact
    # half-ties where engine ROUND rules diverge
    return F.round(clipped - 1e-9, 4)


def quality_signal_frame(df, *keep: str):
    """The five quality signals (n_tokens/sum_len/n_punct/n_stop/
    n_chars) over a text column, carrying `keep` columns through — the
    ONE Spark-side construction of the frame quality_score consumes
    (code-review r9: it had been hand-copied into three queries; the
    SQL side had already centralized its twin in sql_quality_score)."""
    return df.select(
        *keep,
        token_count(F.col("text")).alias("n_tokens"),
        sum_token_lengths(tokens(F.col("text"))).alias("sum_len"),
        punct_count(F.col("text")).alias("n_punct"),
        stopword_count(tokens(F.col("text")), STOPWORDS["en"]).alias("n_stop"),
        F.length("text").alias("n_chars"),
    )


def quality_from_signals() -> Column:
    """quality_score over the quality_signal_frame columns."""
    return quality_score(
        F.col("sum_len") / F.col("n_tokens"),
        F.col("n_stop") / F.col("n_tokens"),
        F.col("n_punct") / F.col("n_chars"),
    )


def sql_quality_score(mean_len_sql: str, stop_ratio_sql: str, punct_ratio_sql: str) -> str:
    """DuckDB twin of quality_score() over caller-supplied ratio SQL —
    the ONE place the 0.12/0.5/-2.0 weights and the clip/round contract
    live on the oracle side (code-review r9: the expression had been
    hand-copied into four oracles; a weight change had to hit all four
    or the oracles silently disagreed)."""
    return (
        f"ROUND(GREATEST(0.0, LEAST(1.0, "
        f"0.12 * ({mean_len_sql}) "
        f"+ 0.5 * ({stop_ratio_sql}) "
        f"- 2.0 * ({punct_ratio_sql}))) - 1e-9, 4) + 0"
    )


def sql_quality_score_from_text(tokens_sql: str, text_col: str = "text") -> str:
    """sql_quality_score instantiated directly over a raw text column
    (the form document-scoring oracles use)."""
    stop_list = ", ".join(repr(w) for w in STOPWORDS["en"])
    return sql_quality_score(
        f"list_sum(list_transform({tokens_sql}, s -> length(s))) * 1.0"
        f" / len({tokens_sql})",
        f"len(list_filter({tokens_sql}, s -> s IN ({stop_list}))) * 1.0"
        f" / len({tokens_sql})",
        f"len(regexp_extract_all({text_col}, '{PUNCT_PATTERN}')) * 1.0"
        f" / length({text_col})",
    )


def lang_scores(tokens_col: Column) -> dict[str, Column]:
    return {lang: stopword_count(tokens_col, words) for lang, words in STOPWORDS.items()}


def lang_id(tokens_col: Column) -> Column:
    """Stopword-profile language ID with deterministic alphabetical
    tie-break; 'und' when no profile hits."""
    s = lang_scores(tokens_col)
    langs = sorted(s)  # alphabetical priority on ties
    all_zero = F.greatest(*[s[lang] for lang in langs]) == 0
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [s[x] for x in langs[langs.index(lang) + 1 :]]
        cond = s[lang] >= F.greatest(*later) if len(later) > 1 else s[lang] >= later[0]
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return F.when(all_zero, F.lit("und")).otherwise(expr)


def sql_lang_id(tokens_sql: str) -> str:
    """DuckDB twin of lang_id over the same profiles."""
    cnt = {
        lang: f"len(list_filter({tokens_sql}, t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in STOPWORDS.items()
    }
    langs = sorted(cnt)
    when = []
    for i, lang in enumerate(langs[:-1]):
        later = [cnt[x] for x in langs[i + 1 :]]
        ge = " AND ".join(f"{cnt[lang]} >= {o}" for o in later)
        when.append(f"WHEN {ge} THEN '{lang}'")
    zeros = ", ".join(cnt.values())
    return (
        f"CASE WHEN greatest({zeros}) = 0 THEN 'und' "
        + " ".join(when)
        + f" ELSE '{langs[-1]}' END"
    )


def fingerprint(text: Column | str) -> Column:
    """Normalized token-set hash: md5 of the sorted distinct lowercase
    tokens — two docs with the same vocabulary share a fingerprint."""
    t = text if isinstance(text, Column) else F.col(text)
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.lower(t), " "))))
    )


SQL_FINGERPRINT = (
    "md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))"
)
