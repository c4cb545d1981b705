"""Unicode normalization column function.

Spark has no built-in Unicode normalizer, so this is a legitimate
Arrow-batched pandas-UDF path (same rationale as the multimodal
decoders): normalization tables are imperative lookups, not
expressible in `pyspark.sql.functions`. Training pipelines normalize
text BEFORE hashing/dedup so that composed and decomposed spellings of
the same grapheme ('é' vs 'e'+U+0301) dedup together.

Cross-engine determinism: NFC/NFKC are deterministic per Unicode
version; Python's unicodedata and DuckDB's nfc_normalize agree on any
corpus whose characters normalize identically across their Unicode
table versions (all stable scripts — normalization of assigned
characters is stabilized by the Unicode standard's normalization
stability policy).
"""

from __future__ import annotations

import unicodedata

import pandas as pd  # module level: pandas_udf resolves stringified hints here
from pyspark.sql import Column
from pyspark.sql import functions as F

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Normalize a string column to the given Unicode normal form."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    # asNondeterministic: deterministic in fact, but stops Catalyst
    # from cloning the Python stage into pushed-down filter predicates
    # (see plans/xsl_chain.py for the measured failure mode)
    return norm.asNondeterministic()(col)
