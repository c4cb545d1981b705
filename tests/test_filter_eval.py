"""Property tests for the filter-evaluation statistics family
(q_filter_auc / q_score_calibration / q_judge_agreement): plant
corpora with KNOWN ground-truth statistics and check the queries
recover them exactly — the hash gate proves Spark==DuckDB, these
prove both equal the math."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpx_etl_spark.functions.text import STOPWORDS
from cpx_etl_spark.queries.text import (
    q_filter_auc,
    q_judge_agreement,
    q_score_calibration,
)

# high quality score: pure English stopwords (stop_ratio 1, no punct)
_EN_TEXT = " ".join(STOPWORDS["en"][:8])
# quality score clips to 0: punctuation-only tokens drive raw negative
_JUNK_TEXT = "!!! ??? ... !!! ??? ..."
# German stopwords: lang_id predicts 'de', quality stays > 0
_DE_TEXT = " ".join(STOPWORDS["de"][:8])


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_auc_is_one_for_perfect_separator(spark, tmp_path):
    """Every en doc scores strictly above every non-en doc => AUC = 1."""
    rows = [(_EN_TEXT, "en", "s0")] * 4 + [(_JUNK_TEXT, "zh", "s0")] * 6
    out = q_filter_auc(spark, _write_docs(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_pos"], r["n_neg"]) == (4, 6)
    assert r["auc"] == 1.0


def test_auc_is_half_when_score_carries_no_signal(spark, tmp_path):
    """Same score for both classes => every pair is a half-tie => 0.5."""
    rows = [(_EN_TEXT, "en", "s0")] * 3 + [(_EN_TEXT, "zh", "s0")] * 5
    out = q_filter_auc(spark, _write_docs(spark, tmp_path, rows)).collect()
    assert len(out) == 1 and out[0]["auc"] == 0.5


def test_auc_excludes_single_class_sources(spark, tmp_path):
    rows = [(_EN_TEXT, "en", "only_pos")] * 3 + [
        (_EN_TEXT, "en", "mixed"),
        (_JUNK_TEXT, "de", "mixed"),
    ]
    out = q_filter_auc(spark, _write_docs(spark, tmp_path, rows)).collect()
    assert [r["source"] for r in out] == ["mixed"]
    assert out[0]["auc"] == 1.0


def test_calibration_bins_partition_the_corpus(spark, tmp_path):
    rows = (
        [(_EN_TEXT, "en", "s0")] * 4
        + [(_JUNK_TEXT, "zh", "s0")] * 3
        + [(_DE_TEXT, "de", "s1")] * 5
    )
    sf = _write_docs(spark, tmp_path, rows)
    out = q_score_calibration(spark, sf).collect()
    per_source = {}
    for r in out:
        per_source[r["source"]] = per_source.get(r["source"], 0) + r["n"]
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n"]
        assert 0.0 <= r["gap"] <= 1.0
        # gap is |avg_conf - pos_rate| of the same row (rounding slack)
        assert abs(r["gap"] - abs(r["avg_conf"] - r["pos_rate"])) < 2e-6
    assert per_source == {"s0": 7, "s1": 5}


def test_calibration_junk_bin_is_perfectly_calibrated_at_zero(spark, tmp_path):
    """Clipped-to-0 junk docs land in bin 0 with conf 0 and no positives."""
    rows = [(_JUNK_TEXT, "zh", "s0")] * 4 + [(_EN_TEXT, "en", "s0")]
    out = q_score_calibration(spark, _write_docs(spark, tmp_path, rows)).collect()
    b0 = [r for r in out if r["bin"] == 0]
    assert len(b0) == 1
    assert b0[0]["n"] == 4 and b0[0]["n_pos"] == 0
    assert b0[0]["avg_conf"] == 0.0 and b0[0]["gap"] == 0.0


def test_kappa_is_one_for_perfectly_agreeing_judges(spark, tmp_path):
    """lang_id predicts en exactly on the en docs => kappa = 1."""
    rows = [(_EN_TEXT, "en", "s0")] * 3 + [(_DE_TEXT, "de", "s0")] * 4
    out = q_judge_agreement(spark, _write_docs(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["tt"], r["tf"], r["ft"], r["ff"]) == (3, 0, 0, 4)
    assert r["kappa"] == 1.0


def test_kappa_excludes_degenerate_tables(spark, tmp_path):
    """A judge that answers one class everywhere AND matches => chance
    agreement 1, zero denominator: the row must be absent, not NaN."""
    rows = [(_EN_TEXT, "en", "all_en")] * 3 + [
        (_EN_TEXT, "en", "mixed"),
        (_DE_TEXT, "de", "mixed"),
    ]
    out = q_judge_agreement(spark, _write_docs(spark, tmp_path, rows)).collect()
    assert [r["source"] for r in out] == ["mixed"]
    assert out[0]["kappa"] == 1.0


def test_kappa_is_nonpositive_for_anticorrelated_judges(spark, tmp_path):
    """Prediction inverted vs gold (en text labeled de and vice versa)
    => observed agreement 0 => kappa < 0."""
    rows = [(_EN_TEXT, "de", "s0")] * 3 + [(_DE_TEXT, "en", "s0")] * 3
    out = q_judge_agreement(spark, _write_docs(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["tt"] == 0 and r["ff"] == 0
    assert r["kappa"] == -1.0
