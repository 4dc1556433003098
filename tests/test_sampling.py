"""Deterministic sampling: partition-invariance (the property
df.sample() lacks), fraction accuracy, strata quotas, salt independence.
DuckDB value parity is graded by tests/test_entry_contract.py via the
sample_* oracle entries."""

from __future__ import annotations

import pytest

from arlas_proc_spark.operators.sampling import (
    fraction_threshold_hex,
    sample_bernoulli,
    sample_stratified,
    sample_weighted_strata,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"lang{i % 3}", f"src{i % 2}") for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, lang string, src string")


def test_threshold_hex():
    assert fraction_threshold_hex(0.0) == "00000000"
    assert fraction_threshold_hex(0.25) == "40000000"
    assert fraction_threshold_hex(0.5) == "80000000"
    assert fraction_threshold_hex(0.1) == "1999999a"
    assert fraction_threshold_hex(1.0) == "g"  # sorts above every hex draw
    with pytest.raises(ValueError):
        fraction_threshold_hex(1.5)


def test_bernoulli_partition_invariant_and_accurate(docs):
    a = {r.doc_id for r in
         sample_bernoulli(docs.repartition(7), 0.5, ["doc_id"]).collect()}
    b = {r.doc_id for r in
         sample_bernoulli(docs.repartition(3), 0.5, ["doc_id"]).collect()}
    assert a == b  # pure function of the data, not the partitioning
    assert 0.35 * 600 < len(a) < 0.65 * 600
    assert sample_bernoulli(docs, 0.0, ["doc_id"]).count() == 0
    assert sample_bernoulli(docs, 1.0, ["doc_id"]).count() == 600
    # a different salt draws an (almost surely) different sample
    c = {r.doc_id for r in
         sample_bernoulli(docs, 0.5, ["doc_id"], salt="s2").collect()}
    assert c != a


def test_stratified_quota_and_determinism(docs):
    out = sample_stratified(docs, ["lang", "src"], 7, ["doc_id"])
    counts = {(r.lang, r.src): r.n for r in
              out.groupBy("lang", "src").count()
                 .withColumnRenamed("count", "n").collect()}
    assert len(counts) == 6 and all(n == 7 for n in counts.values())
    again = sample_stratified(docs.repartition(11), ["lang", "src"], 7,
                              ["doc_id"])
    assert ({r.doc_id for r in out.collect()} ==
            {r.doc_id for r in again.collect()})
    # quota above stratum size keeps the whole stratum
    small = docs.where("doc_id < 12")
    assert sample_stratified(small, ["lang"], 100, ["doc_id"]).count() == 12
    with pytest.raises(ValueError):
        sample_stratified(docs, ["lang"], 0, ["doc_id"])


def test_weighted_strata_rates(docs):
    out = sample_weighted_strata(docs, "lang",
                                 {"lang0": 1.0, "lang1": 0.0},
                                 ["doc_id"], default_fraction=0.5)
    per = {r.lang: r.n for r in out.groupBy("lang").count()
           .withColumnRenamed("count", "n").collect()}
    assert per.get("lang0") == 200          # 1.0 keeps every row
    assert "lang1" not in per               # 0.0 keeps none
    assert 0.3 * 200 < per.get("lang2", 0) < 0.7 * 200  # default rate


def test_normalize_text_unicode_and_controls(spark):
    """normalize_text on adversarial inputs the ASCII fixture can't
    cover: combining chars (NFC), C0/DEL controls, whitespace runs,
    nulls. DuckDB parity of the full chain is asserted directly."""
    import duckdb
    import unicodedata

    from arlas_proc_spark.operators.text import normalize_text
    decomposed = "école"                      # é as e + combining
    rows = [(1, decomposed), (2, "a\x01b \x7f c"), (3, "  x \t\x0b y  "),
            (4, None), (5, "plain text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_norm
           for r in normalize_text(df).collect()}
    assert got[1] == unicodedata.normalize("NFC", decomposed) == "école"
    assert got[2] == "ab  c".replace("  ", " ") == "ab c"
    assert got[3] == "x y"
    assert got[4] is None and got[5] == "plain text"
    import conftest
    con = conftest.duck_cursor()
    con.execute("create temp table d (doc_id bigint, text varchar)")
    con.executemany("insert into d values (?, ?)", rows)
    want = dict(con.execute(r"""
        SELECT doc_id, trim(regexp_replace(regexp_replace(
                   nfc_normalize(text),
                   '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                   '\s+', ' ', 'g'))
        FROM d""").fetchall())
    assert got == want
