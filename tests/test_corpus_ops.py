"""Corpus-shaping operators: token-window chunking, cross-document
boilerplate-line removal, PII scrubbing. The DuckDB-parity versions run
in tests/test_entry_contract.py (doc_chunks, boilerplate_chunks,
pii_scrub); these tests pin the operator semantics and plan shapes on
hand fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arlas_proc_spark.operators.corpus import (
    chunk_documents,
    flag_boilerplate_lines,
    strip_boilerplate_lines,
)
from arlas_proc_spark.operators.text import scrub_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- chunking

def test_chunk_windows_and_overlap(spark):
    text = " ".join(f"w{i}" for i in range(10))
    out = chunk_documents(_docs(spark, [(1, text)]), chunk_tokens=4,
                          overlap=1).orderBy("chunk_id").collect()
    # step 3: starts 0,3,6 -> ceil((10-1)/3)=3 chunks, last is full
    assert [(r.chunk_id, r.chunk_text, r.n_chunk_tokens) for r in out] == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
    ]
    # every token covered
    covered = set()
    for r in out:
        covered.update(r.chunk_text.split())
    assert covered == {f"w{i}" for i in range(10)}


def test_chunk_short_doc_emits_one_short_chunk(spark):
    out = chunk_documents(_docs(spark, [(1, "a b")]), chunk_tokens=40,
                          overlap=10).collect()
    assert [(r.chunk_id, r.chunk_text, r.n_chunk_tokens)
            for r in out] == [(0, "a b", 2)]


def test_chunk_null_and_empty_docs_emit_nothing(spark):
    out = chunk_documents(
        _docs(spark, [(1, None), (2, ""), (3, "   "), (4, "x")]),
        chunk_tokens=4, overlap=0).collect()
    assert [(r.doc_id, r.chunk_text) for r in out] == [(4, "x")]


def test_chunk_rejects_bad_params(spark):
    d = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(d, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, chunk_tokens=4, overlap=4)


def test_chunk_plan_is_shuffle_free(spark):
    """Chunking must stay map-only — a shuffle here would reshuffle the
    whole corpus for a per-row transform."""
    d = _docs(spark, [(1, "a b c")])
    plan = chunk_documents(d, chunk_tokens=2, overlap=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------------------- boilerplate

def test_strip_boilerplate_reassembles_in_order(spark):
    rows = [
        (1, "COOKIE BANNER TEXT\nreal content one\nfooter line xyz"),
        (2, "COOKIE BANNER TEXT\nreal content two\nfooter line xyz"),
        (3, "COOKIE BANNER TEXT\nunique middle\n-\nmore unique"),
    ]
    out = {r.doc_id: r for r in strip_boilerplate_lines(
        _docs(spark, rows), min_doc_freq=2, min_line_chars=4).collect()}
    assert out[1].text_clean == "real content one"
    assert out[2].text_clean == "real content two"
    # '-' is below min_line_chars: exempt from detection, always kept
    assert out[3].text_clean == "unique middle\n-\nmore unique"
    assert (out[1].n_lines, out[1].n_lines_kept) == (3, 1)


def test_strip_boilerplate_null_and_empty_text(spark):
    rows = [(1, None), (2, ""), (3, "a\na"), (4, "dup line here"),
            (5, "dup line here")]
    out = {r.doc_id: r for r in strip_boilerplate_lines(
        _docs(spark, rows), min_doc_freq=2, min_line_chars=4).collect()}
    assert out[1].text_clean is None
    assert (out[1].n_lines, out[1].n_lines_kept) == (0, 0)
    assert out[2].text_clean == "" and out[2].n_lines == 1
    # same line twice in ONE doc is not cross-document boilerplate
    assert out[3].text_clean == "a\na"
    # but the same line in two docs is
    assert out[4].text_clean == "" and out[4].n_lines_kept == 0


def test_flag_boilerplate_requires_sane_threshold(spark):
    ch = chunk_documents(_docs(spark, [(1, "a b")]), chunk_tokens=2)
    with pytest.raises(ValueError, match="min_doc_freq"):
        flag_boilerplate_lines(ch, "doc_id", "chunk_id", "chunk_text",
                               min_doc_freq=1)


def test_strip_boilerplate_custom_separator(spark):
    rows = [(1, "same seg|mine alone"), (2, "same seg|yours alone")]
    out = {r.doc_id: r for r in strip_boilerplate_lines(
        _docs(spark, rows), line_sep="|", min_doc_freq=2,
        min_line_chars=4).collect()}
    assert out[1].text_clean == "mine alone"
    assert out[2].text_clean == "yours alone"


# --------------------------------------------------------- contamination

def test_contamination_fractions(spark):
    from arlas_proc_spark.operators.corpus import contamination_report
    corpus = _docs(spark, [
        (1, "a b c d e"),          # shingles: abc bcd cde
        (2, "a b c x y"),          # abc bcx cxy -> 1 of 3 in benchmark
        (3, "p q r s"),            # none contaminated
        (4, "a b"),                # too short: 0 shingles
        (5, None),
    ])
    bench = _docs(spark, [(100, "a b c d e")])
    out = {r.doc_id: r for r in contamination_report(corpus, bench).collect()}
    assert (out[1].n_shingles, out[1].n_contaminated,
            out[1].contamination) == (3, 3, 1.0)
    assert (out[2].n_contaminated, out[2].contamination) == (1, 0.333333)
    assert out[3].n_contaminated == 0 and out[3].contamination == 0.0
    assert (out[4].n_shingles, out[4].contamination) == (0, 0.0)
    assert (out[5].n_shingles, out[5].contamination) == (0, 0.0)
    assert set(out) == {1, 2, 3, 4, 5}  # every doc reported


def test_contamination_broadcasts_benchmark(spark):
    """The corpus side must never shuffle: the benchmark shingle set is
    broadcast (eval suites are small; the corpus is 100 TB)."""
    from arlas_proc_spark.operators.corpus import contamination_report
    corpus = _docs(spark, [(1, "a b c d")])
    plan = contamination_report(corpus, corpus) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# -------------------------------------------------------------- repetition

def test_repetition_stats(spark):
    from arlas_proc_spark.operators.text import with_repetition_stats
    rows = [
        (1, "same\nsame\nother"),     # 3 lines, 2 distinct -> 1/3 dup
        (2, "a b a b a"),             # bigrams: ab ba ab ba -> 2/4 dup
        (3, "x y z"),                 # no repetition
        (4, ""),                      # 1 empty line, 0 bigrams
        (5, None),
    ]
    out = {r.doc_id: r for r in with_repetition_stats(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert (out[1].n_lines, out[1].dup_line_ratio) == (3, 0.333333)
    assert out[2].dup_2gram_ratio == 0.5
    assert (out[3].dup_line_ratio, out[3].dup_2gram_ratio) == (0.0, 0.0)
    assert (out[4].n_lines, out[4].dup_2gram_ratio) == (1, 0.0)
    assert out[5].n_lines is None and out[5].dup_line_ratio is None


def test_repetition_stats_is_shuffle_free(spark):
    from arlas_proc_spark.operators.text import with_repetition_stats
    d = _docs(spark, [(1, "x y")])
    plan = with_repetition_stats(d) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------------- pii

def test_scrub_pii_shapes(spark):
    rows = [
        (1, "mail bob.smith+x@sub.example.co.uk now"),
        (2, "server at 192.168.0.1 port 80"),
        (3, "card 4111111111111111 exp 12/26"),
        (4, "short 123456789012 stays"),       # 12 digits: below floor
        (5, "ver 1.2.3 stays, 1.2.3.4 goes"),
        (6, None),
    ]
    out = {r.doc_id: r.text_scrubbed
           for r in scrub_pii(_docs(spark, rows)).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> port 80"
    assert out[3] == "card <LONGNUM> exp 12/26"
    assert out[4] == "short 123456789012 stays"
    assert out[5] == "ver 1.2.3 stays, <IP> goes"
    assert out[6] is None


def test_scrub_pii_is_shuffle_free(spark):
    d = _docs(spark, [(1, "x")])
    plan = scrub_pii(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_chunks_invariants(spark):
    """Offset binning contract: every chunk's pack_offset is in
    [0, budget); within a (shard) pack, chunks are contiguous in
    (doc_id, chunk_id) order and offsets equal the running sum; a pack
    overflows its budget by at most its one straddling chunk."""
    from arlas_proc_spark.operators.corpus import chunk_documents, pack_chunks
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + (i * 37) % 90)))
         for i in range(200)], "doc_id long, text string")
    ch = chunk_documents(docs, "doc_id", "text", chunk_tokens=16, overlap=0)
    out = pack_chunks(ch, "doc_id", ("doc_id", "chunk_id"),
                      "n_chunk_tokens", budget=64, n_shards=4).collect()
    assert out
    by_pack = {}
    for r in out:
        assert 0 <= r.pack_offset < 64
        by_pack.setdefault(r.pack_id, []).append(r)
    for pid, rows in by_pack.items():
        rows.sort(key=lambda r: (r.doc_id, r.chunk_id))
        # offsets are the pack-local running sum in order
        run = rows[0].pack_offset
        for r in rows:
            assert r.pack_offset == run
            run += r.n_chunk_tokens
        # total overflow bounded by the last (straddling) chunk
        assert run - 64 <= rows[-1].n_chunk_tokens
    # a doc's chunks never split across shards
    shard_of = {}
    for r in out:
        s = r.pack_id.split("#")[0]
        assert shard_of.setdefault(r.doc_id, s) == s
    import pytest
    with pytest.raises(ValueError):
        pack_chunks(ch, budget=0)
    with pytest.raises(ValueError):
        pack_chunks(ch, n_shards=0)
