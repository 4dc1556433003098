"""Property-based checks for the corpus operators against independent
pandas/pure-Python reference implementations: ANY document set, ANY
(chunk_tokens, overlap) — chunking covers every token in order with the
exact overlap pattern, and boilerplate stripping keeps exactly the lines
a brute-force doc-frequency count says it should."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arlas_proc_spark.operators.corpus import (
    chunk_documents,
    strip_boilerplate_lines,
)

WORDS = ["aa", "b", "cc0", "ä", "x,y"]  # incl. unicode + punctuation


@st.composite
def doc_sets(draw):
    n_docs = draw(st.integers(min_value=1, max_value=6))
    docs = []
    for i in range(n_docs):
        kind = draw(st.sampled_from(["words", "empty", "spaces", "null"]))
        if kind == "null":
            docs.append((i, None))
        elif kind == "empty":
            docs.append((i, ""))
        elif kind == "spaces":
            docs.append((i, "   "))
        else:
            toks = draw(st.lists(st.sampled_from(WORDS), min_size=1,
                                 max_size=25))
            docs.append((i, " ".join(toks)))
    return docs


def _ref_chunks(text, chunk, overlap):
    """Pure-Python reference chunker."""
    if text is None:
        return []
    toks = text.split()
    if not toks:
        return []
    step = chunk - overlap
    n_chunks = max(-(-(len(toks) - overlap) // step), 1)
    return [(c, " ".join(toks[c * step:c * step + chunk]),
             min(len(toks) - c * step, chunk)) for c in range(n_chunks)]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=doc_sets(), chunk=st.integers(1, 8), overlap=st.integers(0, 7))
def test_chunking_matches_reference(spark, docs, chunk, overlap):
    if overlap >= chunk:
        overlap = chunk - 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=chunk,
                             overlap=overlap).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_text, r.n_chunk_tokens))
    for doc_id, text in docs:
        assert sorted(got.get(doc_id, [])) == _ref_chunks(
            text, chunk, overlap), (doc_id, text, chunk, overlap)


LINES = ["dup line one", "dup line two", "unique %d", "-", ""]


@st.composite
def line_docs(draw):
    n_docs = draw(st.integers(min_value=1, max_value=6))
    docs = []
    for i in range(n_docs):
        n_lines = draw(st.integers(min_value=0, max_value=6))
        ls = []
        for j in range(n_lines):
            pick = draw(st.sampled_from(LINES))
            ls.append(pick % (i * 10 + j) if "%d" in pick else pick)
        docs.append((i, "\n".join(ls) if ls else
                     draw(st.sampled_from([None, ""]))))
    return docs


def _ref_strip(docs, min_doc_freq, min_chars):
    """Brute-force reference: doc-frequency over trimmed eligible lines."""
    from collections import defaultdict
    freq = defaultdict(set)
    for doc_id, text in docs:
        if text is None:
            continue
        for ln in text.split("\n"):
            if len(ln.strip()) >= min_chars:
                freq[ln.strip()].add(doc_id)
    boiler = {ln for ln, ids in freq.items() if len(ids) >= min_doc_freq}
    out = {}
    for doc_id, text in docs:
        if text is None:
            out[doc_id] = (None, 0, 0)
            continue
        lines = text.split("\n")
        kept = [ln for ln in lines
                if not (len(ln.strip()) >= min_chars
                        and ln.strip() in boiler)]
        out[doc_id] = ("\n".join(kept), len(lines), len(kept))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=line_docs(), k=st.integers(2, 3), min_chars=st.integers(1, 5))
def test_boilerplate_strip_matches_reference(spark, docs, k, min_chars):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.text_clean, r.n_lines, r.n_lines_kept)
           for r in strip_boilerplate_lines(
               df, min_doc_freq=k, min_line_chars=min_chars).collect()}
    assert got == _ref_strip(docs, k, min_chars), (docs, k, min_chars)
