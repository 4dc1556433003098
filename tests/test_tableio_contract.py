"""TableIO contract suite (lake/io.py): the semantics every backend must
honor, exercised ONLY through the TableIO interface so the bundled
LakeTable (Plan B) and the Iceberg runtime backend (Plan A,
lake/iceberg.py) are graded by the same tests.

The Iceberg backend auto-skips when no Iceberg runtime is on the
classpath (this sandbox has no network to fetch the jar — r2 VERDICT
Next #4 scoped Plan A to "contract suite + honest docs" in that case);
run with ``--packages org.apache.iceberg:iceberg-spark-runtime-...`` and
a configured catalog to exercise both rows of the matrix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.iceberg import IcebergTableIO, iceberg_available
from arlas_proc_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])

KEYS = ["repo", "path"]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string,"
        " commit string, content string"
    ).select("repo", "path", "commit", "seq", "content", "op")


@pytest.fixture(params=["laketable", "iceberg"])
def tio(request, spark, tmp_path):
    if request.param == "laketable":
        return LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS,
                                "seq", n_buckets=4)
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime not on the classpath (no jar in "
                    "this sandbox; see module docstring)")
    ident = f"local.db.contract_{abs(hash(str(tmp_path))) % 10**9}"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    from arlas_proc_spark.lake.iceberg import create_table_sql
    spark.sql(create_table_sql(
        ident, "repo string, path string, commit string, seq bigint,"
        " content string", KEYS, 4))
    return IcebergTableIO(spark, ident, key_cols=KEYS, seq_col="seq",
                          n_buckets=4)


def _state(tio):
    return {(r.repo, r.path): (r.seq, r.content)
            for r in tio.read().collect()}


def test_keyed_lww_upsert_and_delete(spark, tio):
    tio.merge_batch(_batch(spark, [
        (1, "insert", "r1", "a.py", "c1", "v1"),
        (2, "insert", "r1", "b.py", "c2", "w1"),
        (3, "update", "r1", "a.py", "c3", "v2"),   # in-batch LWW
    ]), 0)
    assert _state(tio) == {("r1", "a.py"): (3, "v2"),
                           ("r1", "b.py"): (2, "w1")}
    tio.merge_batch(_batch(spark, [
        (4, "delete", "r1", "b.py", "c4", None),
        (5, "update", "r1", "a.py", "c5", "v3"),
    ]), 1)
    assert _state(tio) == {("r1", "a.py"): (5, "v3")}


def test_stale_events_lose(spark, tio):
    tio.merge_batch(_batch(spark, [
        (9, "insert", "r1", "a.py", "c9", "new"),
    ]), 0)
    tio.merge_batch(_batch(spark, [
        (3, "update", "r1", "a.py", "c3", "stale"),
    ]), 1)
    assert _state(tio) == {("r1", "a.py"): (9, "new")}


def test_exactly_once_replayed_batch_skips(spark, tio):
    b = _batch(spark, [(1, "insert", "r1", "a.py", "c1", "v1")])
    tio.merge_batch(b, 0)
    res = tio.merge_batch(_batch(spark, [
        (2, "update", "r1", "a.py", "c2", "SHOULD NOT APPLY"),
    ]), 0)  # same batch id -> replay
    assert res.get("skipped") is True
    assert _state(tio) == {("r1", "a.py"): (1, "v1")}


def test_empty_batch_commit_and_replay(spark, tio):
    r1 = tio.commit_empty_batch(0)
    assert r1.get("empty") or not r1.get("skipped")
    r2 = tio.commit_empty_batch(0)
    assert r2.get("skipped") is True
    assert _state(tio) == {}


def test_ledger_scopes_are_independent(spark, tio):
    tio.merge_batch(_batch(spark, [
        (1, "insert", "r1", "a.py", "c1", "v1"),
    ]), 0, ledger_scope="streamA")
    tio.merge_batch(_batch(spark, [
        (2, "update", "r1", "a.py", "c2", "v2"),
    ]), 0, ledger_scope="streamB")  # same id, different scope -> applies
    assert _state(tio) == {("r1", "a.py"): (2, "v2")}


def test_snapshot_and_lineage_surface(spark, tio):
    tio.merge_batch(_batch(spark, [
        (1, "insert", "r1", "a.py", "c1", "v1"),
    ]), 0)
    snap = tio.snapshot()
    assert isinstance(snap, dict) and snap
    assert isinstance(tio.lineage(), list)


def test_rename_column_contract(spark, tio):
    """Both backends rename metadata-only: values survive under the new
    name, later batches use the new name, old name is gone."""
    tio.merge_batch(_batch(spark, [
        (1, "insert", "r", "a.py", "c1", "v1")]), 0)
    tio.rename_column("content", "source_text")
    st = tio.read()
    assert "source_text" in st.columns and "content" not in st.columns
    assert {r.source_text for r in st.collect()} == {"v1"}
    b = (_batch(spark, [(2, "update", "r", "a.py", "c2", "v2")])
         .withColumnRenamed("content", "source_text"))
    tio.merge_batch(b, 1)
    assert {r.source_text for r in tio.read().collect()} == {"v2"}


def test_drop_column_contract(spark, tio):
    """Both backends drop metadata-only: the column vanishes from reads,
    other columns keep their values, and a later batch re-using the name
    evolves it in as a BRAND-NEW column — rows untouched since before
    the drop read NULL, never the old bytes (field-id semantics)."""
    tio.merge_batch(_batch(spark, [
        (1, "insert", "r", "a.py", "c1", "v1"),
        (2, "insert", "r", "b.py", "c2", "v2")]), 0)
    tio.drop_column("content")
    st = tio.read()
    assert "content" not in st.columns
    assert {(r.repo, r.path, r.commit) for r in st.collect()} == {
        ("r", "a.py", "c1"), ("r", "b.py", "c2")}
    # re-add by a later batch: only the touched key carries a value
    tio.merge_batch(_batch(spark, [
        (3, "update", "r", "a.py", "c3", "fresh")]), 1)
    got = {(r.repo, r.path): r.content for r in tio.read().collect()}
    assert got == {("r", "a.py"): "fresh", ("r", "b.py"): None}


def test_delete_where_contract(spark, tio):
    """Predicate deletes: matching live rows disappear in one commit;
    the same batch id replays as a no-op."""
    tio.merge_batch(_batch(spark, [
        (i, "insert", "r", f"f{i}.py", f"c{i}",
         "keep" if i % 2 else "drop") for i in range(6)]), 0)
    tio.delete_where("content = 'drop'", "ret-1")
    assert {r.content for r in tio.read().collect()} == {"keep"}
    r2 = tio.delete_where("content = 'drop'", "ret-1")
    assert r2.get("skipped") is True
    assert tio.read().count() == 3
