"""Deterministic, scale-free change-feed generator (binlog/WAL analog).

Emits repo-file change events ``(seq, op, repo, path, commit, ts_s, lang,
content)`` keyed by ``(repo, path)`` and ordered by ``seq`` (the binlog
position). The generator is a pure SQL expression over ``range(n)``:

- it never materializes on the driver, so it streams to 10^10 events
  (Spark's ``range`` TVF splits across executors);
- the *same* SQL text (modulo a 2-token dialect substitution) runs in DuckDB,
  which is how the correctness oracle reproduces the feed bit-for-bit.

Determinism comes from a Lehmer / minimal-standard LCG (public-domain
constants 48271 / 16807 / 69621, modulus 2^31-1) — chosen because 64-bit
modular arithmetic is exactly portable between Spark (ANSI mode, no
overflow) and DuckDB.

Skew is deliberate: ``hot_pct`` % of all events hit ``repo_0000`` (the
hot-repo case the north rule requires us to defuse). Duplicate delivery is
deliberate too: events with ``h1 % 17 == 0`` are emitted twice (at-least-once
feed), exercising dedup by (key, commit).

Reference analog: the raw AIS CSV source + ``DataFrameFormatter`` dedup
(``/root/reference/src/main/scala/io/arlas/data/tools/DataFrameFormatter.scala:40-49``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime), Lehmer modulus

# languages arrive dirty on purpose; normalize_lang canonicalizes them
_LANGS = [
    "Python", "python", "PY", "Java", "java ", "Scala",
    "scala", "Go", "RUST", "rust", " C++ ", "c++",
]


def _body(n_events: int, n_repos: int, files_per_repo: int, hot_pct: int,
          dup_mod: int, sha_fn: str, with_dups: bool) -> str:
    """Shared SQL body; ``sha_fn`` is 'sha2' (Spark) or 'sha256' (DuckDB)."""
    if n_repos < 2:
        raise ValueError(
            "n_repos must be >= 2: repo_0000 is the dedicated hot repo and "
            "the cold repos draw from the remaining n_repos-1 "
            "(n_repos=1 would divide by zero in the cold-repo modulo)")
    lang_case = "CASE " + " ".join(
        f"WHEN h3 % {len(_LANGS)} = {i} THEN '{v}'" for i, v in enumerate(_LANGS)
    ) + " END"
    sha = (
        f"{sha_fn}(concat('c', cast(seq AS string)), 256)"
        if sha_fn == "sha2"
        else "sha256(concat('c', cast(seq AS varchar)))"
    )
    str_t = "string" if sha_fn == "sha2" else "varchar"
    base = f"""
SELECT
  seq,
  CASE WHEN opc = 0 THEN 'delete'
       WHEN opc <= 2 THEN 'insert'
       ELSE 'update' END AS op,
  CASE WHEN h1 % 100 < {hot_pct} THEN 'repo_0000'
       ELSE concat('repo_', lpad(cast(1 + (h2 % {n_repos - 1}) AS {str_t}), 4, '0'))
  END AS repo,
  concat('src/f_', lpad(cast(h3 % {files_per_repo} AS {str_t}), 5, '0'), '.py') AS path,
  substr({sha}, 1, 12) AS commit,
  cast(1700000000 + seq AS bigint) AS ts_s,
  {lang_case} AS lang,
  concat('def fn_', cast(h3 % {files_per_repo} AS {str_t}),
         '(): return ', cast(h2 AS {str_t})) AS content,
  h1
FROM (
  SELECT seq,
         ((seq % {MOD}) * 48271 % {MOD}) AS h1,
         (((seq % {MOD}) * 48271 % {MOD}) * 16807 % {MOD}) AS h2,
         (((seq % {MOD}) * 48271 % {MOD}) * 69621 % {MOD}) AS h3,
         (((seq % {MOD}) * 48271 % {MOD}) * 16807 % {MOD}) % 10 AS opc
  FROM __RANGE__
)"""
    if with_dups:
        # at-least-once delivery: every 17th h1 event is delivered twice
        return (f"SELECT seq, op, repo, path, commit, ts_s, lang, content FROM ({base}) e\n"
                f"UNION ALL\n"
                f"SELECT seq, op, repo, path, commit, ts_s, lang, content FROM ({base}) d "
                f"WHERE h1 % {dup_mod} = 0")
    return f"SELECT seq, op, repo, path, commit, ts_s, lang, content FROM ({base}) e"


def changefeed_sql(n_events: int, *, n_repos: int = 50, files_per_repo: int = 200,
                   hot_pct: int = 30, dup_mod: int = 17, dialect: str = "duckdb",
                   with_dups: bool = True, slices: int | None = None,
                   start: int = 0) -> str:
    """SQL producing the change feed; dialect ∈ {'spark', 'duckdb'}.

    ``slices`` (spark only) sets the range TVF's split count so generation
    parallelizes WITHOUT a repartition shuffle — at 10^10 events a
    repartition of the generated feed would be a multi-TB disk shuffle.

    ``start`` scopes generation to seqs [start, n_events): every event is
    a pure function of its seq (the LCG is seq-local), so any sub-range
    regenerates independently — a WAL-segment writer generates each
    segment in O(segment), never rescanning the whole feed."""
    sha_fn = "sha2" if dialect == "spark" else "sha256"
    body = _body(n_events, n_repos, files_per_repo, hot_pct, dup_mod, sha_fn, with_dups)
    if dialect == "spark":
        rng = (f"(SELECT id AS seq FROM range({start}, {n_events}, 1, {slices}))"
               if slices else
               f"(SELECT id AS seq FROM range({start}, {n_events}))")
    else:
        rng = f"(SELECT range AS seq FROM range({start}, {n_events}))"
    return body.replace("__RANGE__", rng)


def changefeed_df(spark: SparkSession, n_events: int, *, n_repos: int = 50,
                  files_per_repo: int = 200, hot_pct: int = 30, dup_mod: int = 17,
                  with_dups: bool = True, parallelism: int | None = None,
                  start: int = 0) -> DataFrame:
    """The change feed as a lazy Spark DataFrame (never driver-materialized).
    ``parallelism`` maps to range-TVF slices (shuffle-free split);
    ``start`` scopes to seqs [start, n_events)."""
    sql = changefeed_sql(n_events, n_repos=n_repos, files_per_repo=files_per_repo,
                         hot_pct=hot_pct, dup_mod=dup_mod, dialect="spark",
                         with_dups=with_dups, slices=parallelism, start=start)
    return spark.sql(sql)


def final_state_sql(n_events: int, *, n_repos: int = 50, files_per_repo: int = 200,
                    hot_pct: int = 30, dup_mod: int = 17, dialect: str = "duckdb",
                    with_dups: bool = True) -> str:
    """Batch oracle: replay the feed → convergent final table state.

    Last-writer-wins by seq per (repo, path); delete winners drop the key.
    Includes the per-row sha256(content) invariant column.
    """
    feed = changefeed_sql(n_events, n_repos=n_repos, files_per_repo=files_per_repo,
                          hot_pct=hot_pct, dup_mod=dup_mod, dialect=dialect,
                          with_dups=with_dups)
    sha = ("sha2(content, 256)" if dialect == "spark" else "sha256(content)")
    return f"""
SELECT repo, path, commit, seq, ts_s, lang, content, {sha} AS content_sha256
FROM (
  SELECT *, row_number() OVER (PARTITION BY repo, path ORDER BY seq DESC, commit DESC) AS rn
  FROM ({feed}) feed
) ranked
WHERE rn = 1 AND op <> 'delete'
"""


def write_changefeed_batches(spark: SparkSession, out_dir: str, n_events: int,
                             n_batches: int, **gen_kw) -> list[str]:
    """Materialize the feed as ordered parquet micro-batch files (the 'WAL
    segment directory' a Structured Streaming file source tails).

    Each batch b holds seqs [b*sz, (b+1)*sz); files are written one at a
    time so a file-source stream discovers them in order. Each segment's
    job GENERATES only its own seq range (the feed is a pure function of
    seq), so total work is O(n_events) — the earlier formulation filtered
    the full feed once per batch, O(n_events × n_batches).
    """
    os.makedirs(out_dir, exist_ok=True)
    sz = (n_events + n_batches - 1) // n_batches
    paths = []
    for b in range(n_batches):
        part = changefeed_df(spark, min((b + 1) * sz, n_events),
                             start=b * sz, **gen_kw)
        p = os.path.join(out_dir, f"batch_{b:05d}")
        part.coalesce(1).write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths
