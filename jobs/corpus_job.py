"""spark-submit entrypoint: assemble a training corpus from a documents
table — the operational wrapper over the LLM-pipeline operators
(normalize → quality gate → exact dedup → deterministic sample).

Cluster usage:

    cd /root/repo && zip -r /tmp/arlas_proc_spark.zip arlas_proc_spark
    spark-submit --py-files /tmp/arlas_proc_spark.zip jobs/corpus_job.py \
        --docs hdfs:///corpus/documents --out hdfs:///corpus/train \
        --min-quality 0.8 --per-lang 1000000

Local (sandbox) usage:

    python jobs/corpus_job.py --docs /root/testdata/sf0.01/documents.parquet \
        --out /tmp/corpus --min-quality 0.95 --per-lang 50

Every stage is deterministic (md5-of-identity sampling, min-doc_id
canonical dedup), so re-running over the same input reproduces the same
corpus byte-for-byte — the property df.sample() cannot give. Stages are
skipped when their knob is unset; the printed JSON reports row counts
entering/leaving each stage (all counts ride one pass per stage
boundary, no extra scans beyond the stage structure itself).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.operators.sampling import (  # noqa: E402
    sample_bernoulli,
    sample_stratified,
)
from arlas_proc_spark.operators.text import (  # noqa: E402
    normalize_text,
    with_text_stats,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="parquet path of the documents table "
                         "(doc_id, text, lang, ...)")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--normalize", action="store_true",
                    help="NFC + control strip + whitespace collapse on "
                         "text before scoring")
    ap.add_argument("--min-quality", type=float, default=None,
                    help="drop docs with quality_score below this")
    ap.add_argument("--dedup", action="store_true",
                    help="exact dedup: keep min doc_id per sha256(text)")
    ap.add_argument("--per-lang", type=int, default=None,
                    help="deterministic per-language quota")
    ap.add_argument("--fraction", type=float, default=None,
                    help="deterministic Bernoulli keep-fraction (md5 of "
                         "doc_id; applied after the quota)")
    ap.add_argument("--salt", default="", help="resample salt")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import Observation

    spark = build_session(app_name="corpus-assembly", master=args.master)
    df = spark.read.parquet(args.docs)
    # Stage-boundary counts ride the ONE write action as CollectMetrics
    # nodes (df.observe) — a .count() per stage would re-run the whole
    # upstream chain (parquet scan + NFC UDF + quality regexes) once per
    # boundary, multiplying job cost at corpus scale.
    obs: dict[str, Observation] = {}

    def _observe(frame, name):
        obs[name] = Observation(name)
        return frame.observe(obs[name], F.count(F.lit(1)).alias("n"))

    df = _observe(df, "docs_in")
    text_col = "text"
    if args.normalize:
        df = normalize_text(df, out_col="text")  # replace in place
    if args.min_quality is not None:
        df = (with_text_stats(df, text_col)
              .where(F.col("quality_score") >= args.min_quality))
        df = _observe(df, "after_quality")
    if args.dedup:
        # sha2(NULL) is NULL: a null-text doc must pass through untouched,
        # not collapse into one bogus "duplicate" group with every other
        # null-text doc (same trap operators/dedup_fuzzy.exact_duplicates
        # guards). Keying nulls by their own doc_id keeps them singleton
        # AND avoids shuffling every null doc into one skewed partition.
        dedup_key = F.coalesce(
            F.sha2(F.col(text_col), 256),
            F.concat(F.lit("null#"), F.col("doc_id").cast("string")))
        w = Window.partitionBy(dedup_key).orderBy("doc_id")
        df = (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1).drop("_rn"))
        df = _observe(df, "after_dedup")
    if args.per_lang is not None:
        df = sample_stratified(df, ["lang"], args.per_lang, ["doc_id"],
                               salt=args.salt)
    if args.fraction is not None:
        df = sample_bernoulli(df, args.fraction, ["doc_id"], salt=args.salt)
    df = _observe(df, "docs_out")
    df.write.mode("overwrite").parquet(args.out)
    report = {name: o.get["n"] for name, o in obs.items()}
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
