"""Sequential-algorithm-inside-parallel-engine: chunked Viterbi decoding.

Reference: ``ml/HmmProcessor.scala:62-158`` (EP3 in SURVEY §3) — the
reference bounds each key's series into ``hmmWindowSize`` chunks
(row_number/floor), collapses a chunk to one row carrying collect_list of
values, runs Viterbi in a JVM UDF, explodes predictions back and
mode-votes per row. That shape exists because Spark 3.1 Scala lacked
grouped-map ergonomics; in PySpark the idiomatic form is ONE
``applyInPandas`` over (key, chunk) groups: Arrow ships the whole group to
a numpy kernel, no collapse/explode/join-back.

The chunking (``chunk = floor(row_number / window)``) is the bounded-state
trick we reuse for any per-key sequential kernel: group size is capped, so
a hot key cannot OOM an executor — the salting story for ordered
computation.

The HMM model is a plain dict (states, log trans matrix, gaussian
emissions), broadcast by closure capture — the analog of the reference
shipping the model JSON as a literal column (``ml/HmmProcessor.scala:130``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns

# a default 2-state still/move model over a scalar observable (e.g. speed)
DEFAULT_MODEL = {
    "states": ["STILL", "MOVE"],
    "start": [0.5, 0.5],
    "trans": [[0.9, 0.1], [0.1, 0.9]],
    "emission": {"means": [0.5, 10.0], "stds": [1.0, 5.0]},
}


def viterbi_decode(values: np.ndarray, model: dict) -> list[str]:
    """Classic log-space Viterbi with Gaussian emissions."""
    states = model["states"]
    n, m = len(values), len(states)
    if n == 0:
        return []
    means = np.asarray(model["emission"]["means"], dtype=float)
    stds = np.asarray(model["emission"]["stds"], dtype=float)
    log_start = np.log(np.asarray(model["start"], dtype=float))
    log_trans = np.log(np.asarray(model["trans"], dtype=float))
    obs = np.asarray(values, dtype=float).reshape(-1, 1)
    log_emit = (-0.5 * ((obs - means) / stds) ** 2
                - np.log(stds * np.sqrt(2 * np.pi)))
    dp = np.zeros((n, m))
    back = np.zeros((n, m), dtype=int)
    dp[0] = log_start + log_emit[0]
    for t in range(1, n):
        cand = dp[t - 1][:, None] + log_trans
        back[t] = np.argmax(cand, axis=0)
        dp[t] = cand[back[t], np.arange(m)] + log_emit[t]
    path = np.zeros(n, dtype=int)
    path[-1] = int(np.argmax(dp[-1]))
    for t in range(n - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return [states[i] for i in path]


def with_hmm_states(df: DataFrame, id_col: str, ts_col: str, value_col: str,
                    model: dict | None = None, chunk_size: int = 5000,
                    out_col: str = "hmm_state") -> DataFrame:
    """Decode a hidden state per row, per key, in timestamp order.

    Chunking bounds group memory (reference: hmmWindowSize,
    ml/HmmProcessor.scala:46,101-104); each (key, chunk) group decodes
    independently, matching the reference's chunk-local semantics.
    """
    require_columns(df, id_col, ts_col, value_col)
    model = model or DEFAULT_MODEL
    w = Window.partitionBy(id_col).orderBy(ts_col)
    chunked = df.withColumn(
        "_chunk", F.floor((F.row_number().over(w) - 1) / F.lit(chunk_size)))
    out_schema = T.StructType(list(chunked.schema.fields) +
                              [T.StructField(out_col, T.StringType(), True)])

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        pdf[out_col] = viterbi_decode(pdf[value_col].to_numpy(), model)
        return pdf

    return (chunked.groupBy(id_col, "_chunk")
            .applyInPandas(decode, schema=out_schema)
            .drop("_chunk"))
