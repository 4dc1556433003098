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

import json
import os

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

# per-chunk decode-failure sentinel (reference: HmmProcessor.UNKNOWN_RESULT,
# ml/HmmProcessor.scala:50,82 — a failed predict labels the chunk Unknown
# instead of failing the job)
UNKNOWN_RESULT = "Unknown"


class HmmModelError(ValueError):
    """Model file missing or unparseable — raised at PLAN time, before any
    Spark job runs (reference: HmmProcessor.transform throws 'HMM model
    not found: ...', ml/HmmProcessor.scala:66-71, tested by
    HmmProcessorTest.scala:59-88)."""


def load_hmm_model(path: str) -> dict:
    """Load + validate an HMM model JSON file (reference
    ``MLModelLocal.getModelString``, model/MLModel.scala:30-35).

    Accepts BOTH the engine's Gaussian-emission format (states/start/
    trans/emission.means+stds) and the reference's binned-histogram
    format (states/bin_edges/emission_probability/init_probability/
    transition_probability — e.g. the reference's own
    hmm_stillmove_model.json loads unchanged). Returns the normalized
    internal dict."""
    if not os.path.exists(path):
        raise HmmModelError(
            f"HMM model not found: Input path does not exist: {path}")
    try:
        with open(path) as f:
            raw = json.load(f)
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        raise HmmModelError(f"HMM model not parseable: {path}: {e}") from e
    return normalize_hmm_model(raw, source=path)


def normalize_hmm_model(raw: dict, source: str = "<dict>") -> dict:
    """Validate and convert either supported model shape to the internal
    {states, start, trans, emission} dict."""
    try:
        states = list(raw["states"])
        if "bin_edges" in raw:
            return {
                "states": states,
                "start": [float(raw["init_probability"][s]) for s in states],
                "trans": [[float(raw["transition_probability"][si][sj])
                           for sj in states] for si in states],
                "emission": {
                    "bin_edges": [float(e) for e in raw["bin_edges"]],
                    "probs": [[float(p) for p in
                               raw["emission_probability"][s]]
                              for s in states],
                },
            }
        model = {"states": states, "start": raw["start"],
                 "trans": raw["trans"], "emission": raw["emission"]}
        if "bin_edges" not in model["emission"]:
            _ = model["emission"]["means"], model["emission"]["stds"]
        return model
    except (KeyError, TypeError) as e:
        raise HmmModelError(
            f"HMM model invalid: {source}: missing/bad field {e}") from e


def _log_emissions(values: np.ndarray, model: dict) -> np.ndarray:
    """(n, n_states) log emission probabilities; Gaussian or binned."""
    em = model["emission"]
    if "bin_edges" in em:
        edges = np.asarray(em["bin_edges"], dtype=float)
        probs = np.asarray(em["probs"], dtype=float)       # (m, n_bins)
        # reference format carries len(edges)+1 probabilities (under/
        # overflow buckets, indexed by digitize); a plain histogram
        # carries len(edges)-1 interior bins
        idx = np.searchsorted(edges, values, side="right")
        if probs.shape[1] == len(edges) - 1:
            idx = idx - 1
        idx = np.clip(idx, 0, probs.shape[1] - 1)
        with np.errstate(divide="ignore"):
            return np.log(probs[:, idx].T)                  # (n, m)
    means = np.asarray(em["means"], dtype=float)
    stds = np.asarray(em["stds"], dtype=float)
    obs = np.asarray(values, dtype=float).reshape(-1, 1)
    return (-0.5 * ((obs - means) / stds) ** 2
            - np.log(stds * np.sqrt(2 * np.pi)))


def viterbi_decode(values: np.ndarray, model: dict) -> list[str]:
    """Classic log-space Viterbi; Gaussian or binned-histogram emissions."""
    states = model["states"]
    n, m = len(values), len(states)
    if n == 0:
        return []
    with np.errstate(divide="ignore"):
        log_start = np.log(np.asarray(model["start"], dtype=float))
        log_trans = np.log(np.asarray(model["trans"], dtype=float))
    log_emit = _log_emissions(np.asarray(values, dtype=float), model)
    # memoryless fast path: when every transition ROW is identical, the
    # best previous state is the same whatever state follows, so the DP
    # decouples and the whole path is a vectorized per-row argmax of
    # (transition-row + emission) — no Python loop over timesteps. The
    # tempo models (uniform transitions = pure emission classifiers) and
    # any no-memory model take this branch; true sequential models fall
    # through to the classic DP below.
    if n > 1 and np.array_equal(
            log_trans, np.broadcast_to(log_trans[0], log_trans.shape)):
        idx = np.argmax(log_trans[0] + log_emit, axis=1)
        idx[0] = int(np.argmax(log_start + log_emit[0]))
        return [states[i] for i in idx]
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
                    model: dict | str | None = None, chunk_size: int = 5000,
                    out_col: str = "hmm_state") -> DataFrame:
    """Decode a hidden state per row, per key, in timestamp order.

    ``model``: an internal model dict, or a PATH to a model JSON file
    (loaded with reference error semantics at plan time — a bad path or
    bad JSON raises HmmModelError BEFORE any job runs). A decode failure
    inside a chunk labels that chunk ``Unknown`` rather than failing the
    job (reference: hmmPredictUDF's Failure branch,
    ml/HmmProcessor.scala:77-84).

    Chunking bounds group memory (reference: hmmWindowSize,
    ml/HmmProcessor.scala:46,101-104); each (key, chunk) group decodes
    independently, matching the reference's chunk-local semantics.
    """
    require_columns(df, id_col, ts_col, value_col)
    if isinstance(model, str):
        model = load_hmm_model(model)
    elif model is None:
        model = DEFAULT_MODEL
    else:
        model = normalize_hmm_model(model)
    w = Window.partitionBy(id_col).orderBy(ts_col)
    chunked = df.withColumn(
        "_chunk", F.floor((F.row_number().over(w) - 1) / F.lit(chunk_size)))
    out_schema = T.StructType(list(chunked.schema.fields) +
                              [T.StructField(out_col, T.StringType(), True)])

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        try:
            pdf[out_col] = viterbi_decode(pdf[value_col].to_numpy(), model)
        except Exception:
            pdf[out_col] = UNKNOWN_RESULT
        return pdf

    return (chunked.groupBy(id_col, "_chunk")
            .applyInPandas(decode, schema=out_schema)
            .drop("_chunk"))


def with_hmm_states_multi(df: DataFrame, id_col: str, ts_col: str,
                          value_col: str, models: dict[str, dict | str],
                          chunk_size: int = 5000) -> DataFrame:
    """Decode SEVERAL models over the same value series in ONE pass:
    one window sort, one shuffle, one Arrow round-trip — the frame
    crosses the Python boundary once however many models vote
    (``models``: output column → model dict or JSON path). Running
    ``with_hmm_states`` per model instead pays the dominant costs
    (sort + transfer) N times for the same rows; only the numpy Viterbi
    kernel is genuinely per-model."""
    require_columns(df, id_col, ts_col, value_col)
    resolved = {
        out: (load_hmm_model(m) if isinstance(m, str)
              else (DEFAULT_MODEL if m is None else normalize_hmm_model(m)))
        for out, m in models.items()}
    w = Window.partitionBy(id_col).orderBy(ts_col)
    chunked = df.withColumn(
        "_chunk", F.floor((F.row_number().over(w) - 1) / F.lit(chunk_size)))
    out_schema = T.StructType(
        list(chunked.schema.fields)
        + [T.StructField(out, T.StringType(), True) for out in resolved])

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        vals = pdf[value_col].to_numpy()
        for out, model in resolved.items():
            try:
                pdf[out] = viterbi_decode(vals, model)
            except Exception:
                pdf[out] = UNKNOWN_RESULT
        return pdf

    return (chunked.groupBy(id_col, "_chunk")
            .applyInPandas(decode, schema=out_schema)
            .drop("_chunk"))
