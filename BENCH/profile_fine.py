"""Fine-grained serial-fraction hunt: times each cumulative sub-plan of the
replay path so the Amdahl term (constant seconds regardless of cores) can be
attributed to a specific stage. Interleaved, min-of-reps, one JVM per level."""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
from arlas_proc_spark.config import build_session
from arlas_proc_spark.cdc.engine import CdcEngine, lww_compact, prepare_events
from arlas_proc_spark.sources.changefeed import changefeed_df
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); N = int(sys.argv[2]); reps = int(sys.argv[3])
GEN = dict(n_repos=200, files_per_repo=2000)
spark = build_session(master=f"local[{cpus}]", shuffle_partitions=cpus)
feed = changefeed_df(spark, N, parallelism=cpus * 2, **GEN)
KEY = ["repo", "path"]

def noop(df): df.write.format("noop").mode("overwrite").save()

def argmax():
    return feed.groupBy(*KEY).agg(F.max("seq").alias("seq"))

def joined():
    return feed.join(F.broadcast(argmax()), on=[*KEY, "seq"], how="inner")

stages = {
    "gen": lambda: noop(feed),
    "argmax_only": lambda: noop(argmax()),
    "join_no_distinct": lambda: noop(joined()),
    "compact": lambda: noop(lww_compact(feed)),
    "compact_sha": lambda: noop(prepare_events(lww_compact(feed))),
}
def full_replay():
    tmp = tempfile.mkdtemp()
    eng = CdcEngine(spark, tmp + "/t", n_buckets=cpus, collect_metrics=False)
    t0 = time.time()
    eng.replay(feed)
    dt = time.time() - t0
    shutil.rmtree(tmp, ignore_errors=True)
    return dt

for f in stages.values(): f()
full_replay()

best = {k: 1e9 for k in stages}; best["replay"] = 1e9
for r in range(reps):
    for k, f in stages.items():
        t0 = time.time(); f(); best[k] = min(best[k], time.time() - t0)
    best["replay"] = min(best["replay"], full_replay())
print("RESULT " + json.dumps({k: round(v, 2) for k, v in best.items()}))
spark.stop()
"""

def run(cpus, n, reps=2):
    out = subprocess.run([sys.executable, "-c", CHILD, str(cpus), str(n), str(reps)],
                         capture_output=True, text=True, timeout=3600)
    for ln in out.stdout.splitlines():
        if ln.startswith("RESULT "):
            return json.loads(ln[7:])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48_000_000
    levels = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else (8, 32))]
    for cpus in levels:
        print(cpus, json.dumps(run(cpus, n)))
