"""A/B experiment: 64M-event apply-probe under Arrow-batch / JVM / shuffle-buffer
variants. The apply path's CPU profile is (1) Arrow-batched pandas UDFs
(classify + sha256 + flatten), (2) two ~38 GB micro-batch shuffles, (3) bucketed
parquet MERGE writes. Candidate levers, one per variant:

  A  baseline           (engine defaults: arrow batch 10k rows, G1 GC, 32k buffers)
  B  arrow batch 64k    fewer Arrow batch boundaries per UDF call chain
  C  arrow batch 256k   same, coarser (risk: pandas peak memory per worker)
  D  ParallelGC         throughput collector vs G1 for shuffle-heavy young gen
  E  lz4 block 512k     bigger lz4 frames: better ratio + fewer JNI calls on shuffle IO
  F  shuffle buffers 1m spill/output buffered writes hit disk in 1 MB chunks

Runs INTERLEAVED (A,B,...,F per round) in fresh subprocesses, one at a time
(CLAUDE.md timing rule: never concurrent with any other Spark job). Samples are
EXPERIMENTS: CDC_BENCH_EXTRA_CONF keeps them out of BENCH/probes.jsonl; results
append to /tmp/ab_arrow_results.jsonl. JVM flags reach the driver JVM because
every probe is a fresh python process: pyspark's launch_gateway forwards builder
conf onto the spark-submit command line before the JVM starts.

Usage: python tools/ab_arrow_jvm.py [rounds=2] [n_events=64000000] [tags]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "A_base": {},
    "B_arrow64k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
    "C_arrow256k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "262144"},
    "D_parallelgc": {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"},
    "E_lz4block": {"spark.io.compression.lz4.blockSize": "512k"},
    "F_shufbuf": {"spark.shuffle.file.buffer": "1m",
                  "spark.shuffle.unsafe.file.output.buffer": "1m"},
}
RESULTS = "/tmp/ab_arrow_results.jsonl"


def run_probe(tag: str, conf: dict, n_events: int) -> dict:
    env = dict(os.environ)
    if conf:
        env["CDC_BENCH_EXTRA_CONF"] = json.dumps(conf)
    else:
        env.pop("CDC_BENCH_EXTRA_CONF", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--apply-probe",
         "32", str(n_events), f"/tmp/cdc_abj_{tag}", "2"],
        capture_output=True, text=True, timeout=5400, env=env)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            r = json.loads(line)
            rec = {"tag": tag, "conf": conf, "n_events": n_events,
                   "wall_sec": r["wall_sec"], "final_rows": r["final_rows"],
                   "events_per_sec": r["events_per_sec"], "ts": time.time()}
            with open(RESULTS, "a") as f:
                f.write(json.dumps(rec) + "\n")
            return rec
    raise RuntimeError(f"probe {tag} failed:\n{out.stderr[-1500:]}")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000_000
    tags = sys.argv[3].split(",") if len(sys.argv) > 3 else list(CONFIGS)
    for i in range(rounds):
        for tag, conf in ((t, CONFIGS[t]) for t in tags):
            r = run_probe(tag, conf, n_events)
            print(f"[{time.strftime('%H:%M:%S')}] r{i} {tag}: "
                  f"wall={r['wall_sec']} ev/s={r['events_per_sec']} "
                  f"rows={r['final_rows']}", flush=True)


if __name__ == "__main__":
    main()
