"""A/B/C experiment: 64M-event apply-probe under compression-codec variants.

Hypothesis: the apply path is IO-heavy on both sides — the lake MERGE
rewrites bucketed parquet files (write-side) and the shuffle moves ~38 GB
per large micro-batch (transfer-side). On a CPU-stealing host the trade is
not obvious in either direction:

  A  baseline        (parquet=snappy, shuffle io=lz4 — Spark defaults)
  B  parquet zstd    (smaller lake files: less write/read IO, more CPU)
  C  shuffle io zstd (smaller shuffle blocks: less spill IO, more CPU)

Runs INTERLEAVED (A,B,C, A,B,C, ...) in fresh subprocesses, one at a time
(CLAUDE.md timing rule). Samples are EXPERIMENTS: CDC_BENCH_EXTRA_CONF keeps
them out of BENCH/probes.jsonl; results land in /tmp/abcodec_results.jsonl.

Usage: python tools/ab_codec.py [rounds=2] [n_events=64000000]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "A_base": {},
    "B_pq_zstd": {"spark.sql.parquet.compression.codec": "zstd"},
    "C_io_zstd": {"spark.io.compression.codec": "zstd"},
    "D_both_zstd": {"spark.sql.parquet.compression.codec": "zstd",
                    "spark.io.compression.codec": "zstd"},
}
RESULTS = "/tmp/abcodec_results.jsonl"


def run_probe(tag: str, conf: dict, n_events: int) -> dict:
    env = dict(os.environ)
    if conf:
        env["CDC_BENCH_EXTRA_CONF"] = json.dumps(conf)
    else:
        env.pop("CDC_BENCH_EXTRA_CONF", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--apply-probe",
         "32", str(n_events), f"/tmp/cdc_abc_{tag}", "1"],
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
