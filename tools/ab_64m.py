"""A/B/C experiment: 64M-event apply-probe under shuffle-sizing variants.

Hypothesis (input-linearity investigation): the probe session pins
spark.sql.shuffle.partitions = cores*2 = 64; at 64M events x ~1.2 KB each,
one micro-batch shuffles ~38 GB -> ~600 MB per shuffle partition — spill
territory. Candidate fixes:

  A  pre-r3 baseline   (shuffle=64, initialPartitionNum FORCED back to 64 —
                        since session.py made init=max(8*shuffle, 256) the
                        ENGINE DEFAULT, an empty conf would silently run the
                        same plan as B and the A/B would measure nothing)
  B  initialPartitionNum=512  (AQE splits fine, coalesces small stages back
                        — this is the engine default being validated)
  C  shuffle.partitions=256 + init forced 256 (flat raise, no AQE fine-split)

Runs INTERLEAVED (A,B,C, A,B,C, ...) in fresh subprocesses, one at a time
(CLAUDE.md timing rule). Samples are EXPERIMENTS: CDC_BENCH_EXTRA_CONF keeps
them out of BENCH/probes.jsonl; results land in /tmp/ab64m_results.jsonl.

Usage: python tools/ab_64m.py [rounds=2] [n_events=64000000]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "A_base": {
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "64"},
    "B_init512": {
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "512"},
    "C_flat256": {
        "spark.sql.shuffle.partitions": "256",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256"},
}
RESULTS = "/tmp/ab64m_results.jsonl"


def run_probe(tag: str, conf: dict, n_events: int) -> dict:
    env = dict(os.environ)
    if conf:
        env["CDC_BENCH_EXTRA_CONF"] = json.dumps(conf)
    else:
        env.pop("CDC_BENCH_EXTRA_CONF", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--apply-probe",
         "32", str(n_events), f"/tmp/cdc_ab_{tag}", "1"],
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
    for i in range(rounds):
        for tag, conf in CONFIGS.items():
            r = run_probe(tag, conf, n_events)
            print(f"[{time.strftime('%H:%M:%S')}] r{i} {tag}: "
                  f"wall={r['wall_sec']} ev/s={r['events_per_sec']} "
                  f"rows={r['final_rows']}", flush=True)
    best: dict = {}
    for line in open(RESULTS):
        r = json.loads(line)
        if r["n_events"] != n_events:
            continue
        if r["tag"] not in best or r["wall_sec"] < best[r["tag"]]["wall_sec"]:
            best[r["tag"]] = r
    print(json.dumps({t: {"wall": b["wall_sec"], "evps": b["events_per_sec"],
                          "rows": b["final_rows"]}
                      for t, b in sorted(best.items())}, indent=2))


if __name__ == "__main__":
    main()
