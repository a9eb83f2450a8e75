"""Round-3 evidence campaign (VERDICT r2 item 1 + 3): accumulate interleaved
probe samples across configs/shapes so minima estimate capability, not
weather — fresh 16M local[32] headline samples, 64M input-linearity samples,
one 128M point, and extra hot-skew rounds. Probes run STRICTLY sequentially
(never concurrent with each other or any other Spark job — timing rule in
CLAUDE.md); each runs in a fresh subprocess (fresh JVM, warm-up inside).

Usage: python tools/probe_campaign.py [rounds]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def apply_probe(cores: int, n_events: int, repeats: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--apply-probe",
         str(cores), str(n_events), f"/tmp/cdc_camp_{cores}_{n_events}",
         str(repeats)],
        capture_output=True, text=True, timeout=5400,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            r = json.loads(line)
            bench._record_probe(r, n_events)
            return r
    raise RuntimeError(f"probe failed ({cores}, {n_events}):\n"
                       f"{out.stderr[-1500:]}")


def skew_probe(salt: int) -> dict:
    r = bench._skew_subprocess(32, 16_000_000, salt,
                               "/tmp/cdc_skew_log_16000000",
                               f"/tmp/cdc_camp_skew_{salt}")
    with open(bench.SKEW_HISTORY, "a") as f:
        f.write(json.dumps({**r, "n_events": 16_000_000,
                            "ts": time.time()}) + "\n")
    return r


def log(tag, r):
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: wall={r['wall_sec']} "
          f"ev/s={r['events_per_sec']} rows={r['final_rows']}", flush=True)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for i in range(rounds):
        log(f"r{i} 16M", apply_probe(32, 16_000_000, repeats=2))
        log(f"r{i} 64M", apply_probe(32, 64_000_000, repeats=1))
        if i < 2:  # skew history: +2 interleaved rounds on top of --skew's 2
            log(f"r{i} skew16", skew_probe(16))
            log(f"r{i} skew1", skew_probe(1))
    log("128M", apply_probe(32, 128_000_000, repeats=1))
    subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                    "--consolidate"], check=False)
    print("campaign done", flush=True)


if __name__ == "__main__":
    main()
