"""Round-3 session-D campaign: regime-consistent linearity + r3c skew evidence.

Findings this addresses (BENCH/probes.jsonl, r3c stamp):
- 16M@32 repeats=2 probes show walls like [132.8, 31.6]: the FIRST apply in a
  fresh JVM pays a fixed ~100 s warm-state cost (JIT/heap ramp — /proc/diskstats
  shows ZERO disk reads during probes, so it is not page-cache paging) that the
  second apply does not. 64M/128M probes so far ran repeats=1, so their minima
  sit in the first-run regime while 16M minima are steady-state — an
  apples-to-oranges linearity table that understates large-input throughput.
  Fix: repeats=2 at every size; minima then compare steady-state to
  steady-state, which is also the regime a long-running CDC service lives in.
- BENCH/skew_probes.jsonl has no r3c-stamped samples (the skew section folds
  only within the current APPLY_SEMVER), so the hot-key evidence needs
  re-measurement under the real-classify pipeline.

Probes run strictly sequentially in fresh subprocesses (CLAUDE.md timing
rule), interleaved across shapes so each gets a sample from every
host-weather window; consolidate at the end.

Usage: python tools/campaign_r3d.py [rounds=2] [extra_pair_rounds=2]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from tools.campaign_r3c import apply_probe, log  # noqa: E402


def skew(salt: int, n_events: int = 16_000_000, repeats: int = 2) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--skew-probe",
         "32", str(n_events), str(salt), f"/tmp/cdc_skew_log_{n_events}",
         f"/tmp/cdc_skew_r3d_{salt}", str(repeats)],
        capture_output=True, text=True, timeout=7200,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            r = json.loads(line)
            os.makedirs(os.path.dirname(bench.SKEW_HISTORY), exist_ok=True)
            with open(bench.SKEW_HISTORY, "a") as f:
                f.write(json.dumps({**r, "n_events": n_events,
                                    "engine": bench._engine_stamp(),
                                    "proto": bench.BENCH_PROTO,
                                    "ts": time.time()}) + "\n")
            return r
    raise RuntimeError(f"skew probe failed (salt={salt}):\n{out.stderr[-1500:]}")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    pair_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    for i in range(rounds):
        # steady-state linearity points (repeats=2 -> second-run minima)
        log(f"r{i} 32@64M x2", apply_probe(32, 64_000_000, repeats=2))
        # r3c skew evidence, salted/unsalted interleaved
        r16 = skew(16)
        log(f"r{i} skew16", r16)
        r1 = skew(1)
        log(f"r{i} skew1", r1)
        assert r16["final_rows"] == r1["final_rows"], "salted != unsalted rows"
        log(f"r{i} 32@128M x2", apply_probe(32, 128_000_000, repeats=2))
    # thicken the under-capacity criterion pairs (2->8 currently thinnest)
    for j in range(pair_rounds):
        log(f"p{j} 2@16M", apply_probe(2, 16_000_000))
        log(f"p{j} 8@16M", apply_probe(8, 16_000_000))
        log(f"p{j} 1@16M", apply_probe(1, 16_000_000))
        log(f"p{j} 4@16M", apply_probe(4, 16_000_000))
    subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                    "--consolidate"], check=False)
    print("campaign r3d done", flush=True)


if __name__ == "__main__":
    main()
