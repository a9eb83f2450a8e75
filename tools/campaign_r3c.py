"""Round-3 session-C evidence campaign: one interleaved pass per round over
ALL evidence shapes — local[32] 16M headline, the under-capacity scaling
pairs (1,4 and 2,8 at 16M), and 64M input linearity — plus trailing 128M
points. Interleaving across configs inside each round gives every config a
sample from each host-weather window (CLAUDE.md timing rule); probes run
strictly sequentially in fresh subprocesses and fold into BENCH/probes.jsonl,
from which `bench.py --consolidate` rebuilds BENCH/BASELINE.md.

Usage: python tools/campaign_r3c.py [rounds] [n_128m_tail]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def apply_probe(cores: int, n_events: int, repeats: int = 1) -> dict:
    c0 = bench.read_host_cpu_full()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--apply-probe",
         str(cores), str(n_events), f"/tmp/cdc_camp_{cores}_{n_events}",
         str(repeats)],
        capture_output=True, text=True, timeout=7200,
    )
    c1 = bench.read_host_cpu_full()
    tot = max(c1["total"] - c0["total"], 1)
    stamp = {
        "steal_pct": round(100.0 * (c1["steal"] - c0["steal"]) / tot, 2),
        "sys_pct": round(100.0 * (c1["sys"] - c0["sys"]) / tot, 2),
        "user_pct": round(100.0 * (c1["user"] - c0["user"]) / tot, 2),
    }
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            r = json.loads(line)
            bench._record_probe(r, n_events, extra=stamp)
            r.update(stamp)
            return r
    raise RuntimeError(f"probe failed ({cores}, {n_events}):\n"
                       f"{out.stderr[-1500:]}")


def log(tag, r):
    print(f"[{time.strftime('%H:%M:%S')}] {tag}: wall={r['wall_sec']} "
          f"ev/s={r['events_per_sec']} rows={r['final_rows']} "
          f"steal={r.get('steal_pct', '?')}%", flush=True)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n128 = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    for i in range(rounds):
        log(f"r{i} 32@16M", apply_probe(32, 16_000_000, repeats=2))
        log(f"r{i} 1@16M", apply_probe(1, 16_000_000))
        log(f"r{i} 4@16M", apply_probe(4, 16_000_000))
        log(f"r{i} 2@16M", apply_probe(2, 16_000_000))
        log(f"r{i} 8@16M", apply_probe(8, 16_000_000))
        log(f"r{i} 32@64M", apply_probe(32, 64_000_000))
    for j in range(n128):
        log(f"t{j} 32@128M", apply_probe(32, 128_000_000))
    subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                    "--consolidate"], check=False)
    print("campaign done", flush=True)


if __name__ == "__main__":
    main()
