"""Round-4 evidence campaign, runnable piecewise so quiet host windows can be
spent on whichever evidence is thinnest (VERDICT r3 items 1-3, 7):

  pairs N      N interleaved rounds of the under-capacity criterion pairs
               (2,8 then 1,4 @16M, repeats=2) -> same-window pair evidence
  full N       pairs + the 32@16M headline + 64M linearity point per round
  big N        N rounds of 32@128M x2 (steady-state linearity tail; the 256M
               point is disk-infeasible here: ~43 GB log vs ~50 GB free)
  writemode N  N interleaved cow/mor rounds at 16M (write amplification,
               read-back, compact cost) -> BENCH/writemode_probes.jsonl
  pruning      one pruning-stack probe (file-skip fractions, lookup_many
               vs naive scan) -> BENCH/pruning_probes.jsonl
  skew N       N salted/unsalted hot-key pairs (re-evidence under proto p2)

Probes run strictly sequentially in fresh subprocesses (CLAUDE.md timing
rule); every history record carries engine stamp + bench proto; each piece
ends with `bench.py --consolidate`. AssertionError (correctness invariant)
propagates and kills the campaign; host-weather failures only cost the step.

Usage: python tools/campaign_r4.py PIECE [N]
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
from tools.campaign_r3d import skew  # noqa: E402
from tools.campaign_r3e import share_logs  # noqa: E402


def _probe_json(args: list[str], timeout: int = 7200) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")] + args,
        capture_output=True, text=True, timeout=timeout,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"probe failed ({args}):\n{out.stderr[-1500:]}")


def _record(path: str, rec: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps({**rec, "engine": bench._engine_stamp(),
                            "proto": bench.BENCH_PROTO,
                            "ts": time.time()}) + "\n")


def step(tag, fn):
    try:
        log(tag, fn())
    except AssertionError:
        raise  # violated correctness invariant: kill the campaign
    except Exception as exc:  # noqa: BLE001
        print(f"[{tag}] FAILED: {exc}", flush=True)


def consolidate():
    subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                    "--consolidate"], check=False)


def pairs_round(i: int, full: bool = False):
    if full:
        step(f"r{i} 32@16M x2", lambda: apply_probe(32, 16_000_000, repeats=2))
    share_logs(16_000_000)
    step(f"r{i} 2@16M x2", lambda: apply_probe(2, 16_000_000, repeats=2))
    step(f"r{i} 8@16M x2", lambda: apply_probe(8, 16_000_000, repeats=2))
    step(f"r{i} 1@16M x2", lambda: apply_probe(1, 16_000_000, repeats=2))
    step(f"r{i} 4@16M x2", lambda: apply_probe(4, 16_000_000, repeats=2))
    if full:
        step(f"r{i} 32@64M x2", lambda: apply_probe(32, 64_000_000, repeats=2))


def writemode_round(i: int):
    for mode in ("cow", "mor"):
        def run(mode=mode):
            wd = f"/tmp/cdc_wm_{mode}"
            # share the 16M scaling log with the apply-probe campaign dirs
            src = "/tmp/cdc_camp_32_16000000/log"
            os.makedirs(wd, exist_ok=True)
            link = f"{wd}/log"
            if os.path.exists(f"{src}/_gen_params.json") and not os.path.exists(link):
                os.symlink(src, link)
            r = _probe_json(["--writemode-probe", "32", "16000000", mode, wd])
            _record(bench.WRITEMODE_HISTORY, {**r, "n_events": 16_000_000})
            return r
        step(f"r{i} writemode {mode}", run)


def skew_pair(i: int):
    def run():
        r16 = skew(16)
        log(f"r{i} skew16", r16)
        r1 = skew(1)
        assert r16["final_rows"] == r1["final_rows"], "salted != unsalted rows"
        return r1
    step(f"r{i} skew1", run)


def main():
    piece = sys.argv[1] if len(sys.argv) > 1 else "pairs"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if piece in ("pairs", "full"):
        for i in range(n):
            pairs_round(i, full=(piece == "full"))
            consolidate()
    elif piece == "big":
        for i in range(n):
            step(f"b{i} 32@128M x2",
                 lambda: apply_probe(32, 128_000_000, repeats=2))
        consolidate()
    elif piece == "writemode":
        for i in range(n):
            writemode_round(i)
        consolidate()
    elif piece == "pruning":
        def run():
            r = _probe_json(["--pruning-probe", "32", "16000000",
                             "/tmp/cdc_pruning"])
            _record(bench.PRUNING_HISTORY, r)
            return {"wall_sec": r["batched"]["1000"]["lookup_many_sec"],
                    "events_per_sec": 0,
                    "final_rows": r["batched"]["1000"]["rows"]}
        step("pruning", run)
        consolidate()
    elif piece == "skew":
        for i in range(n):
            skew_pair(i)
        consolidate()
    else:
        raise SystemExit(f"unknown piece {piece!r}")
    print(f"campaign r4 piece={piece} done", flush=True)


if __name__ == "__main__":
    main()
