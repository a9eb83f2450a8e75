"""Round-3 session-E campaign: regime-consistent, stamp-matched evidence for
EVERY BASELINE.md section in one interleaved pass per round.

Extends campaign_r3d with the shape it omitted — the local[32] 16M headline —
and puts EVERY probe on repeats=2 so each config's minimum is a steady-state
(second-apply) wall: the r3d finding was that a fresh JVM's first apply pays a
fixed ~100 s warm-state cost (JIT/heap ramp, zero disk reads), so mixing
repeats=1 and repeats=2 configs compares first-run to steady-state regimes.
Steady-state is also the regime a long-lived CDC service actually runs in.
The criterion pairs (1->4, 2->8) get both sides at repeats=2 => like-for-like.

Probes run strictly sequentially in fresh subprocesses, interleaved across
shapes so every shape samples every host-weather window (CLAUDE.md timing
rule); each round ends with `bench.py --consolidate`.

Usage: python tools/campaign_r3e.py [rounds=3] [skip_128m=0]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.campaign_r3c import apply_probe, log  # noqa: E402
from tools.campaign_r3d import skew  # noqa: E402


def share_logs(n_events: int, gen_cores: int = 32,
               configs=(1, 2, 4, 8)) -> None:
    """Symlink the gen_cores-generated log into the other configs' workdirs.

    The bench log is deterministic (seed-fixed) and its reuse stamp
    (_gen_params.json) excludes cores, so every parallelism level times the
    byte-identical input either way — but generating 2.7 GB inside a
    local[1]/local[2] session wastes most of an hour per config per /tmp
    wipe. Symlinks only ever REPLACE a missing/previous link, never a real
    directory a probe already generated."""
    src = f"/tmp/cdc_camp_{gen_cores}_{n_events}/log"
    if not os.path.exists(f"{src}/_gen_params.json"):
        return
    for c in configs:
        d = f"/tmp/cdc_camp_{c}_{n_events}"
        os.makedirs(d, exist_ok=True)
        link = f"{d}/log"
        if os.path.islink(link) or not os.path.exists(link):
            tmp = f"{link}.tmp_ln"
            try:
                os.symlink(src, tmp)
                os.replace(tmp, link)
            except OSError:
                pass


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    skip_128m = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False

    def step(tag, fn):
        # one failed probe (host weather, disk pressure) must not kill the
        # whole campaign: the round's remaining shapes and the consolidate
        # are worth more than the lost sample. AssertionError is NOT weather:
        # the only asserts inside probe steps are correctness invariants
        # (salted == unsalted final_rows), and downgrading a violated
        # invariant to a printed line would let the campaign consolidate as
        # if healthy (ADVICE r4) — let it propagate and kill the campaign.
        try:
            log(tag, fn())
        except AssertionError:
            raise
        except Exception as exc:  # noqa: BLE001
            print(f"[{tag}] FAILED: {exc}", flush=True)

    for i in range(rounds):
        step(f"r{i} 32@16M x2", lambda: apply_probe(32, 16_000_000, repeats=2))
        share_logs(16_000_000)
        step(f"r{i} 2@16M x2", lambda: apply_probe(2, 16_000_000, repeats=2))
        step(f"r{i} 8@16M x2", lambda: apply_probe(8, 16_000_000, repeats=2))
        step(f"r{i} 32@64M x2", lambda: apply_probe(32, 64_000_000, repeats=2))

        def skew_pair():
            r16 = skew(16)
            log(f"r{i} skew16", r16)
            r1 = skew(1)
            assert r16["final_rows"] == r1["final_rows"], \
                "salted != unsalted rows"
            return r1
        step(f"r{i} skew1", skew_pair)
        step(f"r{i} 1@16M x2", lambda: apply_probe(1, 16_000_000, repeats=2))
        step(f"r{i} 4@16M x2", lambda: apply_probe(4, 16_000_000, repeats=2))
        if not skip_128m:
            step(f"r{i} 32@128M x2",
                 lambda: apply_probe(32, 128_000_000, repeats=2))
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py"),
                        "--consolidate"], check=False)
    print("campaign r3e done", flush=True)


if __name__ == "__main__":
    main()
