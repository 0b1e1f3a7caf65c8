"""Scaling-efficiency experiment (north-rule evidence): the same
index-build job, same input, at two parallelism levels — the sandbox
proxy for N vs 4N executors.

Runs ``bench.py`` in fresh subprocesses (cold JVM each, no cache
carry-over) at local[8] and local[32] with work amplified via
BENCH_REPLICATE, then reports throughput at both plus
efficiency = throughput(32) / (4 × throughput(8)).

Usage: python bench_scaling.py [--replicate 20] [--sf-dir ...]
Writes the measured table into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_once(cpus: int, replicate: int, sf_dir: str,
             text_mult: int = 8) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               BENCH_REPLICATE=str(replicate),
               BENCH_TEXT_MULT=str(text_mult),
               SPARK_GRAFT_SF_DIR=sf_dir,
               BENCH_BUILD_ONLY="1")
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, timeout=3600,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def run_interleaved(low: int, high: int, replicate: int, sf_dir: str,
                    text_mult: int, cooldown: int) -> tuple[dict, dict]:
    """Throttle-fair protocol (see BENCH.md): interleaved order
    high,low,low,high — each level gets one early and one late slot —
    with idle cooldowns between runs; best run per level wins."""
    import time
    results: dict[int, dict] = {}
    for i, cpus in enumerate([high, low, low, high]):
        if i:
            time.sleep(cooldown)
        r = run_once(cpus, replicate, sf_dir, text_mult)
        print(f"  run {i}: local[{cpus}] build="
              f"{r['queries']['index_build']:.1f}s", file=sys.stderr)
        cur = results.get(cpus)
        if cur is None or r["queries"]["index_build"] < cur["queries"]["index_build"]:
            results[cpus] = r
    return results[low], results[high]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=20)
    ap.add_argument("--text-mult", type=int,
                    default=int(os.environ.get("BENCH_TEXT_MULT", "8")))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--cooldown", type=int, default=120)
    args = ap.parse_args()

    lo, hi = run_interleaved(args.low, args.high, args.replicate,
                             args.sf_dir, args.text_mult, args.cooldown)
    ratio = args.high / args.low
    eff = hi["docs_per_sec"] / (ratio * lo["docs_per_sec"])
    result = {
        "job": "index_build",
        "sf_dir": args.sf_dir,
        "n_docs": lo["n_docs"],
        f"docs_per_sec_local{args.low}": lo["docs_per_sec"],
        f"docs_per_sec_local{args.high}": hi["docs_per_sec"],
        f"build_sec_local{args.low}": lo["queries"]["index_build"],
        f"build_sec_local{args.high}": hi["queries"]["index_build"],
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    with open("BENCH.md", "a") as f:
        f.write(
            f"\n| index_build | {args.sf_dir} ×{args.replicate} "
            f"×{args.text_mult}-text ({lo['n_docs']} docs, "
            f"interleaved best-of-2, cooldown {args.cooldown}s) "
            f"| local[{args.low}]: {lo['docs_per_sec']:.0f} docs/s "
            f"({lo['queries']['index_build']:.1f}s) "
            f"| local[{args.high}]: {hi['docs_per_sec']:.0f} docs/s "
            f"({hi['queries']['index_build']:.1f}s) "
            f"| **{eff:.2f}** |\n")


if __name__ == "__main__":
    main()
