"""Two-parallelism scaling evidence (BASELINE.json north_rule).

The rule's criterion — throughput scaling efficiency >= 0.8 between N and 4N
executor clusters — is evidenced in-sandbox by running the identical full
rule-set validation job on the identical input at local[8] and local[32]
(fresh JVM per run via subprocess; input parquet pre-generated and
page-cache-warmed so both runs read the same bytes from the same medium).

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python tools/scaling_bench.py [--rows N] [--repeats K]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, rows: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        BENCH_CLIP_ROWS=str(rows),
        BENCH_SKIP_QUERIES="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    # Warm: ensure cache exists + page-cache the input once (32-way, discarded).
    warm = run_once(32, args.rows)

    results: dict[int, list[dict]] = {8: [], 32: []}
    for _ in range(args.repeats):
        for cpus in (8, 32):
            results[cpus].append(run_once(cpus, args.rows))

    best = {c: min(rs, key=lambda r: r["value"]) for c, rs in results.items()}
    t8, t32 = best[8]["value"], best[32]["value"]
    thr8, thr32 = best[8]["clips_per_sec"], best[32]["clips_per_sec"]
    efficiency = (thr32 / thr8) / 4.0

    lines = [
        "# BENCH/BASELINE — measured numbers (north_rule scaling evidence)",
        "",
        f"Input: {args.rows:,} synthetic clips (SF=0.1 scale-down of the 10^12-clip",
        "design point), identical parquet input for both runs, full audio rule",
        "catalog (22 rules incl. pandas-UDF PCM SNR, t-digest drift, salted",
        "uniqueness, referential joins). Fresh JVM per run; best of "
        f"{args.repeats} repeats.",
        "",
        "| parallelism | wall sec | clips/sec | violations |",
        "|---|---|---|---|",
        f"| local[8]  (N)  | {t8:.1f} | {thr8:,.0f} | {best[8]['violations']:,} |",
        f"| local[32] (4N) | {t32:.1f} | {thr32:,.0f} | {best[32]['violations']:,} |",
        "",
        f"**Scaling efficiency (N→4N): {efficiency:.2f}**"
        + ("  ✓ meets the ≥0.8 criterion" if efficiency >= 0.8 else "  ✗ below 0.8"),
        "",
        "All runs (wall sec): "
        + ", ".join(
            f"local[{c}]: " + "/".join(f"{r['value']:.1f}" for r in rs)
            for c, rs in results.items()
        ),
        "",
        f"Violation sets identical across parallelism levels: "
        f"{best[8]['violations'] == best[32]['violations']}",
        "",
        f"Recorded {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}; "
        "harness: tools/scaling_bench.py; per-run JSON via bench.py.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({
        "t8_sec": t8, "t32_sec": t32,
        "clips_per_sec_8": thr8, "clips_per_sec_32": thr32,
        "efficiency": round(efficiency, 3),
        "violations_match": best[8]["violations"] == best[32]["violations"],
    }))


if __name__ == "__main__":
    main()
