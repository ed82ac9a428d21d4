"""Two-parallelism scaling evidence for the DOCUMENTS (LLM-pipeline) path.

BENCH/BASELINE.md evidences the north-rule N-vs-4N criterion on the clip
validation job; this harness applies the same protocol to the text/dedup
operator family so the scale claim covers both pipelines: identical
pre-generated parquet input (deterministic pure-hash docs_df corpus with
planted exact/near duplicates), fresh JVM per parallelism level, untimed
warm-up, best-of-3 in-process repeats, and a result-identity check across
levels.

Measured job (one timed block, seven chained actions):
  fused curation scan (token stats + quality + lang-ID + first-wins dedup)
  -> exact duplicate rows -> MinHash-LSH near-dup pairs -> SimHash pairs
  -> sequence packing -> unigram rarity -> audio burst synth + voiced
  segmentation (the mapInPandas family).

Writes BENCH/DOCS_SCALING.md and prints one JSON line.

Usage: python tools/docs_scaling_bench.py [--rows N] [--n 2] [--context-cores 32]
       (internal) --worker --cpus K --root DIR
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GEN_PARTITIONS = 64


def _datagen_fingerprint() -> str:
    import hashlib

    src = os.path.join(REPO, "data_check_spark", "datagen.py")
    with open(src, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def docs_cache(rows: int) -> str:
    root = os.path.join(REPO, ".bench_cache", f"docs_{rows}")
    marker = os.path.join(root, "_DONE")
    # Marker carries a datagen.py fingerprint so editing the generator
    # invalidates the cached corpus instead of silently benchmarking stale data.
    stamp = f"{rows}:{_datagen_fingerprint()}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return root
    from data_check_spark.datagen import docs_df
    from data_check_spark.session import get_spark

    spark = get_spark("docs_gen", master="local[8]", shuffle_partitions=8)
    docs_df(spark, rows).repartition(GEN_PARTITIONS).write.mode("overwrite").parquet(
        f"{root}/documents"
    )
    spark.stop()
    with open(marker, "w") as f:
        f.write(stamp)
    return root


def run_pipeline(docs) -> dict:
    from pyspark.sql import functions as F

    from data_check_spark.operators import dedup as D
    from data_check_spark.operators import text as T
    from data_check_spark.operators.packing import pack_assignments

    return {
        "curation_kept": T.curation_pipeline(docs, min_quality_q4=0, min_tokens=5).count(),
        "exact_dup_rows": D.exact_duplicate_rows(docs).count(),
        "minhash_pairs": D.minhash_lsh_pairs(docs, threshold=0.5).count(),
        "simhash_pairs": D.simhash_near_pairs(docs, max_hamming=3).count(),
        # pack_id/spans depend only on the GLOBAL doc order, so identical
        # counts across parallelism levels also prove the distributed
        # prefix sum is partitioning-invariant
        "pack_spans": pack_assignments(docs, budget=2048)
        .filter(F.col("spans_boundary") == 1)
        .count(),
        "rarity_oov": int(
            T.unigram_rarity(docs, vocab_size=64)
            .agg(F.sum("n_oov").alias("s"))
            .collect()[0]["s"]
        ),
        # audio family: per-doc two-burst PCM synthesis -> framed voiced
        # segmentation (two chained Arrow stages; counts deterministic, so
        # identity across levels covers the mapInPandas path too)
        "audio_segments": _audio_segments(docs),
    }


def _audio_segments(docs) -> int:
    from pyspark.sql import functions as F

    from data_check_spark.operators import audio as A
    from data_check_spark.queries import _burst_geometry, _doc_h

    geom = (
        _burst_geometry(docs.select("doc_id"))
        .withColumn("amp", F.lit(1000) + _doc_h(":sa") % 31000)
        .withColumn("k", F.lit(4) + _doc_h(":sk") % 28)
    )
    pcm = A.synth_two_burst_pcm(geom)
    return A.voiced_segments(pcm, frame_samples=64, keep=["doc_id"]).count()


def worker(cpus: int, root: str, repeats: int) -> None:
    from data_check_spark.session import get_spark

    spark = get_spark("docs_bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    docs = spark.read.parquet(f"{root}/documents")
    run_pipeline(docs.sample(0.25, seed=1))  # untimed warm-up
    runs = []
    counts = None
    for _ in range(repeats):
        t0 = time.monotonic()
        counts = run_pipeline(docs)
        runs.append(round(time.monotonic() - t0, 2))
    n_rows = docs.count()
    spark.stop()
    print(json.dumps({"cpus": cpus, "rows": n_rows, "runs_sec": runs,
                      "best_sec": min(runs), "counts": counts}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=120_000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--context-cores", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--root", type=str)
    args = ap.parse_args()
    if args.worker:
        worker(args.cpus, args.root, args.repeats)
        return

    root = docs_cache(args.rows)

    def launch(cpus: int) -> dict:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--cpus", str(cpus), "--root", root, "--repeats", str(args.repeats)],
                capture_output=True, text=True, check=True,
            )
        except subprocess.CalledProcessError as e:
            sys.stderr.write(e.stderr or "")  # surface the child traceback
            raise
        return json.loads(out.stdout.strip().splitlines()[-1])

    n, n4 = args.n, args.n * 4
    rn = launch(n)
    rn4 = launch(n4)
    rctx = launch(args.context_cores) if args.context_cores else None
    thr = lambda r: args.rows / r["best_sec"]
    efficiency = (thr(rn4) / thr(rn)) / 4.0
    counts_match = len({json.dumps(r["counts"]) for r in filter(None, [rn, rn4, rctx])}) == 1

    def row(label, r):
        return (f"| {label} | {r['best_sec']:.1f} | {args.rows / r['best_sec']:,.0f} | "
                f"{'/'.join(f'{s:.1f}' for s in r['runs_sec'])} |")

    lines = [
        "# BENCH/DOCS_SCALING — documents-pipeline N vs 4N evidence",
        "",
        f"Input: {args.rows:,} deterministic synthetic documents (datagen.docs_df:",
        "pure-hash word sequences, ~3% planted exact duplicates of a 64-doc pool,",
        "~2% near duplicates), identical parquet input for every run. Job: fused",
        "curation scan -> exact dedup -> MinHash-LSH pairs -> SimHash pairs ->",
        "sequence packing (distributed prefix sum) -> unigram rarity ->",
        "audio burst synth + voiced segmentation (chained Arrow stages), one",
        "timed block. Same protocol as BENCH/BASELINE.md (fresh JVM per level,",
        "untimed warm-up, best of 3 in-process repeats).",
        "",
        "| parallelism | wall sec (best) | docs/sec | all runs (sec) |",
        "|---|---|---|---|",
        row(f"local[{n}]  (N)", rn),
        row(f"local[{n4}] (4N)", rn4),
    ]
    if rctx:
        lines.append(row(f"local[{args.context_cores}] (context)", rctx))
    lines += [
        "",
        f"**Scaling efficiency N→4N (local[{n}]→local[{n4}]): {efficiency:.2f}**"
        + ("  — meets the ≥0.8 criterion" if efficiency >= 0.8 else "  — below 0.8"),
        "",
        f"Result counts identical at every parallelism level: {counts_match}",
        f"({'/'.join(rn['counts'])} = "
        f"{'/'.join(str(v) for v in rn['counts'].values())}).",
        "",
        "Variance note: at short job lengths the serial per-query planning",
        "overhead plus host noise dominates the efficiency measurement (a 30k",
        "run once measured 0.66, a 60k run 0.74 after the audio stage joined",
        "the block — identical result counts both times). Use --rows >= 120000",
        "and, as with the clip harness,",
        "treat scaling conclusions as best-of-N, never a single short run",
        "(CLAUDE.md).",
        "",
        f"Recorded {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}; "
        "harness: tools/docs_scaling_bench.py.",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "DOCS_SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"efficiency": round(efficiency, 3), "counts_match": counts_match,
                      "best_n": rn["best_sec"], "best_4n": rn4["best_sec"],
                      "best_ctx": rctx["best_sec"] if rctx else None}))


if __name__ == "__main__":
    main()
