"""spark-submit entry point for the corpus-curation release pipeline.

The training-data counterpart of jobs/validate_job.py: take a raw document
table, apply the hygiene stages a pretraining corpus goes through, and ship
a verified, sharded release. Every stage is one of the engine's operator
modules; this job is the composition and the launch surface.

    python tools/package_pyfiles.py                 # → dist/data_check_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/data_check_spark.zip \\
        jobs/curate_job.py \\
        --input  s3://bucket/raw_docs/    \\
        --eval   s3://bucket/benchmarks/  \\
        --min-quality 4000 --shards 512   \\
        --output-dir s3://bucket/corpus_v3/

Pipeline (single tagging pass, then one write):

1. score every doc once (quality q4, extraction-quality status, exact
   fingerprint, optional near-dup cluster membership, optional eval-set
   contamination) — all joins are keyed by doc id or fingerprint;
2. assign each doc ONE ``drop_reason`` (null_id > rule_violation > mojibake >
   seen_before > exact_dup > near_dup > semantic_dup > low_quality > contaminated >
   over_budget — first match wins) so the manifest tally is a single
   groupBy, never a count() per stage;
3. keep survivors, optionally redact PII, deterministically shuffle into
   ``--shards`` training shards (one keyed exchange);
4. ``sinks.write_dataset`` (hive-partitioned by shard, sorted by pos,
   size-bounded files) and ``sinks.verify_dataset`` read-back audit —
   the job FAILS (exit 2) if the written bytes don't checksum-match the
   frame it meant to write;
5. one JSON manifest line to stdout (+ ``manifest.json`` next to the
   corpus when the output dir is a local path).

Scale notes: the tagging pass recomputation is cut once by an eager
localCheckpoint before the write so the verify step reads the SAME
materialized frame the writer consumed (on a cluster pass
``--reliable-cache`` semantics via the engine if executor loss matters);
near-dup is LSH-bucketed (never all-pairs) and can be skipped with
``--skip-near-dup``; decontamination broadcasts the eval n-gram set — the
corpus side never shuffles for it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-quality", type=int, default=0,
                    help="drop docs with quality_q4 below this (0 = keep all)")
    ap.add_argument("--keep-top-pct", type=float, default=None,
                    help="keep only the top X%% of docs by quality_q4 — the "
                         "threshold is the (100-X)th percentile computed in "
                         "ONE percentile_approx pass; combines with "
                         "--min-quality (the stricter bound wins)")
    ap.add_argument("--dry-run", action="store_true",
                    help="print the drop tally and exit without writing")
    ap.add_argument("--skip-near-dup", action="store_true",
                    help="skip MinHash-LSH near-dup clustering")
    ap.add_argument("--near-dup-threshold", type=float, default=0.5)
    ap.add_argument("--history", default=None,
                    help="fingerprint parquet dir from a previous release; "
                         "docs whose content was ever shipped are dropped "
                         "(bloom-prefiltered exact membership)")
    ap.add_argument("--union-history", action="store_true",
                    help="write <output>/fingerprints as history UNION kept "
                         "(a self-contained store: pass just release N's to "
                         "release N+1). Default writes only THIS release's "
                         "kept fingerprints — at 10^12-fingerprint scale the "
                         "store should be an append table, not rewritten "
                         "per release")
    ap.add_argument("--eval", default=None,
                    help="benchmark/eval parquet dir for decontamination")
    ap.add_argument("--embeddings", default=None,
                    help="doc-level embedding parquet (<id-col>, embedding "
                         "array<float>); enables semantic near-dup dropping "
                         "(SemDeDup-style: LSH buckets + exact cosine re-rank, "
                         "best-quality copy kept)")
    ap.add_argument("--semantic-threshold", type=float, default=0.92)
    ap.add_argument("--decontam-ngram", type=int, default=4)
    ap.add_argument("--drop-mojibake", action="store_true",
                    help="drop docs the extraction-quality screen marks mojibake")
    ap.add_argument("--preflight-rules", default=None,
                    help="rule catalog JSON (row-local kinds, e.g. "
                         "rules/catalog_corpus.py semantics); docs violating "
                         "ANY rule are quarantined before every other stage")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="cap the release at this many whitespace tokens, "
                         "filled best-quality-first (bucketed, no global sort)")
    ap.add_argument("--quarantine", action="store_true",
                    help="also write dropped docs' metadata (id, reason, "
                         "every non-text column) to <output>/quarantine, "
                         "hive-partitioned by drop_reason — the audit trail "
                         "without re-shipping dropped text")
    ap.add_argument("--export-tar", action="store_true",
                    help="also export the release as WebDataset-style tar "
                         "shards (<output>/tar/shard-NNNNNN.tar, one member "
                         "<id>.txt per doc) — the format streaming training "
                         "loaders consume")
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--shuffle-seed", default="sh0")
    ap.add_argument("--rows-per-file", type=int, default=1_000_000)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from data_check_spark.operators import dedup as _dedup
    from data_check_spark.operators import graph as _graph
    from data_check_spark.operators import text as _text
    from data_check_spark.operators.sampling import corpus_shuffle
    from data_check_spark.session import get_spark
    from data_check_spark.sinks import verify_dataset, write_dataset

    spark = get_spark(app_name="data_check_curate")
    spark.sparkContext.setLogLevel("WARN")
    id_col, text_col = args.id_col, args.text_col

    t0 = time.monotonic()
    docs = spark.read.parquet(args.input)
    in_cols = docs.columns

    # --- single tagging pass: every signal keyed by id -----------------
    scored = _text.quality_score(docs, id_col=id_col, text_col=text_col).select(
        id_col, "n_tokens", "quality_q4"
    )
    # LEFT joins on the id everywhere: a NULL id never equi-joins, and an
    # inner join would silently erase such rows from the tally — instead
    # they surface as drop_reason 'null_id' below
    tagged = docs.join(scored, id_col, "left")

    rule_counts: dict[str, int] = {}
    if args.preflight_rules:
        from data_check_spark.rules.compiler import apply_row_rules, compile_row_rules
        from data_check_spark.rules.spec import load_catalog

        compiled = compile_row_rules(load_catalog(args.preflight_rules).rules)
        viol = apply_row_rules(
            docs, compiled, id_col=id_col, partition_col=None
        ).localCheckpoint(eager=True)  # reused for per-rule tally + id set
        rule_counts = {
            r["rule_id"]: r["n"]
            for r in viol.groupBy("rule_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        bad_ids = viol.select(
            F.col("clip_id").cast(dict(docs.dtypes)[id_col]).alias(id_col)
        ).dropDuplicates().withColumn("_rule_bad", F.lit(True))
        tagged = tagged.join(bad_ids, id_col, "left")
    else:
        tagged = tagged.withColumn("_rule_bad", F.lit(None).cast("boolean"))

    if args.drop_mojibake:
        eq = _text.extraction_quality(docs, id_col=id_col, text_col=text_col).select(
            id_col, F.col("status").alias("_eq_status")
        )
        tagged = tagged.join(eq, id_col, "left")
    else:
        tagged = tagged.withColumn("_eq_status", F.lit(None).cast("string"))

    if args.history:
        store = spark.read.parquet(args.history)
        seen = _dedup.incremental_exact_dedup(
            docs, store, id_col=id_col, text_col=text_col
        ).select(id_col, F.col("is_dup").alias("_seen"))
        tagged = tagged.join(seen, id_col, "left")
    else:
        tagged = tagged.withColumn("_seen", F.lit(0))

    groups = _dedup.exact_duplicate_groups(docs, id_col=id_col, text_col=text_col)
    tagged = (
        tagged.withColumn("_fp", F.md5(F.col(text_col)))
        .join(
            groups.select(F.col("fingerprint").alias("_fp"), "keep_id"),
            "_fp", "left",
        )
        .withColumn(
            "_exact_dup",
            F.col("keep_id").isNotNull() & (F.col(id_col) != F.col("keep_id")),
        )
        .drop("keep_id")
    )

    if not args.skip_near_dup:
        pairs = _dedup.minhash_lsh_pairs(
            docs, id_col=id_col, text_col=text_col,
            threshold=args.near_dup_threshold,
        )
        clusters = _graph.dedup_clusters(pairs.select("id_a", "id_b"))
        reps = _graph.select_representatives(
            clusters.withColumnRenamed("doc_id", id_col), scored,
            id_col=id_col, score_col="quality_q4",
        )
        dropped_members = reps.filter(F.col("is_kept") == 0).select(
            F.col(id_col), F.lit(True).alias("_near_dup")
        )
        tagged = tagged.join(dropped_members, id_col, "left")
    else:
        tagged = tagged.withColumn("_near_dup", F.lit(None).cast("boolean"))

    if args.embeddings:
        from data_check_spark.operators import similarity as _sim

        emb = spark.read.parquet(args.embeddings)
        spairs = _sim.lsh_near_dup_pairs(
            emb, id_col=id_col, vec_col="embedding",
            threshold=args.semantic_threshold,
        )
        sclusters = _graph.dedup_clusters(spairs.select("id_a", "id_b"))
        sreps = _graph.select_representatives(
            sclusters.withColumnRenamed("doc_id", id_col), scored,
            id_col=id_col, score_col="quality_q4",
        )
        sem_drop = sreps.filter(F.col("is_kept") == 0).select(
            F.col(id_col), F.lit(True).alias("_sem_dup")
        )
        tagged = tagged.join(sem_drop, id_col, "left")
    else:
        tagged = tagged.withColumn("_sem_dup", F.lit(None).cast("boolean"))

    if args.eval:
        from data_check_spark.operators.decontam import decontaminate

        eval_df = spark.read.parquet(args.eval)
        contaminated = decontaminate(
            docs, eval_df, n=args.decontam_ngram,
            id_col=id_col, text_col=text_col,
        ).select(F.col(id_col), F.lit(True).alias("_contam"))
        tagged = tagged.join(contaminated, id_col, "left")
    else:
        tagged = tagged.withColumn("_contam", F.lit(None).cast("boolean"))

    min_quality = args.min_quality
    if args.keep_top_pct is not None:
        if not 0 < args.keep_top_pct <= 100:
            raise SystemExit(f"--keep-top-pct must be in (0, 100], got {args.keep_top_pct}")
        # one single-pass sketch over the int scores; stricter bound wins
        cut = scored.agg(
            F.percentile_approx("quality_q4", 1.0 - args.keep_top_pct / 100.0)
        ).collect()[0][0]
        min_quality = max(min_quality, int(cut or 0))

    tagged = tagged.withColumn(
        "drop_reason",
        F.when(F.col(id_col).isNull(), "null_id")
        .when(F.coalesce(F.col("_rule_bad"), F.lit(False)), "rule_violation")
        .when(F.col("_eq_status") == "mojibake", "mojibake")
        .when(F.col("_seen") == 1, "seen_before")
        .when(F.col("_exact_dup"), "exact_dup")
        .when(F.coalesce(F.col("_near_dup"), F.lit(False)), "near_dup")
        .when(F.coalesce(F.col("_sem_dup"), F.lit(False)), "semantic_dup")
        .when(F.col("quality_q4") < min_quality, "low_quality")
        .when(F.coalesce(F.col("_contam"), F.lit(False)), "contaminated"),
    )

    if args.token_budget is not None:
        from data_check_spark.operators.sampling import token_budget_select

        survivors = (
            tagged.filter(F.col("drop_reason").isNull())
            .withColumn("_dom", F.lit("all"))
            # coarse score buckets keep the (domain, score) frame tiny —
            # token_budget_select caps it at 100k buckets by design
            .withColumn("_qb", F.expr("quality_q4 div 100"))
        )
        in_budget = token_budget_select(
            survivors, id_col=id_col, domain_col="_dom",
            score_col="_qb", token_col="n_tokens",
            budgets={"all": args.token_budget},
        ).select(F.col(id_col)).withColumn("_in_budget", F.lit(True))
        tagged = tagged.join(in_budget, id_col, "left").withColumn(
            "drop_reason",
            F.coalesce(
                F.col("drop_reason"),
                F.when(~F.coalesce(F.col("_in_budget"), F.lit(False)), "over_budget"),
            ),
        )

    # ONE action tallies every stage (drop_reason NULL = kept)
    tally_rows = (
        tagged.groupBy("drop_reason").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    tally = {r["drop_reason"] or "kept": r["n"] for r in tally_rows}

    if args.dry_run:
        print(json.dumps({
            "dry_run": True,
            "input_rows": sum(tally.values()),
            "kept_rows": tally.get("kept", 0),
            "dropped": {k: v for k, v in sorted(tally.items()) if k != "kept"},
            "quality_threshold": min_quality,
            "rule_violations": rule_counts,
            "wall_sec": round(time.monotonic() - t0, 1),
        }))
        return 0

    if args.quarantine:
        # metadata only (no text): the audit trail scales with the drop
        # count, not the dropped bytes
        meta_cols = [c for c in in_cols if c != text_col]
        (tagged.filter(F.col("drop_reason").isNotNull())
            .select(*meta_cols, "quality_q4", "drop_reason")
            .write.mode("overwrite").partitionBy("drop_reason")
            .parquet(f"{args.output_dir}/quarantine"))

    # _fp (ORIGINAL-content fingerprint — the history store must match raw
    # future batches even when --redact-pii rewrites the shipped text) rides
    # along to the checkpoint so the fingerprint publish below costs no
    # recompute of the tagging pass
    kept = tagged.filter(F.col("drop_reason").isNull()).select(
        *in_cols, "quality_q4", "_fp"
    )
    if args.redact_pii:
        from data_check_spark.operators.pii import redact

        kept = kept.withColumn(text_col, redact(F.col(text_col)))
    sharded = corpus_shuffle(
        kept, id_col=id_col, n_shards=args.shards, seed=args.shuffle_seed
    )
    # cut the pipeline lineage ONCE so writer and verifier consume the same
    # materialized frame (no double recomputation of the tagging pass)
    sharded = sharded.localCheckpoint(eager=True)

    corpus_df = sharded.drop("_fp")
    corpus_path = f"{args.output_dir}/corpus"
    if tally.get("kept", 0) > 0:
        write_dataset(
            corpus_df, corpus_path,
            partition_by=["shard"], sort_by=["pos"],
            rows_per_file=args.rows_per_file,
        )
        report = verify_dataset(spark, corpus_path, corpus_df, partition_by=["shard"])
        failed = report.filter(~F.col("passed")).count()
    else:
        # everything dropped — NORMAL for an incremental run with no new
        # content (--history covers the whole batch). A hive-partitioned
        # write of 0 rows leaves no readable parquet, so skip the corpus
        # write entirely; the manifest records kept_rows = 0 and the
        # (empty, schema-bearing) fingerprint store below stays chainable.
        failed = 0

    if args.export_tar and tally.get("kept", 0) > 0:
        from data_check_spark.sinks import write_tar_shards

        tar_report = write_tar_shards(
            sharded.withColumn("_key", F.col(id_col).cast("string")),
            f"{args.output_dir}/tar",
            key_col="_key", payloads={text_col: "txt"}, order_col="pos",
        )
        n_tarred = tar_report.agg(F.sum("n_samples")).collect()[0][0]
        if n_tarred != tally.get("kept", 0):
            print(json.dumps({"error": "tar_export_count_mismatch",
                              "tarred": n_tarred, "kept": tally.get("kept", 0)}))
            return 2

    # publish the kept fingerprints so the NEXT release can pass this run's
    # output as --history (callers maintain the union across releases, or
    # chain: release N's history = release N-1's fingerprints ∪ its history)
    fp_path = f"{args.output_dir}/fingerprints"
    fps_out = sharded.select(F.col("_fp").alias("fingerprint"))
    if args.union_history and args.history:
        prev = spark.read.parquet(args.history).select(
            F.col("fingerprint").cast("string").alias("fingerprint")
        )
        fps_out = fps_out.unionByName(prev).dropDuplicates()
    fps_out.write.mode("overwrite").parquet(fp_path)

    manifest = {
        "input_rows": sum(tally.values()),
        "kept_rows": tally.get("kept", 0),
        "dropped": {k: v for k, v in sorted(tally.items()) if k != "kept"},
        "shards": args.shards,
        "rule_violations": rule_counts,
        "verify_failed_partitions": failed,
        "verified": failed == 0,
        "wall_sec": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(manifest))
    try:  # local filesystem only; object stores get the stdout line
        if os.path.isdir(args.output_dir):
            with open(f"{args.output_dir}/manifest.json", "w") as f:
                json.dump(manifest, f, indent=2)
    except OSError:
        pass
    return 0 if failed == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
