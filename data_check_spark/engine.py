"""Validation engine orchestration.

One call runs the whole catalog against a clip table and returns:

- ``violations``  — (rule_id, clip_id, partition, observed), the graft analog
                    of the reference result contract (dekispart.py:82-89,
                    data_check.py:1071-1094);
- ``verdicts``    — per-partition pass/fail with rows/violations/wall-time
                    (north_rule's per-partition verdicts + metrics);
- ``summary()``   — total, per-rule counts, top-5 rules — the reference's
                    summary aggregates (data_check.py:1186-1215).

Plan shape (scale rationale):
- The binary payload column is read EXACTLY ONCE: a single preparation
  projection computes ``byte_len`` and the decoded-PCM SNR (vectorized
  pandas UDF) and then DROPS ``bytes``; the narrow result (~1% of the wide
  table) is what gets cached and fanned out to every rule subplan. At 100 TB
  the wide scan is the dominant cost — measured here, plans that re-touch
  the binary column pay ~3x the raw scan each time, so one-touch is the
  difference between O(1) and O(#subplans) wide scans.
- ALL row-local rules evaluate in ONE projection over the narrow table
  (array-of-structs → explode), so per-row rule work is a single pass
  regardless of rule count.
- Set-oriented rules each contribute their own (shuffle-bearing) subplan:
  salted two-phase uniqueness, broadcast/SMJ referential joins, sketch-only
  drift shuffle — all reading the narrow cache, never the wide scan.
- ``violations`` is persisted before the verdict aggregation so the verdict
  job and any caller action (count, write) execute the rule plans once.
- Run timestamp is pinned once per run for deterministic date rules
  (reference calls datetime.now() per row — dekispart.py:473).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_check_spark import checkpoint as cp
from data_check_spark.operators.audio import (
    SNR_COL,
    audio_snr_violations,
    prepare_clips,
    snr_column_violations,
    transcript_match_violations,
)
from data_check_spark.operators.drift import (
    categorical_drift_violations,
    drift_violations,
    rate_drift_violations,
    volume_drift_violations,
)
from data_check_spark.operators.referential import (
    anti_join_violations,
    orphan_violations,
    reconcile_violations,
    semi_join_violations,
)
from data_check_spark.operators.funcdep import func_dep_violations
from data_check_spark.operators.uniqueness import (
    aggregate_unique_violations,
    unique_violations,
)
from data_check_spark.rules.compiler import (
    apply_row_rules,
    compile_rule_many,
    gate_condition,
)
from data_check_spark.rules.spec import Rule, RuleCatalog
from data_check_spark.schemas import CLIPS_SCHEMA, validate_schema


@dataclass
class ValidationResult:
    violations: DataFrame
    verdicts: DataFrame
    run_id: str
    wall_time_ms: int = 0
    rows_scanned: int = 0
    schema_problems: list[str] = field(default_factory=list)
    # per-partition column stats (lazy; None unless profile_columns was set)
    profile: DataFrame | None = None

    def summary(self) -> dict:
        """Reference-style summary: total, per-rule counts, top-5 rule ids."""
        per_rule = self.violations.groupBy("rule_id").agg(F.count(F.lit(1)).alias("n"))
        rows = per_rule.collect()
        counts = {r["rule_id"]: r["n"] for r in rows}
        top5 = [rid for rid, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
        return {"total": sum(counts.values()), "per_rule": counts, "top5": top5}


def _dispatch_set_rule(
    rule: Rule,
    clips: DataFrame,
    dims: dict[str, DataFrame],
    *,
    partition_col: str,
    shared_dups: DataFrame | None = None,
    run_ts: str | None = None,
) -> DataFrame:
    p = rule.params
    gate = gate_condition(rule.gate, run_ts, rule.rule_id) if rule.gate else None
    if rule.kind == "unique":
        scoped = clips.filter(gate) if gate is not None else clips
        return unique_violations(scoped, rule.rule_id, rule.column or "clip_id",
                                 partition_col=partition_col, dups=shared_dups)
    if rule.kind == "aggregate_unique":
        scoped = clips.filter(gate) if gate is not None else clips
        return aggregate_unique_violations(scoped, rule.rule_id, rule.column or "clip_id",
                                           dups=shared_dups)
    if rule.kind == "referential":
        dim = dims[p["dim"]]
        mode = p.get("mode", "anti")
        kwargs = dict(fact_key=rule.column or "clip_id", dim_key=p.get("dim_key", "clip_id"))
        if mode == "anti":
            return anti_join_violations(clips, dim, rule.rule_id, gate=gate,
                                        partition_col=partition_col, **kwargs)
        if mode == "semi":
            return semi_join_violations(clips, dim, rule.rule_id, gate=gate,
                                        partition_col=partition_col, **kwargs)
        if mode == "orphan":
            return orphan_violations(clips, dim, rule.rule_id, **kwargs)
        raise ValueError(f"unknown referential mode {mode!r} ({rule.rule_id})")
    if rule.kind == "drift":
        baseline = dims["baseline_stats"]
        return drift_violations(
            clips, baseline, rule.rule_id, rule.column,
            threshold=p.get("threshold", 0.25), partition_col=partition_col,
        )
    if rule.kind == "cat_drift":
        return categorical_drift_violations(
            clips, rule.rule_id, rule.column or "codec",
            threshold_bp=p.get("threshold_bp", 2500),
            min_rows=p.get("min_rows", 100), partition_col=partition_col,
        )
    if rule.kind == "rate_drift":
        return rate_drift_violations(
            clips, rule.rule_id, p["predicate"],
            threshold_bp=p.get("threshold_bp", 500),
            min_rows=p.get("min_rows", 100), partition_col=partition_col,
        )
    if rule.kind == "volume_drift":
        return volume_drift_violations(
            clips, rule.rule_id,
            threshold_bp=p.get("threshold_bp", 5000), partition_col=partition_col,
        )
    if rule.kind == "audio_decode":
        if SNR_COL in clips.columns:  # precomputed in the single wide pass
            return snr_column_violations(
                clips, rule.rule_id, snr_col=SNR_COL,
                snr_db_min=p.get("snr_db_min", 30.0),
                gate=gate, partition_col=partition_col,
            )
        return audio_snr_violations(
            clips, rule.rule_id,
            snr_db_min=p.get("snr_db_min", 30.0), cap_ms=p.get("cap_ms", 100),
            gate=gate, partition_col=partition_col,
        )
    if rule.kind == "agg_threshold":
        from data_check_spark.operators.profile import agg_threshold_violations

        scoped = clips.filter(gate) if gate is not None else clips
        return agg_threshold_violations(
            scoped, rule.rule_id, p["metric_expr"],
            min_value=p.get("min_value"), max_value=p.get("max_value"),
        )
    if rule.kind == "outlier":
        from data_check_spark.operators.profile import outlier_violations

        scoped = clips.filter(gate) if gate is not None else clips
        return outlier_violations(
            scoped, rule.rule_id, rule.column,
            partition_col=partition_col,
            group_col=p.get("group_by"),
            scale=p.get("scale", 100),
        )
    if rule.kind == "func_dep":
        scoped = clips.filter(gate) if gate is not None else clips
        return func_dep_violations(
            scoped, rule.rule_id, p["determinant"], rule.column,
            partition_col=partition_col,
            count_null_dependent=p.get("count_null_dependent", False),
            grain=p.get("grain", "row"),
        )
    if rule.kind == "reconcile":
        scoped = clips.filter(gate) if gate is not None else clips
        return reconcile_violations(
            scoped, dims[p["dim"]], rule.rule_id,
            parent_key=p.get("fact_key", "clip_id"),
            child_key=p.get("dim_key", "clip_id"),
            total_col=rule.column,
            amount_col=p["amount_col"],
            tolerance_cents=p.get("tolerance_cents", 0),
            partition_col=partition_col,
        )
    if rule.kind == "cardinality":
        from data_check_spark.operators.referential import cardinality_rule_violations

        scoped = clips.filter(gate) if gate is not None else clips
        return cardinality_rule_violations(
            scoped, dims[p["dim"]], rule.rule_id,
            parent_key=p.get("fact_key", "clip_id"),
            child_key=p.get("dim_key", "clip_id"),
            min_children=p.get("min_children", 1),
            max_children=p.get("max_children"),
            partition_col=partition_col,
        )
    if rule.kind == "transcript_match":
        # Mirror the fused path exactly (fused_dim_checks call below): the
        # join key is params["dim_key"] on BOTH sides and the compared fact
        # column is rule.column — a standalone dispatch (e.g. any resume run,
        # where fusion is disabled) must not fall back to the operator's
        # defaults for them.
        return transcript_match_violations(
            clips, dims[p["dim"]], rule.rule_id,
            fact_key=p.get("dim_key", "clip_id"), dim_key=p.get("dim_key", "clip_id"),
            fact_text=rule.column or "transcript",
            ref_text=p.get("ref_column", "transcript_ref"),
            partition_col=partition_col,
        )
    if rule.kind == "transcript_wer":
        from data_check_spark.operators.audio import transcript_wer_violations

        return transcript_wer_violations(
            clips, dims[p["dim"]], rule.rule_id,
            fact_key=p.get("dim_key", "clip_id"), dim_key=p.get("dim_key", "clip_id"),
            fact_text=rule.column or "transcript",
            ref_text=p.get("ref_column", "transcript_ref"),
            max_wer_bp=p.get("max_wer_bp", 2500),
            partition_col=partition_col,
        )
    raise ValueError(f"unhandled set rule kind {rule.kind!r}")


def _partition_violation_counts(violations: DataFrame, warning_ids: list[str]) -> DataFrame:
    """(partition, _viols, _errors) over the non-NULL-partition violations —
    the ONE definition of how violations aggregate into a verdict (warning
    severity counts but does not fail). Shared by run_validation and
    reconcile_outputs so the reconciled verdicts can never drift from the
    engine's own severity tiering."""
    is_error = (
        ~F.col("rule_id").isin(warning_ids) if warning_ids else F.lit(True)
    )
    return (
        violations.filter(F.col("partition").isNotNull())
        .groupBy("partition")
        .agg(
            F.count(F.lit(1)).alias("_viols"),
            F.sum(F.when(is_error, 1).otherwise(0)).alias("_errors"),
        )
    )


def run_validation(
    spark: SparkSession,
    clips: DataFrame,
    dims: dict[str, DataFrame] | None = None,
    catalog: RuleCatalog | None = None,
    *,
    run_ts: str | None = None,
    partition_col: str = "partition",
    checkpoint_dir: str | None = None,
    resume: bool = False,
    cache_input: bool = True,
    reliable_cache: bool = False,
    profile_columns: list[str] | None = None,
    exclude_partitions: list[str] | None = None,
    batch_member: bool = False,
    defer_checkpoint: bool = False,
) -> ValidationResult:
    """Run the full catalog; returns lazily-built violations + materialized
    verdicts (the verdict aggregation is the single action that executes the
    whole plan).

    ``exclude_partitions``: prune these partitions from the wide pass
    exactly like already-checkpointed ones. This is the partition-batching
    hook (jobs/validate_job.py ``--partition-batches``): a 10^12-row run
    split into K batches checkpoints after each, so a mid-job failure
    loses at most one batch, and the union of the batched runs' violations
    is multiset-identical to the single-run output (asserted in
    tests/test_resume.py).
    ``batch_member``: marks every batch EXCEPT the global-state owner
    (batch 0). A member batch validates only its own partitions: it drops
    NULL-partition rows (a NULL partition can never be excluded by value
    or marked done, so exactly one batch must own them), skips run-level
    synthetics (schema/aux findings), and skips ALL global-grain rules —
    the owner batch runs each global-grain rule ONCE over the full key
    set and emits its rows for every partition, instead of every batch
    re-scanning the full table (K× full key scans was the dominant
    batching overhead at scale). Callers composing batches manually should
    consult ``checkpoint.owner_complete`` on relaunch and pass
    ``batch_member=True`` for batch 0 once its first attempt completed —
    otherwise the relaunch re-emits run-level rows (validate_job does this).
    ``defer_checkpoint``: skip the engine's own checkpoint append so the
    caller can write it AFTER its output writes are durable — a crash
    between a checkpoint append and the output write would otherwise mark
    partitions done whose violations never landed anywhere.

    Member-batch degradation caveat: members mirror the owner's per-rule
    degradation (a rule that fails analysis is skipped) WITHOUT re-reporting
    the RULE_ERROR/AUX_* synthetic — the owner's single emission records
    it, keeping the batched union multiset-identical to a single run. The
    flip side: if the environment changes BETWEEN a crash and its relaunch
    (a dim becomes empty, a rule newly breaks), an owner-done relaunch runs
    only members and the new failure is skipped without a synthetic row.
    Batched runs assume a stable catalog/dims across attempts; after an
    environment change, start a fresh checkpoint dir."""
    dims = dims or {}
    if catalog is None:
        from data_check_spark.rules.catalog_audio import audio_catalog

        catalog = audio_catalog()
    run_id = uuid.uuid4().hex[:12]
    run_ts = run_ts or time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())
    t0 = time.monotonic()

    import os as _os
    import sys as _sys

    _debug = _os.environ.get("DATA_CHECK_DEBUG_TIMING") == "1"

    def _mark(label: str, since: float) -> None:
        if _debug:
            print(f"[timing] {label}: {time.monotonic() - since:.1f}s", file=_sys.stderr, flush=True)

    schema_problems = validate_schema(clips, CLIPS_SCHEMA)

    # --- pre-flight: rules whose dimension is missing or empty are skipped
    # and replaced by synthetic violations (reference: aux-file-missing
    # early return with placeholder rows, dekispart.py:1316-1328).
    synthetic: list[tuple[str, str, str | None, str]] = []
    if not batch_member:
        # Run-level findings belong to the global-state-owning run: in
        # batched mode only batch 0 reports them, or the batched union
        # would repeat each schema problem once per batch.
        for prob in schema_problems:
            synthetic.append(("SCHEMA_MISMATCH", "N/A", None, prob))
    unavailable_dims: set[str] = set()
    needed_dims = {
        r.params["dim"] for r in catalog.set_oriented if "dim" in r.params
    } | ({"baseline_stats"} if any(r.kind == "drift" for r in catalog.set_oriented) else set())
    # One Spark job probes ALL dims for emptiness (a per-dim isEmpty() is a
    # tiny job per dimension per run — they fold into a single union scan of
    # one row each).
    provided = [n for n in sorted(needed_dims) if n in dims]
    nonempty: set[str] = set()
    if provided:
        heads = reduce(
            DataFrame.union,
            [dims[n].limit(1).select(F.lit(n).alias("_dim")) for n in provided],
        )
        nonempty = {r["_dim"] for r in heads.collect()}
    for name in sorted(needed_dims):
        if name not in dims:
            unavailable_dims.add(name)
            if not batch_member:  # run-level finding: batch 0 owns
                synthetic.append((f"AUX_MISSING_{name.upper()}", "N/A", None, f"dimension {name} not provided"))
        elif name not in nonempty:
            unavailable_dims.add(name)
            if not batch_member:
                synthetic.append((f"AUX_EMPTY_{name.upper()}", "N/A", None, f"dimension {name} is empty"))
    if unavailable_dims:
        skipped = [
            r for r in catalog.set_oriented
            if r.params.get("dim") in unavailable_dims
            or (r.kind == "drift" and "baseline_stats" in unavailable_dims)
        ]
        catalog = RuleCatalog([r for r in catalog if r not in skipped])

    # Resume: the wide (bytes + SNR) pass runs only on partitions not yet
    # checkpointed. Global-grain rules (uniqueness, orphan) still see the
    # FULL key set via a narrow column-pruned scan of the original table —
    # a key-only scan is ~1% of the wide bytes at 10^12 rows, and without it
    # a duplicate spanning a completed and a new partition would be missed.
    cp_done: list[str] = []
    clips_full = clips
    if resume and checkpoint_dir:
        cp_done = cp.completed_partitions(spark, checkpoint_dir)
    # Out-of-batch partitions ride the same pruning as checkpointed ones;
    # attribution of global-grain output filters on cp_done ONLY (the
    # owner batch emits global rows for the whole table, excluded
    # partitions included — member batches skip global-grain entirely).
    done = sorted(set(cp_done) | set(exclude_partitions or []))
    if done:
        clips = cp.prune_completed(clips, done, partition_col)
    if batch_member:
        clips = clips.filter(F.col(partition_col).isNotNull())

    # --- single wide pass: byte_len + SNR in one mapInPandas stage, then the
    # binary column is gone. Everything downstream is narrow.
    audio_rules = [r for r in catalog.set_oriented if r.kind == "audio_decode"]
    caps = {r.params.get("cap_ms", 100) for r in audio_rules}
    if len(caps) > 1:
        # SNR is computed once in the wide pass; two rules disagreeing on the
        # decode cap would silently share the first rule's SNR column.
        raise ValueError(
            f"audio_decode rules disagree on cap_ms ({sorted(caps)}); "
            "use one cap per catalog (the wide pass decodes once)"
        )
    if "bytes" in clips.columns:
        cap = audio_rules[0].params.get("cap_ms", 100) if audio_rules else 100
        prepared = prepare_clips(clips, cap_ms=cap, with_snr=bool(audio_rules))
    else:
        prepared = clips.withColumn("byte_len", F.lit(None).cast("long")).withColumn(
            SNR_COL, F.lit(None).cast("double")
        )

    if cache_input:
        # Materialize NOW via eager checkpoint: (1) rule subplan branches
        # racing inside one job would each recompute the wide scan before
        # cache blocks landed; (2) Spark's in-memory cache build on top of a
        # python stage measured ~12x slower at local[32] than checkpointing
        # the computed batches directly.
        #
        # Default localCheckpoint is fast but NOT fault-tolerant: an executor
        # loss mid-run loses its blocks and kills the job. ``reliable_cache``
        # writes the narrow table to the cluster checkpoint dir instead
        # (HDFS/S3) so a 10^12-row run survives executor loss at the cost of
        # one distributed write — the right default on a real cluster.
        _t = time.monotonic()
        if reliable_cache:
            sc = spark.sparkContext
            if sc.getCheckpointDir() is None:
                if checkpoint_dir is None:
                    raise ValueError(
                        "reliable_cache needs sc.setCheckpointDir(...) or a "
                        "checkpoint_dir argument"
                    )
                sc.setCheckpointDir(f"{checkpoint_dir}/_spark_checkpoint")
            prepared = prepared.checkpoint(eager=True)
        else:
            prepared = prepared.localCheckpoint(eager=True)
        # The narrow table is consumed by ~8 rule subplans; zero-shuffle
        # coalesce to the shuffle-partition count so each downstream wave
        # schedules that many tasks instead of one per input split.
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        if prepared.rdd.getNumPartitions() > 2 * n_parts:
            prepared = prepared.coalesce(2 * n_parts)
        _mark("wide_pass_checkpoint", _t)

    # --- per-rule isolation (reference: a crashing per-row check degrades to
    # UNEXPECTED_ERROR_<fn> violation rows, dekispart.py:1151-1157). Each
    # rule's compile + analysis (column resolution, type check — no job) and
    # regex precompile run individually; a broken rule becomes a synthetic
    # RULE_ERROR_<id> row and the rest of the catalog still runs.
    parts: list[DataFrame] = []
    compiled = []
    candidates: list[tuple[Rule, list]] = []
    for r in catalog.row_local:
        try:
            for pat in [r.params.get("pattern"), *(r.params.get("any_of") or [])]:
                if pat is not None:  # JVM regex compiles lazily at first eval
                    spark._jvm.java.util.regex.Pattern.compile(pat)
            candidates.append((r, compile_rule_many(r, run_ts)))
        except Exception as e:  # noqa: BLE001 — degrade, don't die
            if not batch_member:
                # Analysis errors are plan-time, identical in every batch:
                # run-level findings the owner reports once (members still
                # skip the broken rule, they just don't re-report it).
                synthetic.append(
                    (f"RULE_ERROR_{r.rule_id}", "N/A", None, str(e).splitlines()[0][:200])
                )
    # analysis-only probe (resolves columns/types, runs no job): ONE batched
    # analysis on the healthy path; only when something is broken fall back
    # to per-rule probes to attribute the failure — a per-rule .schema costs
    # a py4j analysis round-trip each, which adds up across the catalog.
    try:
        if candidates:
            prepared.select(
                *[
                    e
                    for i, (_, rc) in enumerate(candidates)
                    for j, c in enumerate(rc)
                    for e in (
                        c.predicate.cast("boolean").alias(f"_p{i}_{j}"),
                        c.observed.alias(f"_o{i}_{j}"),
                    )
                ]
            ).schema
        compiled = [c for _, rc in candidates for c in rc]
    except Exception:  # noqa: BLE001 — bisect to the broken rule(s)
        for r, rule_compiled in candidates:
            try:
                for c in rule_compiled:
                    prepared.select(c.predicate.cast("boolean"), c.observed).schema
                compiled.extend(rule_compiled)
            except Exception as e:  # noqa: BLE001 — degrade, don't die
                if not batch_member:  # run-level finding: batch 0 owns
                    synthetic.append(
                        (f"RULE_ERROR_{r.rule_id}", "N/A", None, str(e).splitlines()[0][:200])
                    )
    if compiled:
        parts.append(apply_row_rules(prepared, compiled, partition_col=partition_col))

    # All drift rules share ONE sketch pass (one mapInPandas + one merge
    # shuffle regardless of how many columns are monitored).
    drift_rules = [r for r in catalog.set_oriented if r.kind == "drift"]
    if drift_rules:
        from data_check_spark.operators.drift import drift_violations_multi

        _t = time.monotonic()
        parts.append(
            drift_violations_multi(
                prepared,
                dims["baseline_stats"],
                [(r.rule_id, r.column, r.params.get("threshold", 0.25)) for r in drift_rules],
                partition_col=partition_col,
            )
        )
        _mark("dispatch drift (fused)", _t)

    # Fuse FK-anti + orphan + byte-match rules that target the same dim into
    # ONE full-outer join (3 joins -> 1). Resume runs keep the per-rule path
    # because the orphan rule is global-grain there (full key scan).
    fused_ids: set[str] = set()
    if not done:
        by_dim: dict[tuple[str, str, str], dict[str, Rule]] = {}
        for r in catalog.set_oriented:
            if r.kind == "referential" and r.params.get("mode") in ("anti", "orphan"):
                key = (r.params["dim"], r.column or "clip_id", r.params.get("dim_key", "clip_id"))
                by_dim.setdefault(key, {})[r.params["mode"]] = r
            elif r.kind == "transcript_match":
                key = (r.params["dim"], r.params.get("dim_key", "clip_id"), r.params.get("dim_key", "clip_id"))
                by_dim.setdefault(key, {})["match"] = r
        for (dim_name, fact_key, dim_key), group in by_dim.items():
            if len(group) < 2:
                continue
            from data_check_spark.operators.referential import fused_dim_checks

            _t = time.monotonic()
            anti = group.get("anti")
            orphan = group.get("orphan")
            match = group.get("match")
            parts.append(
                fused_dim_checks(
                    prepared,
                    dims[dim_name],
                    fact_key=fact_key,
                    dim_key=dim_key,
                    partition_col=partition_col,
                    anti_rule=anti.rule_id if anti else None,
                    anti_gate=gate_condition(anti.gate, run_ts, anti.rule_id)
                    if anti and anti.gate else None,
                    orphan_rule=orphan.rule_id if orphan else None,
                    match_rule=match.rule_id if match else None,
                    fact_text=match.column if match else None,
                    ref_text=match.params.get("ref_column") if match else None,
                )
            )
            fused_ids.update(r.rule_id for r in group.values())
            _mark(f"dispatch fused dim checks ({dim_name})", _t)

    # Row-grain and value-grain uniqueness on the same column share ONE
    # duplicate-key computation (lazily checkpointed: computed by the first
    # consumer, reused by the second).
    from data_check_spark.operators.uniqueness import duplicate_keys

    uniq_src = clips_full if done else prepared

    def _ungated_uniq(col: str) -> int:
        return sum(
            1 for r in catalog.set_oriented
            if r.kind in ("unique", "aggregate_unique") and (r.column or "clip_id") == col
            and not r.gate
        )

    shared_dups = {
        col: duplicate_keys(uniq_src, col).localCheckpoint(eager=False)
        for col in {r.column or "clip_id" for r in catalog.set_oriented
                    if r.kind in ("unique", "aggregate_unique") and not r.gate}
        if _ungated_uniq(col) > 1
    }

    for rule in catalog.set_oriented:
        if rule.kind == "drift" or rule.rule_id in fused_ids:
            continue
        # cat_drift / rate_drift / volume_drift are global-grain too: their
        # baseline is the CURRENT table (mix / rate / mean size), which a
        # resume run must compute over all partitions, not just the
        # remaining ones.
        # func_dep too: the violating-key set depends on the whole table.
        # reconcile: orphan child totals are not partition-scoped (no parent
        # row), so like referential/orphan a resume run must see all keys.
        # cardinality: child counts are a global property of the child
        # table — a resume run must count over all children.
        # outlier: fences are per-group — when grouped by the partition
        # column (the default) each partition's fence is self-contained, so
        # partition grain; grouped by anything else, the fence spans
        # partitions and a resume run must learn it over the whole table.
        global_grain = rule.kind in (
            "unique", "aggregate_unique", "cat_drift", "rate_drift", "volume_drift",
            "func_dep", "reconcile", "cardinality",
        ) or (
            rule.kind == "referential" and rule.params.get("mode") == "orphan"
        ) or (
            rule.kind == "outlier"
            and rule.params.get("group_by") not in (None, partition_col)
        )
        dups = None if rule.gate else shared_dups.get(rule.column or "clip_id")
        _t = time.monotonic()
        if global_grain and batch_member:
            # Member batches never run global-grain rules: the owner batch
            # scans the full key set ONCE and emits every partition's rows
            # (K× full-table key scans was the dominant batching overhead
            # at scale). Hoisted OUT of the `done` check: a member with no
            # exclusions and an empty checkpoint must still skip, or it
            # double-reports against the owner.
            continue
        try:
            if done and global_grain:
                # Full-table key scan (column-pruned; never touches bytes).
                v = _dispatch_set_rule(rule, clips_full, dims, partition_col=partition_col,
                                       shared_dups=dups, run_ts=run_ts)
                if cp_done and rule.kind in (
                    "unique", "cat_drift", "rate_drift", "volume_drift",
                    "func_dep", "outlier", "reconcile", "cardinality",
                ):
                    # Partition-attributed output: rows in partitions a
                    # PREVIOUS attempt checkpointed were already reported
                    # by that attempt. Keep NULL-partition rows — ~isin is
                    # three-valued and would silently drop them.
                    v = v.filter(
                        ~F.col("partition").isin(cp_done)
                        | F.col("partition").isNull()
                    )
                parts.append(v)
            else:
                parts.append(_dispatch_set_rule(rule, prepared, dims, partition_col=partition_col,
                                                shared_dups=dups, run_ts=run_ts))
        except Exception as e:  # noqa: BLE001 — same per-rule degradation
            if not batch_member:  # run-level finding: batch 0 owns
                synthetic.append(
                    (f"RULE_ERROR_{rule.rule_id}", "N/A", None, str(e).splitlines()[0][:200])
                )
        _mark(f"dispatch {rule.rule_id}", _t)

    if synthetic:
        parts.append(
            spark.createDataFrame(synthetic, "rule_id string, clip_id string, partition string, observed string")
        )

    if not parts:
        # Legal but empty catalog (no rules, no synthetic rows): an empty
        # violations frame, not a reduce() over an empty iterable.
        parts.append(
            spark.createDataFrame(
                [], "rule_id string, clip_id string, partition string, observed string"
            )
        )
    # localCheckpoint (lazy) rather than persist: a persisted plan compiles
    # non-adaptively (no runtime broadcast conversion) and measured 5x
    # slower; the checkpoint materializes through the normal AQE path on the
    # first action (the verdict job) and later actions reuse the stored rows.
    violations = reduce(DataFrame.unionByName, parts).localCheckpoint(eager=False)

    # Per-partition verdicts: rows scanned vs violations (partition-grain
    # violations with NULL clip_id count against their partition too).
    # Severity tier (reference: エラー vs 警告, check_definitions.json:954-960):
    # warning-severity rules are counted but do NOT fail a partition — a
    # partition whose only violations are warnings passes.
    warning_ids = sorted(
        {c.rule_id for c in compiled if c.severity == "warning"}
        | {r.rule_id for r in catalog.set_oriented if r.severity == "warning"}
    )
    rows_per_part = prepared.groupBy(F.col(partition_col).alias("partition")).agg(
        F.count(F.lit(1)).alias("rows_scanned")
    )
    viol_per_part = _partition_violation_counts(violations, warning_ids)
    verdicts = (
        rows_per_part.join(viol_per_part, "partition", "left")
        .select(
            "partition",
            (F.coalesce(F.col("_errors"), F.lit(0)) == 0).alias("passed"),
            "rows_scanned",
            F.coalesce(F.col("_viols"), F.lit(0)).alias("violations"),
        )
    )
    _t = time.monotonic()
    # Same AQE-preserving materialization rule as the violations frame.
    verdicts = verdicts.localCheckpoint(eager=False)
    rows_scanned = verdicts.agg(F.sum("rows_scanned")).collect()[0][0] or 0
    _mark("rule_plans_and_verdicts", _t)
    wall_ms = int((time.monotonic() - t0) * 1000)
    # Spark can't attribute wall-time to a logical partition inside one job;
    # the checkpoint stores the run-level wall time on each row (documented).
    verdicts = verdicts.withColumn("wall_time_ms", F.lit(wall_ms))

    if rows_scanned == 0 and not batch_member:
        # Empty fact table is itself a violation (reference: empty-df
        # placeholder rows, dekispart.py:1330-1337). A resumed/partial run
        # scanning 0 rows is NOT an empty table (its partitions were
        # pruned), so those paths probe the PRE-pruned table — one take(1)
        # on a column-pruned scan, paid only in the already-degenerate
        # 0-rows-scanned case. Without the probe, batched mode (which
        # always passes resume=True) could never report an empty table.
        fresh_run = not (resume and checkpoint_dir) and not exclude_partitions
        if fresh_run or not clips_full.select(partition_col).take(1):
            empty_row = spark.createDataFrame(
                [("EMPTY_INPUT", "N/A", None, "fact table has no rows")],
                "rule_id string, clip_id string, partition string, observed string",
            )
            violations = violations.unionByName(empty_row)

    if checkpoint_dir and not defer_checkpoint:
        cp.write_checkpoint(verdicts, checkpoint_dir, run_id)

    # Optional per-partition column stats (north-rule "column stats"
    # family): one extra aggregation over the NARROW checkpointed table —
    # never the wide scan. approx distinct (HLL++) keeps the per-group plan
    # a plain partial+final aggregate (the exact path's Expand would
    # multiply every row by len(profile_columns) before the shuffle).
    profile = None
    if profile_columns:
        from data_check_spark.operators.profile import column_profile

        profile = column_profile(
            prepared, profile_columns, approx=True, group_by=partition_col
        )

    return ValidationResult(
        violations=violations,
        verdicts=verdicts,
        run_id=run_id,
        wall_time_ms=wall_ms,
        rows_scanned=int(rows_scanned),
        schema_problems=schema_problems,
        profile=profile,
    )


def run_series_validations(
    spark: SparkSession,
    jobs: dict[str, tuple[DataFrame, dict[str, DataFrame], "RuleCatalog"]],
    *,
    run_ts: str | None = None,
    partition_col: str = "partition",
) -> tuple[DataFrame, DataFrame, dict[str, ValidationResult]]:
    """Validate several fact tables ("series") and union the results.

    The reference dispatches one checker module per series and concatenates
    their result frames under a series column (data_check.py:1050-1094);
    here each series gets its own run_validation and the outputs gain a
    ``series`` column. run_ts is pinned ONCE across all series so
    date-sensitive rules agree."""
    import time as _time

    run_ts = run_ts or _time.strftime("%Y-%m-%d %H:%M:%S", _time.gmtime())
    results: dict[str, ValidationResult] = {}
    v_parts: list[DataFrame] = []
    d_parts: list[DataFrame] = []
    for series, (clips, dims, catalog) in jobs.items():
        res = run_validation(
            spark, clips, dims, catalog, run_ts=run_ts, partition_col=partition_col
        )
        results[series] = res
        v_parts.append(res.violations.select(F.lit(series).alias("series"), "*"))
        d_parts.append(
            res.verdicts.select(F.lit(series).alias("series"), "*")
        )
    violations = reduce(DataFrame.unionByName, v_parts)
    verdicts = reduce(DataFrame.unionByName, d_parts)
    return violations, verdicts, results


def reconcile_outputs(
    spark: SparkSession,
    output_dir: str,
    checkpoint_dir: str,
    *,
    warning_ids: list[str] | None = None,
    fallback_lineage: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Exactly-once read view over validate_job's at-least-once appends.

    The job writes outputs BEFORE the checkpoint (a crash between the two
    must re-validate, never mark rows done that were never written), which
    means a crash in that window leaves an ORPHAN attempt in the output dir:
    committed violation/verdict rows under a run_id that was never
    checkpointed, re-validated by the relaunch under a fresh run_id. This
    reader reconciles by checkpoint lineage:

    - valid run_ids = the ``lineage`` values of latest-done checkpoint rows
      (each run_validation call appends its whole batch's rows + lineage in
      ONE write, so run_id granularity is exact) — orphan attempts are
      dropped wholesale;
    - NULL-partition / run-level rows (never checkpointable by partition)
      are taken from the owner-sentinel lineage when present (batched mode:
      exactly one owner emission), else from the most recent lineage (plain
      resume: the LAST attempt rescans all NULL rows, earlier attempts'
      copies are superseded);
    - verdicts are recomputed from the reconciled violations, so member
      partitions whose only violations are global-grain rows (emitted by
      the owner batch, invisible to their own batch) get the same
      violation counts and pass/fail the single run would report.

    Returns (violations, verdicts). ``warning_ids``: rules whose violations
    do not fail a partition (pass the catalog's warning-severity ids —
    engine parity requires the same severity tiering). ``fallback_lineage``:
    the caller's own run_id, used only when the checkpoint holds zero done
    rows (legal for an empty-input run) so the run-level rows still
    reconcile instead of raising.

    Known edge outside the guarantee — DETECTED, raises: in BATCHED mode,
    ``mark_failed`` on a partition the OWNER batch validated, followed by a
    relaunch, would mix that partition's old owner-lineage rows (kept —
    they share a run_id with the owner's member-partition global-grain
    rows, which must survive) with the re-validating attempt's rows. That
    shape is recognizable in the checkpoint alone (a non-sentinel partition
    with a done row under the owner lineage whose LATEST done lineage is a
    different run_id) and this reader raises ValueError with the remedy
    (repair owner-batch partitions via a fresh checkpoint dir) instead of
    returning a silently-duplicated view. Member-batch partitions reconcile
    correctly through the same mark_failed workflow."""
    from data_check_spark import checkpoint as cp

    cpdf = cp.read_checkpoint(spark, checkpoint_dir)
    if cpdf is None:
        raise ValueError(f"no checkpoint at {checkpoint_dir!r} — nothing to reconcile")
    latest = (
        cpdf.groupBy("partition")
        .agg(
            F.max_by(
                F.struct("status", "lineage", "completed_at"), F.col("completed_at")
            ).alias("w")
        )
        .select("partition", "w.status", "w.lineage", "w.completed_at")
        .filter(F.col("status") == "done")
    )
    rows = latest.collect()  # bounded by the partition count by contract
    sentinel = [r for r in rows if r["partition"] == cp.OWNER_SENTINEL]
    # (partition -> latest-done lineage) pairs, NOT a flat run_id set: a
    # partition re-validated under a second checkpointed lineage (e.g.
    # mark_failed + relaunch) has rows under BOTH run_ids in the output,
    # and only its latest-done attempt's rows may survive. The owner
    # sentinel's lineage is additionally valid for EVERY partition: the
    # owner emits member partitions' global-grain rows under its own
    # run_id, exactly once (a relaunched owner runs as a member).
    pairs = [
        (r["partition"], r["lineage"])
        for r in rows
        if r["partition"] != cp.OWNER_SENTINEL
    ]
    if sentinel:
        # Detect the one shape this reader cannot reconcile: an OWNER-batch
        # partition repaired via mark_failed + relaunch in the SAME
        # checkpoint dir. Its latest-done lineage is the repair attempt,
        # but its original per-row violations live under the owner lineage
        # — which must stay valid globally (it carries every member
        # partition's global-grain rows), so the old rows cannot be
        # filtered out by partition+run_id and the view would duplicate.
        # The checkpoint alone reveals the shape: a non-sentinel partition
        # with a done row under the owner lineage whose latest-done row is
        # a different lineage. Raise with the remedy rather than return a
        # silently-duplicated multiset. Bounded collect: distinct owner-
        # batch partitions only.
        _owner_lineages = sorted({s["lineage"] for s in sentinel})
        _owner_done_parts = {
            r["partition"]
            for r in cpdf.filter(
                (F.col("status") == "done")
                & F.col("lineage").isin(_owner_lineages)
                & (F.col("partition") != cp.OWNER_SENTINEL)
            )
            .select("partition")
            .distinct()
            .collect()
        }
        _conflicted = sorted(
            p
            for p, rid in pairs
            if p in _owner_done_parts and rid not in _owner_lineages
        )
        if _conflicted:
            raise ValueError(
                "cannot reconcile exactly-once: partition(s) "
                f"{_conflicted} were validated by the OWNER batch and later "
                "re-validated under a different lineage (mark_failed + "
                "relaunch into the same checkpoint dir). Owner-lineage rows "
                "cannot be split by grain, so the reconciled view would "
                "duplicate these partitions' violations. Repair owner-batch "
                "partitions with a fresh --checkpoint-dir (and a fresh "
                "output dir) instead."
            )
        null_rid = sentinel[0]["lineage"]
    elif rows:
        null_rid = max(rows, key=lambda r: r["completed_at"])["lineage"]
    elif fallback_lineage is not None:
        # A checkpoint dir with zero done rows is legal: an empty-input run
        # writes run-level rows (EMPTY_INPUT) and a zero-row checkpoint.
        # The caller's own run_id anchors those rows; without it there is
        # no lineage to reconcile against.
        null_rid = fallback_lineage
        pairs = []
    else:
        raise ValueError(
            f"checkpoint at {checkpoint_dir!r} has no completed rows and no "
            "fallback_lineage was given — nothing to reconcile against"
        )
    pair_df = F.broadcast(
        spark.createDataFrame(
            pairs or [(None, None)], "partition string, run_id string"
        ).filter(F.col("partition").isNotNull())
    )
    owner_rids = {s["lineage"] for s in sentinel} | (
        {fallback_lineage} if fallback_lineage is not None and not rows else set()
    )

    def _attributed_ok(df: DataFrame) -> DataFrame:
        """non-NULL-partition rows valid under their partition's latest-done
        lineage, plus owner-lineage rows for any partition."""
        by_pair = df.join(pair_df, ["partition", "run_id"], "left_semi")
        if owner_rids:
            return by_pair.unionByName(
                df.join(pair_df, ["partition", "run_id"], "left_anti").filter(
                    F.col("partition").isNotNull()
                    & F.col("run_id").isin(sorted(owner_rids))
                )
            )
        return by_pair

    # Explicit schemas: an empty-input run writes zero rows under
    # partitionBy(run_id) — no part files — and schema inference would
    # fail on the empty directory.
    v = spark.read.schema(
        "rule_id string, clip_id string, partition string, observed string, "
        "run_id string"
    ).parquet(f"{output_dir}/violations")
    d = spark.read.schema(
        "partition string, passed boolean, rows_scanned long, "
        "violations long, wall_time_ms long, run_id string"
    ).parquet(f"{output_dir}/verdicts")
    violations = _attributed_ok(v).unionByName(
        v.filter(F.col("partition").isNull() & (F.col("run_id") == null_rid))
    )

    viol_per_part = _partition_violation_counts(violations, sorted(warning_ids or []))
    verdicts = (
        # NULL-partition verdict rows need the same lineage restriction as
        # NULL violations: every resume attempt re-emits one (never
        # checkpointable), so keeping them from every valid run_id would
        # duplicate the NULL verdict and double-count its rows_scanned.
        _attributed_ok(d)
        .unionByName(
            d.filter(F.col("partition").isNull() & (F.col("run_id") == null_rid))
        )
        .select("partition", "rows_scanned", "wall_time_ms", "run_id")
        .join(viol_per_part, "partition", "left")
        .select(
            "partition",
            (F.coalesce(F.col("_errors"), F.lit(0)) == 0).alias("passed"),
            "rows_scanned",
            F.coalesce(F.col("_viols"), F.lit(0)).alias("violations"),
            "wall_time_ms",
            "run_id",
        )
    )
    return violations, verdicts
