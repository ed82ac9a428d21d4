"""Physical-plan quality assertions — the 100 TB design contract.

These tests pin the properties that make the engine viable at scale:
filters reach the parquet scan, small dims broadcast, aggregations have a
map-side partial phase, scans are column-pruned, and the wide table goes
through exactly ONE python stage.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_filter_pushed_to_scan(spark):
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["topk_open_orders"](spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)" in plan
    assert "TakeOrderedAndProject" in plan


def test_region_revenue_broadcasts_dims(spark):
    from data_check_spark.queries import QUERIES

    df = QUERIES["region_revenue"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "CartesianProduct" not in plan
    # lineitem scan pruned to the join/agg columns only
    import re

    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li = [s for s in scans if "l_extendedprice" in s]
    assert li and "l_shipdate" not in li[0] and "l_tax" not in li[0]


def test_dup_values_has_partial_aggregation(spark):
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["dup_values_lineitem"](spark, SF_DIR))
    # two-phase: map-side partial count before the exchange, final after
    assert "partial_count" in plan or "HashAggregate(keys=" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_row_rules_single_scan(spark):
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["row_rules_orders"](spark, SF_DIR))
    # single-pass property: all 5 rules evaluate over exactly ONE scan
    assert plan.count("Scan parquet") == 1
    assert "Generate explode" in plan


def test_semi_join_is_broadcast(spark):
    """Dim size is unknown to the operator (no count job is spent on it);
    AQE must convert the semi join to broadcast at runtime."""
    from data_check_spark.queries import QUERIES

    df = QUERIES["semi_negative_balance_orders"](spark, SF_DIR)
    df.collect()  # materialize so AQE finalizes the adaptive plan
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "PushedFilters" in plan


def test_referential_no_count_job_when_size_unknown(spark, monkeypatch):
    """Unknown dim size must NOT trigger a count() job (one full dim scan
    per rule per run at cluster scale)."""
    from pyspark.sql import DataFrame

    from data_check_spark.operators.referential import anti_join_violations

    fact = spark.createDataFrame([("a", "p")], "clip_id string, partition string")
    dim = spark.createDataFrame([("a",)], "clip_id string")

    def boom(self):
        raise AssertionError("count() called during referential plan build")

    monkeypatch.setattr(DataFrame, "count", boom)
    anti_join_violations(fact, dim, "FK")  # plan build only — must not count


def test_wide_pass_single_python_stage(spark, tmp_path):
    from data_check_spark.datagen import clips_df
    from data_check_spark.operators.audio import prepare_clips

    path = str(tmp_path / "clips")
    clips_df(spark, 2000, bytes_cap_ms=20).drop("_gen_id", "_viol").write.parquet(path)
    plan = _plan(prepare_clips(spark.read.parquet(path), cap_ms=20))
    # exactly one python boundary over the scan; no ArrowEvalPython join-back
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_text_and_dedup_stay_jvm_side(spark):
    from data_check_spark.operators.dedup import minhash_signatures
    from data_check_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert "EvalPython" not in _plan(quality_score(docs))
    assert "EvalPython" not in _plan(minhash_signatures(docs))


def test_ann_broadcasts_queries(spark):
    from pyspark.sql import functions as F

    from data_check_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2).selectExpr("vec_id as q_id", "embedding as q_vec")
    plan = _plan(cosine_topk(emb, q, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_lsh_near_dup_pairs_no_all_pairs_join(spark):
    """The LSH embedding-pair route must never plan an all-pairs join; the
    guarded exact baseline is the only O(n^2) surface and it refuses large
    corpora."""
    from data_check_spark.operators.similarity import lsh_near_dup_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(lsh_near_dup_pairs(emb, threshold=0.3))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_date_parse_single_scan(spark):
    """Both date_parse outputs (primary + parse-error escalation) evaluate
    in the same single-pass projection as every other row-local rule."""
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["date_parse_orders"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "Generate explode" in plan


def test_corpus_curation_single_scan(spark):
    """Fingerprint + quality + lang-ID compute in ONE text scan; at 100 TB
    three joined projections would triple the dominant IO."""
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["corpus_curation_documents"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1


def test_audio_stats_chained_python_stages_no_shuffle(spark):
    """synth -> decode are chained Arrow stages over ONE scan: no shuffle
    between them (the binary column is born and dies inside the python
    stages), no join anywhere (BENCH/PLANS.md audio_stats_documents)."""
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["audio_stats_documents"](spark, SF_DIR))
    assert plan.count("MapInPandas") == 2
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan
    # the only exchange is the _docs_parallel round-robin repartition,
    # BEFORE both python stages — nothing shuffles between synth and decode
    assert plan.count("Exchange") == 1
    assert plan.index("Exchange") > plan.index("MapInPandas")  # plan prints top-down


def test_media_feature_extract_single_python_stage(spark):
    """Payload synthesis is pure JVM projection; ONE mapInPandas consumes it
    over a single scan with no join (BENCH/PLANS.md media_feature_extract)."""
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["media_feature_extract"](spark, SF_DIR))
    assert plan.count("MapInPandas") == 1
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_voiced_segments_chained_python_stages(spark):
    """synth -> segment are chained Arrow stages over ONE scan, like
    audio_stats; the per-clip segment fan-out happens inside the second
    python stage, never via a join or an extra shuffle. The final sort is
    the query's deterministic output ORDER BY."""
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["voiced_segments_documents"](spark, SF_DIR))
    assert plan.count("MapInPandas") == 2
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_cardinality_child_folds_before_join(spark):
    """Cardinality: the child side must collapse to (key, count) with a
    map-side partial BEFORE its exchange — child rows never shuffle — and
    the keyed join must not degrade to a nested loop."""
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["cardinality_orders_lineitem"](spark, SF_DIR))
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_benford_single_scan_and_pruned(spark):
    """Benford: exactly one scan of orders, pruned to the value column."""
    import re

    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["benford_orders"](spark, SF_DIR))
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert len(scans) == 1
    assert "o_totalprice" in scans[0] and "o_orderkey" not in scans[0]


def test_label_conflict_no_text_past_first_projection(spark):
    """Duplicate-label conflicts: the raw text must die in the scan-side
    projection (only the 128-bit fingerprint shuffles)."""
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["label_conflict_documents"](spark, SF_DIR))
    # the only data exchange is keyed by the md5 fingerprint (two-phase
    # aggregate); raw text never reaches a shuffle
    assert "hashpartitioning(fingerprint" in plan
    assert "hashpartitioning(text" not in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_extraction_quality_single_scan_no_shuffle(spark):
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["extraction_quality_documents"](spark, SF_DIR))
    # pure JVM projection: one parquet scan, no exchange, no python stage
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_dataset_card_bounded_plan(spark):
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["dataset_card_documents"](spark, SF_DIR))
    # global aggregate has a map-side partial phase; the 1-row x 1-row
    # cross join is a nested loop over two single-row frames (bounded);
    # no corpus-sized window appears anywhere
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "Window" not in plan
    assert plan.index("Aggregate") < plan.index("Exchange")


def test_cluster_representatives_window_keyed_by_cluster(spark):
    from data_check_spark.queries import QUERIES

    plan = _plan(QUERIES["cluster_representatives_documents"](spark, SF_DIR))
    # the row_number window must be partitioned by cluster_id (never a
    # single-partition global window over the corpus)
    assert "windowspecdefinition(cluster_id" in plan


def test_ivf_add_batch_assignment_no_join_no_shuffle(spark):
    """Incremental IVF maintenance must never join the batch against the
    corpus: assignment against fixed centroids is a pure projection
    (centroid array literals, codegen'd distance fold) — one scan of the
    arriving batch, zero exchanges, zero joins."""
    from data_check_spark.operators.similarity import (
        portable_ivf_assign,
        portable_ivf_train,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = portable_ivf_train(emb, n_lists=4, lloyd_iters=0)
    plan = _plan(portable_ivf_assign(emb, cents))
    assert "Join" not in plan
    assert "Exchange" not in plan
