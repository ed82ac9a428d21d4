"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation set.

Standard LLM-pipeline hygiene (the n-gram-overlap test used by GPT-3 /
PaLM / Llama data cards): a training doc is contaminated if any of its
word n-grams appears in any benchmark/eval document.

Plan shape (the part that matters at 100 TB):
- The EVAL side is small (benchmarks are ~10^6 n-grams, not 10^12), so its
  distinct n-gram set is **broadcast** — the training corpus is never
  shuffled, the scan stays a narrow projection + explode + broadcast hash
  semi-join. ``.explain`` shows BroadcastHashJoin, no Exchange on the
  training side.
- n-gram construction is pure JVM higher-order functions
  (split → transform/slice → concat_ws): zero Python, codegen end-to-end.
- Output is per-doc aggregate counts, keyed by doc id — the only shuffle is
  the final count-by-doc, whose input is already filtered to matches
  (tiny: contamination is the exception, not the rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_tokens(text_col: str) -> Column:
    """Whitespace tokens of trimmed text (empty → empty array) — the SAME
    tokenizer as token_stats/repetition_stats (operators/text.py), so the
    decontamination n-grams can never silently diverge from the token
    statistics computed over the same corpus."""
    from data_check_spark.operators.text import _tokens

    return _tokens(text_col)


def word_ngrams(text_col: str, n: int) -> Column:
    """Distinct space-joined word n-grams as array<string> (JVM HOFs)."""
    toks = word_tokens(text_col)
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return F.array_distinct(grams)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """Per-training-doc contamination report.

    Returns one row per training doc that shares ≥1 word n-gram with the
    eval set: ``(doc_id, n_shared_ngrams)`` where the count is over the
    doc's DISTINCT contaminated n-grams. Clean docs are absent (callers
    anti-join to drop contaminated docs; the absent-row convention keeps
    the result proportional to contamination, not corpus size).
    """
    etext = eval_text_col or text_col
    eval_grams = (
        eval_df.select(F.explode(word_ngrams(etext, n)).alias("g")).distinct()
    )
    train_grams = train.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("g")
    )
    hits = train_grams.join(F.broadcast(eval_grams), "g", "left_semi")
    return hits.groupBy(id_col).agg(F.count("*").alias("n_shared_ngrams"))
