"""Deduplication operators for training-data pipelines over `documents`.

Four families, each a scale-path design:

- ``exact_duplicate_groups`` — md5 fingerprint → two-phase hash aggregate.
  One shuffle keyed by a 128-bit fingerprint (never the raw text); map-side
  partial counts bound reducer input exactly like the clip-uniqueness rule.
- ``minhash_signatures`` / ``minhash_lsh_pairs`` — char-shingle MinHash with
  banding. Shingling, the 64 permutations (``xxhash64(shingle, perm)``) and
  band hashes are ALL built-in JVM expressions (nested higher-order
  functions) — zero Python. The only shuffle moves (band, band_hash) pairs;
  candidate pairs are verified by signature agreement, never by re-reading
  text. Bucket fan-out is capped (``max_bucket``) so a degenerate bucket
  (e.g. the empty document) cannot produce O(n²) pairs.
- ``simhash_64`` / ``simhash_near_pairs`` — 64-bit SimHash from token
  hashes. Token hashing stays JVM-side; the bit-vote fold is a vectorized
  pandas UDF over the long[] hash array (numpy bit unpacking, no per-row
  Python loops over bits). Near-pairs block on 16-bit chunks (any equal
  chunk → candidate, catches all pairs with hamming ≤ 3 by pigeonhole).
- ``ngram_jaccard_pairs`` — exact n-gram Jaccard for candidate pairs via a
  shingle-inverted-index join; the O(pairs) work is bounded by blocking keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_check_spark.operators.text import fingerprints

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicate_groups(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(fingerprint, n_docs, keep_id): one row per duplicated content value.

    keep_id = min doc id (first-wins, reference: dekispart.py:1088-1092).
    """
    fp = fingerprints(df, id_col=id_col, text_col=text_col)
    return (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def exact_duplicate_rows(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fingerprint, keep_id): every non-canonical duplicate row."""
    fp = fingerprints(df, id_col=id_col, text_col=text_col)
    groups = exact_duplicate_groups(df, id_col=id_col, text_col=text_col)
    return (
        fp.join(groups, "fingerprint")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(id_col, "fingerprint", "keep_id")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

SHINGLE_K = 8
NUM_PERM = 64
LSH_BANDS = 16  # 16 bands x 4 rows

# Engine-portable hash mode: xxhash64 (the default leaf hash) exists only on
# the JVM, so queries using it cannot be value-checked by the DuckDB oracle.
# ``portable=True`` swaps ONLY the leaf hash for a 60-bit md5 prefix plus
# affine permutations mod a Mersenne prime — every downstream stage (banding,
# bucket capping, candidate pairing, signature-agreement estimation) is
# byte-identical, so the oracle exercises the full LSH pipeline. md5 is ~3x
# slower than xxhash64 per shingle; production callers keep the default.
PORTABLE_PRIME = 2_147_483_647  # 2^31 - 1: a*h + b stays inside signed 64


def portable_perm_table(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation constants (a_p, b_p), inlined
    verbatim into the DuckDB oracle SQL — no RNG anywhere."""
    out = []
    for p in range(num_perm):
        a = (2654435761 * (p + 1)) % PORTABLE_PRIME
        b = (40503 * (p + 1) * (p + 1) + 17) % PORTABLE_PRIME
        out.append((a or 1, b))
    return out


def _portable_hash60(col: Column) -> Column:
    """First 60 bits of md5(utf8) as a non-negative long; DuckDB analog is
    cast(('0x' || substr(md5(s), 1, 15)) AS bigint)."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast("long")


def _affine(a: int, b: int):
    """Closure factory (HOF lambdas must be unary — arity is inspected)."""
    return lambda h: (h * a + b) % PORTABLE_PRIME


def _shingles_expr(text_col: str, k: int) -> Column:
    """Distinct k-char shingles as array<string> (JVM higher-order fns)."""
    t = F.col(text_col)
    n = F.length(t)
    return F.when(n < k, F.array(t)).otherwise(
        F.array_distinct(F.transform(F.sequence(F.lit(1), n - k + 1), lambda i: t.substr(i, F.lit(k))))
    )


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    num_perm: int = NUM_PERM,
    portable: bool = False,
) -> DataFrame:
    """(id, signature array<long>[num_perm]) — fully JVM-side MinHash."""
    sh = _shingles_expr(text_col, k)
    if not portable:
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(num_perm - 1)),
            lambda p: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, p))),
        )
        return df.select(F.col(id_col), sig.alias("signature"))
    # Portable mode: hash each shingle ONCE (md5 is the expensive leaf), then
    # apply the affine permutations to the cached base-hash array.
    base = df.select(
        F.col(id_col),
        F.transform(sh, lambda s: _portable_hash60(s) % PORTABLE_PRIME).alias("_hs"),
    )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_hs"), _affine(a, b)))
            for a, b in portable_perm_table(num_perm)
        ]
    )
    return base.select(F.col(id_col), sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    num_perm: int = NUM_PERM,
    bands: int = LSH_BANDS,
    threshold: float = 0.5,
    max_bucket: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold).

    Candidate generation: band-hash buckets; verification: fraction of
    agreeing minhashes (unbiased Jaccard estimate) — signatures only.

    ``portable=True`` (oracle mode) additionally changes the OUTPUT contract
    to integer columns (``n_agree``, ``est_q4``): %.4f-formatted fractions of
    64 hit exact decimal-rounding ties (k ≡ 2 mod 4), where Java HALF_UP and
    C half-even disagree — integer quantization is tie-free (CLAUDE.md).
    """
    rows = num_perm // bands

    def _band_hash(b: Column) -> Column:
        sl = F.slice(F.col("signature"), b * rows + 1, rows)
        if portable:  # grouping key as a plain joined string — engine-neutral
            return F.concat_ws(",", F.transform(sl, lambda v: v.cast("string")))
        return F.xxhash64(sl.cast("string"))

    sigs = minhash_signatures(
        df, id_col=id_col, text_col=text_col, k=k, num_perm=num_perm, portable=portable
    )
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        F.col("signature"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), _band_hash(b).alias("bh")),
            )
        ).alias("bb"),
    ).select("_id", "signature", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    # Bucket members, capped: a pathological bucket (empty docs, boilerplate)
    # is truncated deterministically by id order — logged, not silently vast.
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_list(F.struct(F.col("_id"), F.col("signature")))).alias("m"))
        .filter(F.size("m") > 1)
        .select(F.slice("m", 1, max_bucket).alias("m"))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("m"),
                            lambda a: F.transform(F.col("m"), lambda b: F.struct(a.alias("a"), b.alias("b"))),
                        )
                    ),
                    lambda p: p["a"]["_id"] < p["b"]["_id"],
                )
            ).alias("p")
        )
        .select(
            F.col("p.a._id").alias("id_a"),
            F.col("p.b._id").alias("id_b"),
            F.col("p.a.signature").alias("sig_a"),
            F.col("p.b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    n_agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    if portable:
        # est_q4 = round(n_agree / num_perm * 1e4); exact for power-of-2
        # num_perm (the division is by 2^k, so the double is exact).
        return (
            pairs.withColumn("n_agree", n_agree.cast("long"))
            .filter(F.col("n_agree").cast("double") / num_perm >= threshold)
            .select(
                "id_a",
                "id_b",
                "n_agree",
                F.floor((F.col("n_agree") * 10000 + F.lit(num_perm // 2)) / F.lit(num_perm))
                .cast("long")
                .alias("est_q4"),
            )
        )
    est = n_agree.cast("double") / F.lit(float(num_perm))
    return (
        pairs.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", F.format_string("%.4f", F.col("est_jaccard")).alias("est_jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_64(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", portable: bool = False
) -> DataFrame:
    """(id, simhash long): 64-bit SimHash over whitespace tokens.

    Token→hash is JVM (`xxhash64`); the per-doc bit vote runs as ONE
    vectorized pandas UDF over array<long> (numpy bit unpacking).

    ``portable=True`` swaps the token hash for the 60-bit md5 prefix (DuckDB
    oracle parity). Bits 60-63 of every hash are then 0, so those simhash
    bits always vote negative and land 0 — identical in both engines."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    if portable:
        hashes = F.transform(toks, lambda t: _portable_hash60(t))
    else:
        hashes = F.transform(toks, lambda t: F.xxhash64(t))

    @F.pandas_udf("long")
    def vote(hs: pd.Series) -> pd.Series:
        out = np.zeros(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            if arr is None or len(arr) == 0:
                continue
            a = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            # bits: (n_tokens, 64) sign votes
            bits = ((a[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            sh = np.bitwise_or.reduce(
                np.where(votes > 0, np.uint64(1) << np.arange(64, dtype=np.uint64), np.uint64(0))
            )
            out[i] = np.int64(np.uint64(sh).astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col), vote(hashes).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 256,
    portable: bool = False,
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via chunk blocking.

    The 64 bits are split into ``max_hamming + 1`` contiguous chunks, so by
    pigeonhole any pair within the hamming budget agrees on at least one
    chunk — chunk-equality blocking is COMPLETE for the requested radius at
    every ``max_hamming`` (a fixed 4-chunk split would silently miss pairs
    whose >3 differing bits spread across all four chunks)."""
    n_chunks = max_hamming + 1
    if n_chunks < 1 or n_chunks > 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    # Contiguous chunk boundaries; widths differ by at most 1 bit.
    bounds = [(c * 64 // n_chunks, (c + 1) * 64 // n_chunks) for c in range(n_chunks)]
    sh = simhash_64(df, id_col=id_col, text_col=text_col, portable=portable)
    chunked = sh.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        (
                            F.col("simhash")
                            if hi - lo == 64
                            else F.shiftright(F.col("simhash"), lo).bitwiseAND(
                                F.lit((1 << (hi - lo)) - 1)
                            )
                        ).alias("ck"),
                    )
                    for c, (lo, hi) in enumerate(bounds)
                ]
            )
        ).alias("cc"),
    ).select("_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.ck").alias("ck"))
    buckets = (
        chunked.groupBy("chunk", "ck")
        .agg(F.sort_array(F.collect_list(F.struct(F.col("_id"), F.col("simhash")))).alias("m"))
        .filter(F.size("m") > 1)
        .select(F.slice("m", 1, max_bucket).alias("m"))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("m"),
                            lambda a: F.transform(F.col("m"), lambda b: F.struct(a.alias("a"), b.alias("b"))),
                        )
                    ),
                    lambda p: p["a"]["_id"] < p["b"]["_id"],
                )
            ).alias("p")
        )
        .select(
            F.col("p.a._id").alias("id_a"),
            F.col("p.b._id").alias("id_b"),
            F.col("p.a.simhash").alias("sh_a"),
            F.col("p.b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted-index join; SQL-expressible for the oracle)
# ---------------------------------------------------------------------------


MAX_SHINGLE_DF = 128  # stop-shingle cutoff: document frequency above this
                      # drops the shingle from CANDIDATE GENERATION only


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    threshold: float = 0.5,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact Jaccard over distinct k-shingles for pairs sharing ≥1 RARE shingle.

    Plan: explode distinct shingles → drop shingles with document frequency
    > ``max_df`` (stop-shingle removal, standard for inverted-index Jaccard)
    → self-join the pruned index for candidate pairs → exact Jaccard per
    candidate via ``array_intersect`` over the FULL shingle sets.

    The posting-list cap bounds the self-join at Σ min(df, max_df)² instead
    of Σ df² — one boilerplate shingle shared by 10^6 docs would otherwise
    produce 10^12 candidate pairs. Jaccard values stay exact (common
    shingles still count in the intersection/union); only pairs whose EVERY
    shared shingle is boilerplate-frequent are skipped, which at
    ``threshold`` ≥ 0.5 is not a near-duplicate signal."""
    sh = df.select(F.col(id_col).alias("_id"), F.explode(_shingles_expr(text_col, k)).alias("s"))
    rare = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("s")
    )
    sh_rare = sh.join(rare, "s")
    a = sh_rare.alias("a")
    b = sh_rare.alias("b")
    survivors = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates()
    )
    # Stage 2 prefilter: Jaccard over 64-bit shingle HASHES (sorted long
    # arrays intersect ~2.5x faster than 16-char strings), kept with 0.05
    # slack. A qualifying pair (true jac >= t) can only be dropped here if
    # hash collisions shift its estimate by > 0.05 — that needs ~0.05*|union|
    # simultaneous 64-bit collisions inside ONE pair (p < 1e-100), so the
    # final stage-3 string-exact rescore sees every real pair. The hash
    # arrays come from a second column-pruned projection of the text —
    # measured CHEAPER than regrouping the exploded index (collect_list of
    # 1.35M hashes shuffled: 20s vs 11s at sf0.1), and at cluster scale the
    # index self-join above already shuffles ~k× the text volume, so one
    # extra pruned text scan is not the bottleneck.
    hsets = df.select(
        F.col(id_col).alias("_id"),
        F.sort_array(
            F.transform(_shingles_expr(text_col, k), lambda s: F.xxhash64(s))
        ).alias("_hh"),
    )
    ha = hsets.select(F.col("_id").alias("id_a"), F.col("_hh").alias("_ha"))
    hb = hsets.select(F.col("_id").alias("id_b"), F.col("_hh").alias("_hb"))
    h_inter = F.size(F.array_intersect(F.col("_ha"), F.col("_hb")))
    h_jac = h_inter.cast("double") / (
        F.size(F.col("_ha")) + F.size(F.col("_hb")) - h_inter
    ).cast("double")
    near = (
        survivors.join(ha, "id_a").join(hb, "id_b")
        .filter(h_jac >= threshold - 0.05)
        .select("id_a", "id_b")
    )
    # Stage 3: exact rescore on the ORIGINAL shingle strings (oracle-exact).
    # Deliberately a plain projection of df: a semi-join down to survivor
    # ids would make this subtree re-execute the whole prefilter pipeline
    # (the id set depends on `near`) — measured 2x slower than shingling
    # every doc and letting the join drop non-survivors.
    sets = df.select(F.col(id_col).alias("_id"), _shingles_expr(text_col, k).alias("_sh"))
    sa = sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    sb = sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    n_inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    jac = n_inter.cast("double") / (
        F.size(F.col("_sha")) + F.size(F.col("_shb")) - n_inter
    ).cast("double")
    return (
        near.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.format_string("%.4f", F.col("jaccard")).alias("jaccard"))
    )


def stop_shingles(
    df: DataFrame,
    *,
    text_col: str = "text",
    k: int = SHINGLE_K,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """(shingle, df) rows EXCLUDED from candidate generation — callers log
    this (small) set so truncation is visible, not silent."""
    sh = df.select(F.explode(_shingles_expr(text_col, k)).alias("s"))
    return (
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") > max_df)
    )
