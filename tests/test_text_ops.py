"""Text-analysis operators: token stats, quality, lang-id, fingerprints."""

import pyspark.sql.functions as F
import pytest

from data_check_spark.operators.text import (
    fingerprints,
    lang_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "der hund und die katze und der vogel nicht"),
        (3, "el perro que corre la calle de los gatos"),
        (4, "one two three"),
        (5, "   "),
        (6, "a, b, c! d? e; f:"),
        (7, "的 是 不 我 在 的 是"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(docs):
    r = {x["doc_id"]: x for x in token_stats(docs).collect()}
    assert r[1]["n_tokens"] == 9
    assert r[1]["n_distinct_tokens"] == 8  # 'the' twice
    assert r[4]["n_tokens"] == 3
    assert r[5]["n_tokens"] == 0
    assert r[6]["n_punct"] == 6
    assert r[1]["n_punct"] == 0


def test_quality_score_bounds(docs):
    rows = quality_score(docs).collect()
    for x in rows:
        q = x["quality_q4"] / 10000.0
        assert 0.0 <= q <= 1.0
    r = {x["doc_id"]: x["quality_q4"] for x in rows}
    assert r[1] > r[5]  # real text beats blank
    assert r[1] > r[6]  # low-punct beats punct soup


def test_lang_id(docs):
    r = {x["doc_id"]: x for x in lang_id(docs).collect()}
    assert r[1]["predicted_lang"] == "en"
    assert r[2]["predicted_lang"] == "de"
    assert r[3]["predicted_lang"] == "es"
    assert r[7]["predicted_lang"] == "zh"
    assert r[5]["predicted_lang"] == "en"  # all-zero scores → priority order


def test_lang_id_scores(docs):
    r = {x["doc_id"]: x for x in lang_id(docs).collect()}
    # doc1: 'the' x2 → s_en == 2 (and/of/to/in absent)
    assert r[1]["s_en"] == 2
    # doc2: der x2 + und x2 + die + nicht == 6
    assert r[2]["s_de"] == 6


def test_fingerprints_match_hashlib(docs):
    import hashlib

    r = {x["doc_id"]: x["fingerprint"] for x in fingerprints(docs).collect()}
    assert r[1] == hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()


def test_no_python_udfs_in_text_ops(docs):
    """Text ops must stay JVM-side: no BatchEvalPython/ArrowEvalPython."""
    for fn in (token_stats, quality_score, lang_id, fingerprints):
        plan = fn(docs)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, fn.__name__


def test_bpe_ish_token_count_matches_python_re(spark):
    """n_bpe_tokens must equal an independent Python re count of the same
    pattern (pins the Java∩RE2 subset semantics the oracle relies on)."""
    import re

    from data_check_spark.operators.text import BPE_ISH_PATTERN, token_stats

    rows = [
        (1, "The quick brown fox's dog won't re-jump 42 times!"),
        (2, "hello   world"),
        (3, ""),
        (4, "   "),
        (5, "I'll we've they're it's don't 3.14 foo_bar!!!"),
        (6, "日本語のテキスト with mixed ASCII 123"),
        (7, "'s'll'd lone quotes ''"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in token_stats(df).collect()}
    pat = re.compile(BPE_ISH_PATTERN)
    for doc_id, text in rows:
        assert got[doc_id] == len(pat.findall(text)), (doc_id, text)


def test_unigram_rarity_hand_computed(spark):
    from data_check_spark.operators.text import unigram_rarity

    # corpus counts: a=4, b=3, c=2, d=1 → vocab_size=2 keeps {a, b}
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c A"), (3, "c d b a"), (4, None), (5, "  ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.freq_mass, r.oov_bp) for r in
           unigram_rarity(df, vocab_size=2).collect()}
    assert got == {
        1: (3, 0, 4 + 4 + 3, 0),          # a a b — all in-vocab
        2: (3, 1, 3 + 4, 3333),           # b c A → c is OOV; A lowercases
        3: (4, 2, 3 + 4, 5000),           # c d OOV; b a in-vocab
        4: (0, 0, 0, 0),                  # NULL text
        5: (0, 0, 0, 0),                  # blank text
    }


def test_unigram_rarity_vocab_cutoff_tie_break(spark):
    from data_check_spark.operators.text import unigram_rarity

    # x and y both occur twice; vocab_size=1 must keep 'x' (token asc tie)
    df = spark.createDataFrame(
        [(1, "x y"), (2, "y x")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_oov for r in unigram_rarity(df, vocab_size=1).collect()}
    assert got == {1: 1, 2: 1}


def test_unigram_rarity_plan_scale_shape(spark):
    from data_check_spark.operators.text import unigram_rarity

    df = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    plan = unigram_rarity(df, vocab_size=2)._jdf.queryExecution().executedPlan().toString()
    # vocabulary head: per-partition top-k merge, not a global sort or a
    # single-partition row_number window
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    # scoring joins the ≤k-row head broadcast — the corpus never shuffles
    # for the join
    assert "BroadcastHashJoin" in plan


def test_chunk_documents_layout(spark):
    from data_check_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, None), (4, " ")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=4, overlap_tokens=2).collect()
    got = {(r.doc_id, r.chunk_idx): (r.start_token, r.n_chunk_tokens, r.chunk_text)
           for r in rows}
    # doc1: 10 tokens, window 4, step 2 → starts 0,2,4,6,8
    assert got[(1, 0)] == (0, 4, "t0 t1 t2 t3")
    assert got[(1, 3)] == (6, 4, "t6 t7 t8 t9")
    assert got[(1, 4)] == (8, 2, "t8 t9")  # trailing short chunk
    assert got[(2, 0)] == (0, 2, "a b")
    # NULL / blank docs yield no chunks
    assert {r.doc_id for r in rows} == {1, 2}


def test_chunk_documents_overlap_guard(spark):
    from data_check_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


def test_chunk_documents_no_shuffle_no_python(spark):
    from data_check_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_top_ngrams_counts_and_ties(spark):
    from data_check_spark.operators.text import top_ngrams

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "b a x"), (4, None), (5, "solo")],
        "doc_id long, text string",
    )
    got = [(r.bigram, r.n_occurrences, r.rank) for r in
           top_ngrams(df, top_n=3).collect()]
    # counts: 'a b'×3, 'b a'×2; tie between 'a x' and 'b c' (1 each)
    # breaks alphabetically → 'a x' takes rank 3
    assert got == [("a b", 3, 1), ("b a", 2, 2), ("a x", 1, 3)]


def test_top_terms_per_doc_hand_computed(spark):
    from data_check_spark.operators.text import top_terms_per_doc

    # corpus: 'a' in 3 docs, 'b' in 2, 'rare' in 1
    df = spark.createDataFrame(
        [(1, "a a b rare"), (2, "a b"), (3, "a")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.term_rank): (r.term, r.tf, r.df, r.relevance_ppm)
           for r in top_terms_per_doc(df, top_k=2).collect()}
    # doc1: rare 1/1 = 1_000_000 beats a 2/3 = 666_666 beats b 1/2
    assert got[(1, 1)] == ("rare", 1, 1, 1_000_000)
    assert got[(1, 2)] == ("a", 2, 3, 666_666)
    # doc2: b 1/2 = 500_000 beats a 1/3 = 333_333
    assert got[(2, 1)] == ("b", 1, 2, 500_000)
    assert got[(2, 2)] == ("a", 1, 3, 333_333)
    # doc3 has only one term → one row
    assert got[(3, 1)] == ("a", 1, 3, 333_333)
    assert len(got) == 5


def test_top_terms_guard_and_no_python(spark):
    from data_check_spark.operators.text import top_terms_per_doc

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        top_terms_per_doc(df, top_k=0)
    plan = top_terms_per_doc(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_vocab_coverage_hand_computed(spark):
    from data_check_spark.operators.text import vocab_coverage

    # counts: a=4, b=2, c=1, d=1 -> total 8; ties (c,d) break by token asc
    df = spark.createDataFrame(
        [("a a b c", ), ("a b a d", ), ("  ", ), (None, )], "text string"
    )
    out = {r["vocab_k"]: r for r in
           vocab_coverage(df, vocab_sizes=(1, 3, 10)).collect()}
    assert out[1]["covered"] == 4 and out[1]["total_tokens"] == 8
    assert out[1]["coverage_ppm"] == 500_000
    assert out[3]["covered"] == 7  # a + b + c (tie-break picks c over d)
    assert out[10]["covered"] == 8 and out[10]["coverage_ppm"] == 1_000_000


def test_vocab_coverage_guard(spark):
    import pytest as _pytest

    from data_check_spark.operators.text import vocab_coverage

    df = spark.createDataFrame([("x",)], "text string")
    with _pytest.raises(ValueError, match="vocab_sizes"):
        vocab_coverage(df, vocab_sizes=(0,))


def test_bigram_coherence_hand_computed(spark):
    from data_check_spark.operators.text import bigram_coherence

    rows = [
        (1, "A b a b"),   # bigrams: (a b) x2, (b a) x1 — case-folded
        (2, "a b c"),     # (a b), (b c)
        (3, "z"),         # too short
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in bigram_coherence(df).collect()}
    assert len(out) == 5

    # corpus: bg counts {a b: 3, b a: 1, b c: 1}; prefix counts {a: 3, b: 2}
    d1 = out[1]
    assert d1["n_bigrams"] == 3
    assert d1["n_unseen"] == 1  # "b a"
    # (a b): 3*10000//3 = 10000 each x2; (b a): 1*10000//2 = 5000
    assert d1["cond_bp_sum"] == 25000
    assert d1["coherence_bp"] == 25000 // 3
    d2 = out[2]
    assert d2["n_bigrams"] == 2
    assert d2["n_unseen"] == 1  # "b c"
    assert d2["cond_bp_sum"] == 15000
    assert d2["coherence_bp"] == 7500
    for d in (3, 4, 5):
        r = out[d]
        assert (r["n_bigrams"], r["n_unseen"], r["cond_bp_sum"], r["coherence_bp"]) == (
            0, 0, 0, 0,
        )


def test_bigram_coherence_signals(spark):
    """Two complementary signals: coherence_bp measures how determined each
    next-token is by its prefix CORPUS-WIDE (an ambiguous prefix like the
    two `the …` continuations halves those bigrams' score); n_unseen flags
    corpus-novel bigrams (word salad looks 'coherent' — P=1/1 — but is 100%
    unseen, which is exactly how a combined filter catches it)."""
    from pyspark.sql import functions as F
    from data_check_spark.operators.text import bigram_coherence

    formulaic = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    salad = [(100 + i, f"tok{i}a tok{i}b tok{i}c tok{i}d tok{i}e") for i in range(10)]
    df = spark.createDataFrame(formulaic + salad, "doc_id bigint, text string")
    out = bigram_coherence(df)
    f_rows = out.filter("doc_id < 100").collect()
    # 8 bigrams: 6 unambiguous (10000) + the two `the *` ones (bgc=10,
    # pxc(the)=20 -> 5000): (6*10000 + 2*5000) div 8 = 8750
    assert all(r["coherence_bp"] == 8750 for r in f_rows)
    assert all(r["n_unseen"] == 0 for r in f_rows)  # shared across 10 docs
    salad_rows = out.filter("doc_id >= 100").collect()
    assert all(r["coherence_bp"] == 10000 for r in salad_rows)  # P = 1/1
    assert all(r["n_unseen"] == r["n_bigrams"] == 4 for r in salad_rows)


def test_token_drift_hand_computed(spark):
    from data_check_spark.operators.text import token_drift

    cur = spark.createDataFrame(
        [("a a b",), ("a c",), (None,), ("   ",)], "text string"
    )  # cur totals: a=3, b=1, c=1 (5)
    base = spark.createDataFrame(
        [("a b b",), ("b d",)], "text string"
    )  # base totals: a=1, b=3, d=1 (5)
    got = {r["token"]: r.asDict() for r in
           token_drift(cur, base, k=10, threshold_ppm=300_000).collect()}
    assert set(got) == {"a", "b", "c", "d"}
    a = got["a"]
    assert (a["cnt_cur"], a["cnt_base"]) == (3, 1)
    assert a["share_cur_ppm"] == 600000 and a["share_base_ppm"] == 200000
    assert a["delta_ppm"] == 400000 and a["drifted"] is True
    b = got["b"]
    assert b["delta_ppm"] == 200000 - 600000 and b["drifted"] is True
    c = got["c"]
    assert (c["cnt_base"], c["share_base_ppm"], c["delta_ppm"]) == (0, 0, 200000)
    assert c["drifted"] is False  # 20% < 30% threshold
    assert got["d"]["delta_ppm"] == -200000


def test_token_drift_head_tiebreak_and_guards(spark):
    import pytest as _pytest
    from data_check_spark.operators.text import token_drift

    cur = spark.createDataFrame([("z y x w",)], "text string")
    base = spark.createDataFrame([("x w v u",)], "text string")
    # combined counts: w=2, x=2, then u/v/y/z tie at 1 -> asc-name tiebreak
    got = [r["token"] for r in token_drift(cur, base, k=3).collect()]
    assert set(got) == {"w", "x", "u"}
    with _pytest.raises(ValueError, match="k must"):
        token_drift(cur, base, k=0)
    with _pytest.raises(ValueError, match="threshold_ppm"):
        token_drift(cur, base, threshold_ppm=0)


def test_extraction_quality_classifies_failure_modes(spark):
    from data_check_spark.operators.text import extraction_quality

    long_clean = "word " * 200
    rows = [
        (1, "a perfectly clean sentence."),
        (2, '<div class="x">short</div><br/>'),          # markup-heavy short doc
        (3, long_clean.strip() + " &nbsp;&amp;"),         # light markup on a long doc
        (4, "text with mojibake � here"),
        (5, "control\x07chars\x1f"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in extraction_quality(df).collect()}

    assert out[1]["status"] == "clean"
    assert out[1]["n_tags"] == out[1]["n_entities"] == 0

    assert out[2]["n_tags"] == 3  # <div ...>, </div>, <br/>
    assert out[2]["status"] == "markup_residue"
    assert out[2]["markup_chars"] == len('<div class="x">') + len("</div>") + len("<br/>")
    assert out[2]["residue_bp"] > 500

    assert out[3]["n_entities"] == 2
    assert out[3]["status"] == "light_markup"
    assert out[3]["residue_bp"] <= 500

    assert out[4]["n_replacement"] == 1 and out[4]["status"] == "mojibake"
    assert out[5]["n_ctrl"] == 2 and out[5]["status"] == "mojibake"

    assert out[6]["status"] == "clean" and out[6]["residue_bp"] == 0


# ---------------------------------------------------------------------------
# word_edit_distance (transcript WER)
# ---------------------------------------------------------------------------


def _py_word_lev(a: list[str], b: list[str]) -> int:
    prev = list(range(len(b) + 1))
    for i, wa in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, wb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (wa != wb))
        prev = cur
    return prev[len(b)]


def test_word_edit_distance_hand_cases(spark):
    from data_check_spark.operators.text import word_edit_distance

    rows = [
        (1, "the cat sat on the mat", "the cat sat on the mat"),   # identical
        (2, "the cat sat on the mat", "the dog sat on the mat"),   # 1 sub
        (3, "the cat sat on the mat", "the cat sat on mat"),       # 1 del
        (4, "the cat sat", "the the cat sat"),                     # 1 ins
        (5, "a b", "b a"),                                         # transposition = 2
        (6, "", "whatever here"),                                  # empty ref
        (7, "cat catalog", "cat catalog"),  # prefix words must encode apart
        (8, None, "ghost words"),           # NULL ref == blank ref
        (9, "some words", None),            # NULL hyp == blank hyp
    ]
    df = spark.createDataFrame(rows, "doc_id long, ref_text string, hyp_text string")
    out = {r["doc_id"]: r for r in word_edit_distance(df, threshold_bp=3000).collect()}
    assert out[1]["word_edits"] == 0 and out[1]["status"] == "ok"
    assert out[2]["word_edits"] == 1 and out[2]["wer_bp"] == 1666
    assert out[3]["word_edits"] == 1
    assert out[4]["word_edits"] == 1 and out[4]["status"] == "exceeds"  # 3333 bp
    assert out[5]["word_edits"] == 2 and out[5]["wer_bp"] == 10000
    assert out[6]["status"] == "empty_ref" and out[6]["wer_bp"] is None
    assert out[7]["word_edits"] == 0
    assert out[8]["status"] == "empty_ref" and out[8]["n_ref_words"] == 0
    assert out[9]["word_edits"] == 2 and out[9]["wer_bp"] == 10000


def test_word_edit_distance_matches_python_dp(spark):
    from data_check_spark.operators.text import word_edit_distance

    # deterministic pseudo-random word sequences with heavy repetition
    def words(seed, n):
        vocab = ["alpha", "beta", "gamma", "delta", "eps"]
        return [vocab[(seed * (i + 3) + i * i) % len(vocab)] for i in range(n)]

    rows = [
        (i, " ".join(words(i, 8 + i % 5)), " ".join(words(i + 1, 6 + i % 7)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, ref_text string, hyp_text string")
    out = {r["doc_id"]: r for r in word_edit_distance(df).collect()}
    for i, ref, hyp in rows:
        assert out[i]["word_edits"] == _py_word_lev(ref.split(), hyp.split()), i


def test_word_edit_distance_vocab_overflow(spark):
    from data_check_spark.operators.text import word_edit_distance

    big_ref = " ".join(f"w{i}" for i in range(200))
    big_hyp = " ".join(f"v{i}" for i in range(200))  # pair vocab = 400 > 255
    small = ("ok ref", "ok ref")
    df = spark.createDataFrame(
        [(1, big_ref, big_hyp), (2, *small)], "doc_id long, ref_text string, hyp_text string"
    )
    out = {r["doc_id"]: r for r in word_edit_distance(df).collect()}
    assert out[1]["status"] == "vocab_overflow"
    assert out[1]["word_edits"] is None and out[1]["wer_bp"] is None
    assert out[2]["status"] == "ok" and out[2]["word_edits"] == 0


def test_word_edit_distance_plan_is_jvm_projection(spark):
    from data_check_spark.operators.text import word_edit_distance

    df = spark.createDataFrame(
        [(1, "a b", "a c")], "doc_id long, ref_text string, hyp_text string"
    )
    plan = word_edit_distance(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # zero shuffle
    assert "Python" not in plan            # zero Python


def test_normalize_text_width_fold(spark):
    from data_check_spark.operators.text import normalize_text

    rows = [
        (1, "ＡＢＣ　１２３"),        # full-width letters + ideographic space
        (2, "plain ascii stays"),
        (3, None),
        (4, "mixＥｄ ｗidth！"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text_norm"] == "ABC 123"
    assert out[1]["n_folded"] == 7          # 6 full-width chars + the U+3000
    assert out[2]["text_norm"] == "plain ascii stays" and out[2]["n_folded"] == 0
    assert out[3]["text_norm"] is None and out[3]["n_folded"] == 0
    assert out[4]["text_norm"] == "mixEd width!" and out[4]["n_folded"] == 4
