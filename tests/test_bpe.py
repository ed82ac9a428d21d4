"""BPE tokenizer induction: training loop, merge convention, segmentation."""

import pytest

from data_check_spark.operators.bpe import (
    bpe_merges_df,
    bpe_segment,
    bpe_train,
    word_symbol_frame,
)


def _python_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    """Independent row-at-a-time replay of the pinned convention."""
    words = {" ".join(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.items():
            parts = syms.split(" ")
            for a, b in zip(parts, parts[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (lhs, rhs), pf = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((lhs, rhs, pf))
        words = {
            f" {s} ".replace(f" {lhs} {rhs} ", f" {lhs}{rhs} ").strip(): f
            for s, f in words.items()
        }
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "low low lower lowest"),
        (2, "new newer newest newest"),
        (3, "low new low new lower"),
        (4, None),
        (5, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_symbol_frame(corpus):
    rows = {r["word"]: r for r in word_symbol_frame(corpus).collect()}
    assert rows["low"]["syms"] == "l o w"
    assert rows["low"]["freq"] == 4
    assert rows["newest"]["freq"] == 2
    assert set(rows) == {"low", "lower", "lowest", "new", "newer", "newest"}


def test_bpe_train_matches_python_replay(corpus):
    freqs = {
        "low": 4, "lower": 2, "lowest": 1,
        "new": 3, "newer": 1, "newest": 2,
    }
    expected = _python_bpe(freqs, 5)
    merges, _ = bpe_train(corpus, n_merges=5)
    got = [(m["lhs"], m["rhs"], m["pair_freq"]) for m in merges]
    assert got == expected
    assert [m["merge_rank"] for m in merges] == [1, 2, 3, 4, 5]
    # first merge is hand-derivable: 'l o' and 'o w' both appear 7x,
    # 'e w' 6x ... tie broken lexicographically -> ('l', 'o')
    assert (merges[0]["lhs"], merges[0]["rhs"]) == ("l", "o")
    assert merges[0]["pair_freq"] == 7
    assert merges[0]["new_symbol"] == "lo"


def test_repeated_symbol_convention(spark):
    """'a a a a' under merge (a,a): separator consumption gives 'aa a a'
    (NOT greedy 'aa aa') — pinned so every engine agrees."""
    df = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    merges, dictionary = bpe_train(df, n_merges=1)
    assert (merges[0]["lhs"], merges[0]["rhs"], merges[0]["pair_freq"]) == ("a", "a", 3)
    assert dictionary.collect()[0]["syms"] == "aa a a"


def test_bpe_train_stops_when_fully_merged(spark):
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    merges, dictionary = bpe_train(df, n_merges=10)
    # one merge fuses the only pair; nothing left to count afterwards
    assert len(merges) == 1
    assert merges[0]["new_symbol"] == "ab"
    assert dictionary.collect()[0]["syms"] == "ab"


def test_bpe_train_guard(corpus):
    with pytest.raises(ValueError):
        bpe_train(corpus, n_merges=0)


def test_bpe_merges_df_empty(spark):
    df = bpe_merges_df(spark, [])
    assert df.columns == ["merge_rank", "lhs", "rhs", "pair_freq", "new_symbol"]
    assert df.count() == 0


def test_bpe_segment_counts_and_fallback(spark, corpus):
    _, dictionary = bpe_train(corpus, n_merges=3)
    extra = spark.createDataFrame(
        [(6, "low zzz")], "doc_id long, text string"
    )  # 'zzz' not in the dictionary -> char-level fallback (3 pieces)
    out = {r["doc_id"]: r for r in bpe_segment(corpus.union(extra), dictionary).collect()}
    assert out[4]["n_words"] == 0 and out[4]["n_pieces"] == 0
    assert out[5]["n_words"] == 0 and out[5]["chars_per_piece_bp"] == 0
    assert out[6]["n_words"] == 2
    dict_pieces = {
        r["word"]: len(r["syms"].split(" ")) for r in dictionary.collect()
    }
    assert out[6]["n_pieces"] == dict_pieces["low"] + 3
    assert out[6]["n_word_chars"] == 6
    # every in-dictionary doc: pieces = sum of its words' dictionary pieces
    assert out[1]["n_pieces"] == (
        dict_pieces["low"] * 2 + dict_pieces["lower"] + dict_pieces["lowest"]
    )
    assert out[1]["chars_per_piece_bp"] == out[1]["n_word_chars"] * 10000 // out[1]["n_pieces"]


def test_bpe_segment_plan_broadcasts_dictionary(corpus):
    _, dictionary = bpe_train(corpus, n_merges=2)
    plan = bpe_segment(corpus, dictionary)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # segmentation is pure JVM: no Python stage anywhere
    assert "Python" not in plan and "ArrowEvalPython" not in plan


def test_bpe_tokenize_stream_and_fallback(spark, corpus):
    from data_check_spark.operators.bpe import bpe_tokenize

    merges, dictionary = bpe_train(corpus, n_merges=3)
    extra = spark.createDataFrame([(6, "low qz")], "doc_id long, text string")
    rows = bpe_tokenize(corpus.union(extra), dictionary).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {}).setdefault(r["word_idx"], []).append(
            (r["piece_idx"], r["piece"])
        )
    # doc 1 = "low low lower lowest": word 0 pieces re-join to the word
    w0 = [p for _, p in sorted(by_doc[1][0])]
    assert "".join(w0) == "low"
    dict_syms = {r["word"]: r["syms"].split(" ") for r in dictionary.collect()}
    assert w0 == dict_syms["low"]
    assert [p for _, p in sorted(by_doc[1][2])] == dict_syms["lower"]
    # OOV 'qz' falls back to characters
    assert [p for _, p in sorted(by_doc[6][1])] == ["q", "z"]
    # piece counts agree with bpe_segment
    from data_check_spark.operators.bpe import bpe_segment

    seg = {r["doc_id"]: r["n_pieces"] for r in bpe_segment(corpus, dictionary).collect()}
    counts = {d: sum(len(v) for v in ws.values()) for d, ws in by_doc.items() if d <= 5}
    assert counts == {d: n for d, n in seg.items() if n > 0}


def test_bpe_tokenize_plan_broadcast_only(spark, corpus):
    from data_check_spark.operators.bpe import bpe_tokenize

    _, dictionary = bpe_train(corpus, n_merges=2)
    plan = bpe_tokenize(corpus, dictionary)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "Python" not in plan
