"""BPE merge training vs a pure-Python reference implementation.

The reference applies merges the canonical way (greedy left-to-right,
non-overlapping, token-tuple rewrite); the operator must reproduce its
merge rules AND counts exactly, including the back-to-back-pair case
("aaa" under merge (a,a) -> "aa","a") where a naive delimiter encoding
diverges.
"""

from collections import Counter

import pytest

from tika_xapian_spark.operators.bpe import bpe_merges, word_freq_dict


def ref_bpe(word_counts: dict[str, int], k: int):
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(k):
        pc: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((best[0], best[1], pc[best]))
        nv: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges


def _docs_from_counts(spark, wc: dict[str, int]):
    rows, i = [], 0
    for w, c in wc.items():
        for _ in range(c):
            rows.append((i, w))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


CORPORA = [
    # the classic hug/pug example + a greedy-overlap word
    {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5, "aaa": 7},
    # tie-break exercise: equal counts force lexicographic pair order
    {"ab": 3, "cd": 3, "ba": 3, "dc": 3},
    # multi-char merge chains and single-char words (no pairs)
    {"seeded": 6, "seed": 9, "see": 4, "s": 11, "e": 2},
]


@pytest.mark.parametrize("wc", CORPORA, ids=["classic", "ties", "chains"])
def test_matches_python_reference(spark, wc):
    docs = _docs_from_counts(spark, wc)
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(docs, "doc_id", n_merges=5).collect()
    ]
    exp = [(i + 1, l, r, c) for i, (l, r, c) in enumerate(ref_bpe(wc, 5))]
    assert got == exp


def test_word_freq_dict_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b! c"), (2, "")], "doc_id bigint, text string"
    )
    got = {r.word: r.cnt for r in word_freq_dict(docs, "doc_id").collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_n_merges_validation(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        bpe_merges(docs, "doc_id", n_merges=0)


def ref_encode_lens(word_counts: dict[str, int], k: int) -> dict[str, int]:
    """word -> n_subwords after applying ref_bpe's first k merges."""
    merges = [(l, r) for l, r, _ in ref_bpe(word_counts, k)]
    out = {}
    for w in word_counts:
        syms = list(w)
        for l, r in merges:
            nxt, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    nxt.append(l + r)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        out[w] = len(syms)
    return out


@pytest.mark.parametrize("wc", CORPORA, ids=["classic", "ties", "chains"])
def test_encode_matches_python_reference(spark, wc):
    from tika_xapian_spark.operators.bpe import bpe_encode

    docs = _docs_from_counts(spark, wc)
    # each synthetic doc is exactly one word -> per-doc n_bpe_tokens is
    # that word's subword length under the first-5-merges tokenizer
    text_of = {r["doc_id"]: r["text"] for r in docs.collect()}
    exp_len = ref_encode_lens(wc, 5)
    for r in bpe_encode(docs, "doc_id", n_merges=5).collect():
        w = text_of[r["doc"]]
        assert r["n_words"] == 1
        assert r["n_bpe_tokens"] == exp_len[w], w
        assert r["tokens_per_word_micro"] == exp_len[w] * 1_000_000


def test_encode_survives_pair_exhaustion(spark):
    # 2-char vocab runs dry after 1 merge; rounds 2..5 must keep the
    # dict unchanged instead of null-poisoning the rewrite chain
    from tika_xapian_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "ab")], "doc_id bigint, text string"
    )
    got = {r["doc"]: r for r in bpe_encode(docs, "doc_id", n_merges=5).collect()}
    assert (got[0]["n_words"], got[0]["n_bpe_tokens"]) == (2, 2)
    assert (got[1]["n_words"], got[1]["n_bpe_tokens"]) == (1, 1)
