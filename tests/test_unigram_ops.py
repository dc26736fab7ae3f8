"""Unigram-LM tokenizer trainer (operators/unigram.py, r14): pure-Python
reference differential (the TestBpe precedent), the integer-exact
Viterbi tie-break pins, coverage/prune/fallback semantics, and the
scale-shape plan check.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from airflow_etl_finance_market_spark.operators.unigram import (
    unigram_token_stats,
    unigram_train,
)


# --- independent pure-Python reference ------------------------------------


def _ref_viterbi(word, vocab, L):
    """(pieces, n_pieces) of the best cover under (fewest pieces, then
    max weight sum, then longest final piece) — written against the
    CONTRACT in the operator docstring, not the kernel code."""
    n = len(word)
    best = [None] * (n + 1)
    choice = [0] * (n + 1)
    best[0] = (0, 0)
    for j in range(1, n + 1):
        cands = []
        for l in range(1, min(L, j) + 1):
            if best[j - l] is None:
                continue
            w = vocab.get(word[j - l : j])
            if w is None:
                continue
            np_, sc = best[j - l]
            cands.append(((np_ + 1, -(sc + w), -l), l))
        if cands:
            key, l = min(cands)
            best[j] = (key[0], -key[1])
            choice[j] = l
    pieces = []
    pos = n
    while pos > 0:
        l = choice[pos]
        pieces.append(word[pos - l : pos])
        pos -= l
    return pieces[::-1], best[n][0]


def _ref_train(texts, *, rounds, L, W, seed_multi, keep_multi):
    words = Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        for w in norm.split(" "):
            if 1 <= len(w) <= W:
                words[w] += 1
    sub = Counter()
    for w, c in words.items():
        for l in range(1, L + 1):
            for s in range(len(w) - l + 1):
                sub[w[s : s + l]] += c
    chars = sorted(p for p in sub if len(p) == 1)
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:seed_multi]
    vocab = {p: sub[p] for p in chars}
    vocab.update(dict(multi))
    for _ in range(rounds):
        used = Counter()
        for w, c in words.items():
            for p in _ref_viterbi(w, vocab, L)[0]:
                used[p] += c
        nxt = {ch: used.get(ch, 0) for ch in chars}
        nxt.update(
            dict(
                sorted(
                    ((p, c) for p, c in used.items() if len(p) > 1),
                    key=lambda x: (-x[1], x[0]),
                )[:keep_multi]
            )
        )
        vocab = nxt
    return vocab, words


def _ref_doc_tokens(texts_by_id, vocab, L, W):
    out = {}
    for i, t in texts_by_id:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        ws = [w for w in norm.split(" ") if len(w) >= 1]
        total = 0
        for w in ws:
            if len(w) > W:
                total += len(w)
            else:
                total += _ref_viterbi(w, vocab, L)[1]
        out[i] = (len(ws), total)
    return out


CORPUS = [
    (1, "the cat sat on the mat the cat"),
    (2, "thin cats chat that the hat"),
    (3, "a tat tha hat chat chat stat"),
    (4, "internationalization is long"),  # 20 chars > W -> apply fallback
]


class TestUnigramDifferential:
    @pytest.mark.parametrize("rounds", [1, 2, 3])
    def test_matches_python_reference(self, spark, rounds):
        params = dict(rounds=rounds, L=3, W=10, seed_multi=12, keep_multi=6)
        ref_vocab, _ = _ref_train([t for _, t in CORPUS], **params)
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        vocab, segments = unigram_train(
            df,
            rounds=rounds,
            max_piece_len=3,
            max_word_len=10,
            seed_multi=12,
            keep_multi=6,
        )
        got = {r.piece: r.weight for r in vocab.collect()}
        assert got == ref_vocab
        ref_docs = _ref_doc_tokens(CORPUS, ref_vocab, 3, 10)
        got_docs = {
            r.doc_id: (r.n_words, r.n_unigram_tokens)
            for r in unigram_token_stats(df, segments).collect()
        }
        assert got_docs == ref_docs

    def test_long_word_fallback_is_char_count(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        _, segments = unigram_train(
            df, rounds=1, max_piece_len=3, max_word_len=10,
            seed_multi=12, keep_multi=6,
        )
        stats = {
            r.doc_id: r.n_unigram_tokens
            for r in unigram_token_stats(df, segments).collect()
        }
        # doc 4: 'internationalization'(20) + 'is'(<=W) + 'long'(<=W):
        # the long word contributes exactly its char count
        seg = {r.term: r.n_pieces for r in segments.collect()}
        assert "internationalization" not in seg  # excluded from training
        assert stats[4] == 20 + seg["is"] + seg["long"]


class TestUnigramContract:
    def test_fewest_pieces_beats_weight(self, spark):
        """Primary objective: a 1-piece cover wins even when the char
        path has a (much) larger weight sum."""
        # 'zzq' appears once; 'z' chars are everywhere (huge counts)
        df = spark.createDataFrame(
            [(1, "zzq " + "z " * 40), (2, "zzq zz zz")],
            "doc_id long, text string",
        )
        vocab, segments = unigram_train(
            df, rounds=1, max_piece_len=3, max_word_len=10,
            seed_multi=8, keep_multi=8,
        )
        seg = {r.term: r.n_pieces for r in segments.collect()}
        assert seg["zzq"] == 1

    def test_chars_always_survive_pruning(self, spark):
        """Coverage: single chars stay in the vocab at weight 0 even
        when every best path ignores them."""
        df = spark.createDataFrame(
            [(1, "ab ab ab ab"), (2, "ab ab")], "doc_id long, text string"
        )
        vocab, _ = unigram_train(
            df, rounds=2, max_piece_len=2, max_word_len=10,
            seed_multi=4, keep_multi=4,
        )
        rows = {r.piece: r.weight for r in vocab.collect()}
        # 'ab' absorbs everything; 'a' and 'b' survive at 0
        assert rows["ab"] == 6
        assert rows["a"] == 0 and rows["b"] == 0

    def test_unused_multi_pieces_pruned(self, spark):
        df = spark.createDataFrame(
            [(1, "abc abc abd")], "doc_id long, text string"
        )
        vocab, _ = unigram_train(
            df, rounds=1, max_piece_len=3, max_word_len=10,
            seed_multi=20, keep_multi=20,
        )
        pieces = {r.piece for r in vocab.collect()}
        # whole words win (1 piece); their proper substrings of len>1
        # are never on a best path and fall out of the vocabulary
        assert "abc" in pieces and "abd" in pieces
        assert "bc" not in pieces and "bd" not in pieces and "ab" not in pieces

    def test_em_movement_across_rounds(self, spark):
        """Round 2 must act on the round-1 PRUNED/re-weighted vocab —
        a trainer that keeps re-segmenting under the seed is wrong.
        Construction: under the seed, 'cd' (weight boosted by many
        other words containing the substring) wins the tie inside
        'abcd'-class words; after round 1 prunes the never-used
        booster words' influence, the winner flips."""
        ref_vocab, _ = _ref_train(
            [t for _, t in CORPUS], rounds=2, L=3, W=10,
            seed_multi=12, keep_multi=6,
        )
        ref_vocab_r1, _ = _ref_train(
            [t for _, t in CORPUS], rounds=1, L=3, W=10,
            seed_multi=12, keep_multi=6,
        )
        # the reference itself must move between rounds for this corpus
        # (otherwise the corpus doesn't exercise the loop) ...
        assert ref_vocab != ref_vocab_r1
        # ... and the Spark trainer tracks it (already pinned exactly in
        # the differential; this is the explicit movement witness)
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        v2, _ = unigram_train(
            df, rounds=2, max_piece_len=3, max_word_len=10,
            seed_multi=12, keep_multi=6,
        )
        assert {r.piece: r.weight for r in v2.collect()} == ref_vocab

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        with pytest.raises(ValueError):
            unigram_train(df, rounds=0)
        with pytest.raises(ValueError):
            unigram_train(df, max_piece_len=5, max_word_len=4)

    def test_apply_join_broadcasts_and_em_passes_are_type_bounded(
        self, spark
    ):
        """Scale shape: the apply plan carries a broadcast join (the
        vocab-of-words side), and each EM round is ONE MapInPandas over
        the types table — the corpus is scanned by the histogram and
        the apply only."""
        df = spark.createDataFrame(CORPUS, "doc_id long, text string")
        _, segments = unigram_train(
            df, rounds=1, max_piece_len=3, max_word_len=10,
            seed_multi=8, keep_multi=4,
        )
        plan = (
            unigram_token_stats(df, segments)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert plan.count("MapInPandas") == 1  # the segments DP only


class TestUnigramEdges:
    def test_empty_and_whitespace_corpus(self, spark):
        """No training-eligible words: empty vocab, empty segments, and
        the apply aggregates an empty occurrence stream without error."""
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
        )
        vocab, segments = unigram_train(
            df, rounds=1, max_piece_len=2, max_word_len=6,
            seed_multi=4, keep_multi=2,
        )
        assert vocab.count() == 0
        assert segments.count() == 0
        assert unigram_token_stats(df, segments).count() == 0

    def test_chars_only_vocab_keep_multi_zero(self, spark):
        """keep_multi=0 degenerates to a character tokenizer after the
        first prune — coverage still holds (every word segments into
        its single chars, n_pieces == length)."""
        df = spark.createDataFrame(
            [(1, "abc ab abc")], "doc_id long, text string"
        )
        _, segments = unigram_train(
            df, rounds=2, max_piece_len=3, max_word_len=6,
            seed_multi=4, keep_multi=0,
        )
        seg = {r.term: r.n_pieces for r in segments.collect()}
        assert seg == {"abc": 3, "ab": 2}

    def test_custom_column_names(self, spark):
        df = spark.createDataFrame(
            [(7, "xy xy zz")], "id long, body string"
        )
        vocab, segments = unigram_train(
            df, text_col="body", id_col="id", rounds=1,
            max_piece_len=2, max_word_len=6, seed_multi=4, keep_multi=2,
        )
        stats = unigram_token_stats(
            df, segments, text_col="body", id_col="id"
        ).collect()
        assert stats[0].n_words == 3
        pieces = {r.piece for r in vocab.collect()}
        assert "xy" in pieces and "zz" in pieces
