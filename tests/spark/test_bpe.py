"""BPE training/application: reference parity, greedy semantics, twin."""

import duckdb
import pandas as pd
import pytest

from deduce_spark.spark.bpe import (
    bpe_token_counts, bpe_token_counts_oracle_sql, bpe_train,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref_train(texts, num_merges, min_count=2):
    """Pure-Python reference BPE (vocab-with-counts form)."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split() if w)
    vocab = {tuple(w): n for w, n in wf.items()}
    out = []
    for rank in range(num_merges):
        pairs = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merged = {}
        for sym, n in vocab.items():
            acc = []
            for x in sym:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            merged[tuple(acc)] = merged.get(tuple(acc), 0) + n
        vocab = merged
        out.append((rank, l, r, cnt))
    return out


class TestBPETrain:
    def test_matches_reference_implementation(self, spark):
        texts = [
            "the cat in the hat", "then there is that thing",
            "this is the thesis", "aaa aaaa", "low lower lowest",
        ]
        got = [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in bpe_train(_docs(spark, texts), num_merges=6).collect()
        ]
        assert got == _ref_train(texts, 6)

    def test_greedy_leftmost_nonoverlapping(self, spark):
        # 'aaa' has 2 (a,a) adjacencies but only the LEFTMOST fuses:
        # after merge rank 0 the corpus tokens are ['aa','a'] x docs
        docs = _docs(spark, ["aaa", "aaa", "aaa"])
        m = bpe_train(docs, num_merges=1).collect()
        assert [(r["left"], r["right"], r["pair_count"]) for r in m] == [
            ("a", "a", 6)
        ]
        toks = {
            r["token"]: r["n"]
            for r in bpe_token_counts(docs, [("a", "a")], k=10).collect()
        }
        assert toks == {"aa": 3, "a": 3}

    def test_early_stop_below_min_count(self, spark):
        # every word distinct chars: after all pairs are < min_count,
        # training stops early rather than emitting junk
        docs = _docs(spark, ["ab cd ef"])
        m = bpe_train(docs, num_merges=5, min_count=2).collect()
        assert m == []

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            bpe_train(_docs(spark, ["x"]), num_merges=0)

    def test_token_counts_twin_parity(self, spark):
        texts = [
            "the cat sat on the mat", "then there was the thing",
            "totally the best theme", "aaa abba cabbage",
        ]
        docs = _docs(spark, texts)
        trained = [
            (r["left"], r["right"])
            for r in bpe_train(docs, num_merges=6).collect()
        ]
        got = [
            tuple(r)
            for r in bpe_token_counts(docs, trained, k=25).collect()
        ]
        duck = duckdb.connect()
        duck.register(
            "documents",
            pd.DataFrame(
                [(i, t) for i, t in enumerate(texts)],
                columns=["doc_id", "text"],
            ),
        )
        want = [
            tuple(r)
            for r in duck.sql(
                bpe_token_counts_oracle_sql(trained, k=25)
            ).fetchall()
        ]
        assert got == want and len(got) > 5

    def test_apply_partitioning_invariant(self, spark):
        texts = [f"w{i % 7} common text here" for i in range(40)]
        docs = _docs(spark, texts)
        merges = [("t", "e"), ("te", "x"), ("h", "e")]
        a = bpe_token_counts(docs, merges, k=20).collect()
        b = bpe_token_counts(docs.repartition(9), merges, k=20).collect()
        assert a == b


class TestBPEBatchedTraining:
    """batch_k > 1 must yield the IDENTICAL merge list to the
    sequential oracle (batch_k=1 == pure-Python reference) — the
    commuting-prefix argument in the module docstring, adversarially
    exercised on tie-heavy small-alphabet corpora."""

    FIXTURE = [
        "the cat in the hat", "then there is that thing",
        "this is the thesis", "aaa aaaa", "low lower lowest",
    ]

    def test_batch_matches_sequential_on_fixture(self, spark):
        want = _ref_train(self.FIXTURE, 8)
        docs = _docs(spark, self.FIXTURE)
        for k in (2, 4, 8):
            got = [
                (r["rank"], r["left"], r["right"], r["pair_count"])
                for r in bpe_train(
                    docs, num_merges=8, batch_k=k
                ).collect()
            ]
            assert got == want, f"batch_k={k} diverged"

    def test_batch_randomized_tie_heavy_equivalence(self, spark):
        # 3-letter alphabet, short words: maximal pair-count ties and
        # fused-symbol collisions (e.g. (a,ab) vs (aa,b) both -> 'aab')
        import random

        for seed in (7, 23, 101):
            rng = random.Random(seed)
            texts = [
                " ".join(
                    "".join(
                        rng.choice("abc")
                        for _ in range(rng.randint(1, 6))
                    )
                    for _ in range(rng.randint(3, 12))
                )
                for _ in range(25)
            ]
            want = _ref_train(texts, 10)
            got = [
                (r["rank"], r["left"], r["right"], r["pair_count"])
                for r in bpe_train(
                    _docs(spark, texts), num_merges=10, batch_k=4
                ).collect()
            ]
            assert got == want, f"seed={seed} diverged"

    def test_batch_cuts_driver_rounds(self, spark):
        # Zipf-like vocabulary of symbol-disjoint words with strictly
        # decreasing frequencies (a tie-free head, as real word-rank
        # distributions have): the batched form must finish in ~K/k
        # driver round-trips, the sequential form in exactly K
        words = ["ab", "cd", "ef", "gh", "ij", "kl",
                 "mn", "op", "qr", "st", "uv", "wx"]
        texts = [
            " ".join(
                w for i, w in enumerate(words) for _ in range(130 - 6 * i)
            )
        ]
        docs = _docs(spark, texts)
        seq = [tuple(r) for r in bpe_train(docs, num_merges=12).collect()]
        assert bpe_train.last_rounds == 12
        bat = [
            tuple(r)
            for r in bpe_train(docs, num_merges=12, batch_k=6).collect()
        ]
        rounds = bpe_train.last_rounds
        assert bat == seq and len(seq) == 12
        assert rounds <= 3, f"expected <=3 rounds, got {rounds}"

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            bpe_train(_docs(spark, ["x"]), num_merges=1, batch_k=0)


class TestSafeBatchUnit:
    """Driver-side prefix logic in isolation (rows as dicts)."""

    @staticmethod
    def _rows(*triples):
        return [{"l": l, "r": r, "cnt": c} for l, r, c in triples]

    def test_disjoint_prefix_kept(self):
        from deduce_spark.spark.bpe import _safe_batch

        cands = self._rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 7))
        assert _safe_batch(cands, 3, set("abcdef")) == [
            ("a", "b", 9), ("c", "d", 8), ("e", "f", 7)
        ]

    def test_conflict_breaks_and_tie_trims(self):
        from deduce_spark.spark.bpe import _safe_batch

        # (a,c) shares 'a' with rank-1: batch cuts there, and the
        # equal-count (c,d) is trimmed (could lose the argmax to a
        # pair whose count changed up to the conflict bound 8)
        cands = self._rows(
            ("a", "b", 9), ("c", "d", 8), ("a", "c", 8), ("e", "f", 7)
        )
        assert _safe_batch(cands, 4, set("abcdef")) == [("a", "b", 9)]

    def test_sentinel_row_bounds_but_never_joins(self):
        from deduce_spark.spark.bpe import _safe_batch

        # want=2 -> third row is only the strictness bound: (c,d) at 8
        # survives because 8 > 6, but the sentinel itself is never kept
        cands = self._rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 6))
        assert _safe_batch(cands, 2, set("abcdef")) == [
            ("a", "b", 9), ("c", "d", 8)
        ]

    def test_alphabet_collision_cuts_batch(self):
        from deduce_spark.spark.bpe import _safe_batch

        # fusing (a,b) -> 'ab' while 'ab' is ALREADY a symbol: counts
        # of pairs touching 'ab' will GAIN, so nothing after it is safe
        cands = self._rows(("a", "b", 9), ("c", "d", 8), ("e", "f", 7))
        assert _safe_batch(cands, 3, {"a", "b", "ab", "c", "d", "e", "f"}) \
            == [("a", "b", 9)]

    def test_rank_one_always_survives_ties(self):
        from deduce_spark.spark.bpe import _safe_batch

        cands = self._rows(("a", "b", 5), ("a", "c", 5), ("d", "e", 5))
        assert _safe_batch(cands, 3, set("abcde")) == [("a", "b", 5)]


def test_bpe_train_directory_checkpoint(spark, tmp_path):
    from deduce_spark.spark.bpe import bpe_train

    docs = spark.createDataFrame(
        [("low low lower newest newest widest",)], ["text"]
    )
    ck = str(tmp_path / "bpeck")
    a = [tuple(r) for r in bpe_train(docs, num_merges=4).collect()]
    b = [tuple(r) for r in bpe_train(docs, num_merges=4, checkpoint=ck).collect()]
    assert a == b and len(a) >= 1


class TestBPEApproxBatching:
    """exact=False — the production-scale greedy batch: ~K/k rounds,
    deterministic, merge SET drawn from true pre-round counts but order
    approximate where pairs interact."""

    def test_rounds_scale_inverse_with_k(self, spark):
        docs = _docs(spark, TestBPEBatchedTraining.FIXTURE * 3)
        seq = bpe_train(docs, num_merges=12).collect()
        assert bpe_train.last_rounds == 12
        approx = bpe_train(
            docs, num_merges=12, batch_k=6, exact=False
        ).collect()
        rounds = bpe_train.last_rounds
        assert rounds <= 5, rounds
        assert len(approx) == len(seq) == 12
        # greedy skipping still only applies real top pairs: the merge
        # SETS overlap heavily even where the order diverges
        s = {(r["left"], r["right"]) for r in seq}
        a = {(r["left"], r["right"]) for r in approx}
        assert len(s & a) >= 8

    def test_deterministic(self, spark):
        docs = _docs(spark, TestBPEBatchedTraining.FIXTURE)
        one = [tuple(r) for r in bpe_train(
            docs, num_merges=10, batch_k=4, exact=False).collect()]
        two = [tuple(r) for r in bpe_train(
            docs, num_merges=10, batch_k=4, exact=False).collect()]
        assert one == two

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            bpe_train(_docs(spark, ["x y"]), num_merges=2, exact=False)
