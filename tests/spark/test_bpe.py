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


def test_bpe_train_directory_checkpoint(spark, tmp_path):
    from deduce_spark.spark.bpe import bpe_train

    docs = spark.createDataFrame(
        [("low low lower newest newest widest",)], ["text"]
    )
    ck = str(tmp_path / "bpeck")
    a = [tuple(r) for r in bpe_train(docs, num_merges=4).collect()]
    b = [tuple(r) for r in bpe_train(docs, num_merges=4, checkpoint=ck).collect()]
    assert a == b and len(a) >= 1
