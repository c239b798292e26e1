"""curate_corpus job: stage chain, verdict precedence, exact resume."""

import shutil

import pytest

from jobs.curate_corpus import run_job

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("curated")


@pytest.fixture(scope="module")
def first_run(spark, out_dir):
    return run_job(spark, SF_DOCS, str(out_dir))


class TestCurateCorpus:
    def test_all_stages_ran_and_tables_exist(self, first_run, out_dir):
        assert set(first_run["stages"]) == {
            "stats", "lm", "verdicts", "dedup", "packs"
        }
        assert all(
            "rows" in v for v in first_run["stages"].values()
        )
        for t in ("doc_stats", "lm_scores", "verdicts", "kept", "packs"):
            assert (out_dir / t / "metadata").exists(), t

    def test_verdicts_cover_all_docs_and_kept_subset(
        self, spark, first_run, out_dir
    ):
        verdicts = spark.read.parquet(
            str(sorted((out_dir / "verdicts" / "data").glob("snap-*"))[-1])
        )
        n_docs = spark.read.parquet(SF_DOCS).count()
        assert verdicts.count() == n_docs
        kept = verdicts.filter("keep").count()
        assert 0 < kept < n_docs  # some doc must fail some rule
        assert first_run["stages"]["dedup"]["rows"] <= kept

    def test_contaminated_verdict_fires_on_bench_slice(
        self, spark, out_dir
    ):
        verdicts = spark.read.parquet(
            str(sorted((out_dir / "verdicts" / "data").glob("snap-*"))[-1])
        )
        # bench slice = doc_id % 101 == 0; those docs self-contaminate at
        # 1000 permille, so each is 'contaminated' unless an earlier
        # precedence rule already dropped it
        flagged = {
            r["doc_id"]: r["verdict"]
            for r in verdicts.filter("doc_id % 101 = 0").collect()
        }
        assert flagged and all(v != "keep" for v in flagged.values())
        assert "contaminated" in set(flagged.values())

    def test_resume_skips_everything(self, spark, out_dir, first_run):
        again = run_job(spark, SF_DOCS, str(out_dir))
        assert all(
            v == {"skipped": True} for v in again["stages"].values()
        )

    def test_crash_restart_recomputes_only_missing_stage(
        self, spark, out_dir, first_run
    ):
        # simulate a crash that lost the packs table after its stage ran:
        # the table is gone, so _stage_done is false and ONLY packs reruns
        shutil.rmtree(out_dir / "packs")
        again = run_job(spark, SF_DOCS, str(out_dir))
        assert again["stages"]["packs"].get("skipped") is not True
        assert again["stages"]["stats"] == {"skipped": True}
        assert again["stages"]["dedup"] == {"skipped": True}
        assert again["stages"]["packs"]["rows"] == first_run["stages"][
            "packs"
        ]["rows"]

    def test_changed_input_invalidates_all_stages(
        self, spark, out_dir, tmp_path, first_run
    ):
        subset = spark.read.parquet(SF_DOCS).filter("doc_id % 2 = 0")
        sub_path = str(tmp_path / "docs_half.parquet")
        subset.write.parquet(sub_path)
        again = run_job(spark, sub_path, str(out_dir))
        assert all(
            v.get("skipped") is not True
            for v in again["stages"].values()
        )
        assert again["input_fp"] != first_run["input_fp"]


class TestNormalizeStage:
    def test_byte_variant_spellings_fingerprint_equal(
        self, spark, tmp_path
    ):
        # the same text once composed, once decomposed: WITHOUT the
        # normalize stage their md5 fingerprints differ; WITH it the
        # doc_stats fingerprints are equal (so exact dedup sees equals)
        docs = spark.createDataFrame(
            [(7, "zelfde caf\u00e9 tekst woorden hier"),
             (14, "zelfde cafe\u0301 tekst woorden hier")],
            "doc_id long, text string",
        )
        src = str(tmp_path / "docs.parquet")
        docs.write.parquet(src)

        def stats_fps(out):
            stats = spark.read.parquet(
                str(sorted((tmp_path / out / "doc_stats" / "data")
                           .glob("snap-*"))[-1])
            )
            return {r["doc_id"]: r["fingerprint"]
                    for r in stats.collect()}

        run_job(spark, src, str(tmp_path / "raw"))
        fps = stats_fps("raw")
        assert fps[7] != fps[14]

        s = run_job(spark, src, str(tmp_path / "norm"), normalize=True)
        assert "normalize" in s["stages"]
        fps = stats_fps("norm")
        assert fps[7] == fps[14]

    def test_toggling_normalize_rebuilds_downstream(self, spark, tmp_path):
        # the flag changes every downstream stage's effective input, so
        # it is part of the resume key: re-running the same input/output
        # with --normalize must NOT serve the stale raw-text tables
        docs = spark.createDataFrame(
            [(7, "w1 w2 w3 w4"), (14, "w5 w6 w7 w8")],
            "doc_id long, text string",
        )
        src = str(tmp_path / "docs.parquet")
        docs.write.parquet(src)
        out = str(tmp_path / "out")
        run_job(spark, src, out)
        again = run_job(spark, src, out, normalize=True)
        assert all(
            v.get("skipped") is not True
            for v in again["stages"].values()
        )


class TestCrawlTableForm:
    def test_url_keyed_input(self, spark, tmp_path):
        # crawl tables key on url: doc ids derive via xxhash64(url) and
        # the pmod slice selectors keep ref/bench non-empty
        docs = spark.read.parquet(SF_DOCS).selectExpr(
            "concat('https://h', CAST(doc_id AS STRING), '.nl/p') AS url",
            "text",
        )
        src = str(tmp_path / "crawl.parquet")
        docs.write.parquet(src)
        out = str(tmp_path / "curated")
        s = run_job(spark, src, out, id_col="url", text_col="text")
        assert s["stages"]["stats"]["rows"] == docs.count()
        assert 0 < s["stages"]["dedup"]["rows"] <= docs.count()
        assert s["stages"]["packs"]["rows"] == s["stages"]["dedup"]["rows"]


class TestMaxDocWordsWiring:
    def test_pathological_doc_dropped_before_signatures(
        self, spark, tmp_path
    ):
        # round-6 wiring: a multi-hundred-thousand-word page must be
        # dropped by the too_long verdict (and the minhash stage runs
        # with the same clamp as defense in depth), so the job's memory
        # stays bounded by max_doc_words regardless of input.
        keepers = [
            (i, " ".join(f"w{i}_{j}" for j in range(40)))
            for i in range(1, 30)
        ]
        monster = (9999, " ".join(f"m{j}" for j in range(300_000)))
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame(keepers + [monster], columns=["doc_id", "text"])
        )
        inp = str(tmp_path / "docs.parquet")
        df.repartition(2).write.parquet(inp)
        out = str(tmp_path / "curated")
        summary = run_job(spark, inp, out, max_doc_words=10_000)
        assert summary["stages"]["verdicts"]["rows"] == 30
        from pathlib import Path

        def snap(table):
            return spark.read.parquet(
                str(sorted((Path(out) / table / "data").glob("snap-*"))[-1])
            )

        verdicts = {
            r["doc_id"]: r["verdict"] for r in snap("verdicts").collect()
        }
        assert verdicts[9999] == "too_long"
        kept = {r["doc_id"] for r in snap("kept").collect()}
        assert 9999 not in kept and len(kept) >= 20


class TestSemanticDedupStage:
    def test_semantic_stage_drops_embedding_neardups(self, spark, tmp_path):
        # 20 lexically-distinct keeper docs; docs 1 and 2 share a latent
        # embedding direction (semantic near-dups minhash cannot see),
        # doc 20 has no embedding row at all (must pass through).
        import pandas as pd

        docs = [
            (i, " ".join(f"w{i}_{j}" for j in range(40)))
            for i in range(1, 21)
        ]
        df = spark.createDataFrame(
            pd.DataFrame(docs, columns=["doc_id", "text"])
        )
        inp = str(tmp_path / "docs.parquet")
        df.write.parquet(inp)

        def vec(seed, flip=0.0):
            import numpy as np

            rng = np.random.RandomState(seed)
            v = rng.randn(16).astype("float32")
            v[0] += flip
            return [float(x) for x in v]

        emb_rows = [(1, vec(7)), (2, vec(7, flip=0.01))] + [
            (i, vec(100 + i)) for i in range(3, 20)
        ]
        emb = spark.createDataFrame(
            pd.DataFrame(emb_rows, columns=["vec_id", "embedding"])
        )
        emb_p = str(tmp_path / "emb.parquet")
        emb.write.parquet(emb_p)

        out = str(tmp_path / "curated")
        s = run_job(
            spark, inp, out,
            embeddings_path=emb_p, semantic_tau=0.9,
            semantic_centroids=4,
        )
        assert "semdedup" in s["stages"]
        from pathlib import Path

        kept_sem = {
            r["doc_id"]
            for r in spark.read.parquet(
                str(sorted((Path(out) / "kept_sem" / "data")
                           .glob("snap-*"))[-1])
            ).collect()
        }
        assert 1 in kept_sem and 2 not in kept_sem  # canonical = min id
        assert 20 in kept_sem  # no embedding -> passes through
        assert s["stages"]["packs"]["rows"] == len(kept_sem)

    def test_no_embeddings_means_no_stage(self, spark, tmp_path):
        import pandas as pd

        # ids reach 17 so the lm reference slice (doc_id % 17 == 0) is
        # non-empty — an empty slice fails fast by design
        docs = [(i, " ".join(f"w{i}_{j}" for j in range(40)))
                for i in range(1, 21)]
        df = spark.createDataFrame(
            pd.DataFrame(docs, columns=["doc_id", "text"])
        )
        inp = str(tmp_path / "docs.parquet")
        df.write.parquet(inp)
        s = run_job(spark, inp, str(tmp_path / "curated"))
        assert "semdedup" not in s["stages"]

    def test_url_keyed_embeddings_and_zero_coverage(self, spark, tmp_path):
        import pandas as pd

        docs = [(f"https://h{i}.nl/p", " ".join(f"w{i}_{j}" for j in range(40)))
                for i in range(1, 21)]
        df = spark.createDataFrame(pd.DataFrame(docs, columns=["url", "text"]))
        inp = str(tmp_path / "crawl.parquet")
        df.write.parquet(inp)

        import numpy as np

        def vec(seed):
            rng = np.random.RandomState(seed)
            return [float(x) for x in rng.randn(8).astype("float32")]

        # url-keyed embeddings: ids must derive via the SAME xxhash64 the
        # docs path uses (review fix: a bare cast('long') was NULL)
        emb = spark.createDataFrame(
            pd.DataFrame(
                [(u, vec(7)) for u, _t in docs[:2]]
                + [(u, vec(100 + i)) for i, (u, _t) in
                   enumerate(docs[2:], start=2)],
                columns=["url", "embedding"],
            )
        )
        emb_p = str(tmp_path / "emb.parquet")
        emb.write.parquet(emb_p)
        out = str(tmp_path / "curated")
        s = run_job(
            spark, inp, out, id_col="url",
            embeddings_path=emb_p, emb_id_col="url",
            semantic_tau=0.9, semantic_centroids=4,
        )
        assert "semdedup" in s["stages"]
        # the two identical-embedding docs collapsed to one
        assert (s["stages"]["semdedup"]["rows"]
                == s["stages"]["dedup"]["rows"] - 1)

        # embeddings that cover NO kept doc: stage passes kept through
        emb_none = spark.createDataFrame(
            pd.DataFrame([(999999, vec(1))], columns=["vec_id", "embedding"])
        )
        emb_np = str(tmp_path / "emb_none.parquet")
        emb_none.write.parquet(emb_np)
        out2 = str(tmp_path / "curated2")
        s2 = run_job(spark, inp, out2, id_col="url",
                     embeddings_path=emb_np)
        assert (s2["stages"]["semdedup"]["rows"]
                == s2["stages"]["dedup"]["rows"])
