"""schedule_crawl job: delta -> policy -> schedule -> frontier chain,
robots enforcement, AIMD intervals from the delta, wave caps, exact
resume, and deterministic re-runs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jobs.schedule_crawl import run_job

HOSTS = ["a.nl", "b.nl"]


def _pages(n, changed=(), dropped=(), added=()):
    rows = []
    for i in range(n):
        if i in dropped:
            continue
        host = HOSTS[i % 2]
        text = f"page body {i}" + (" edited" if i in changed else "")
        rows.append((f"https://{host}/p/{i}", text))
    for i in added:
        rows.append((f"https://{HOSTS[i % 2]}/new/{i}", f"fresh {i}"))
    return pd.DataFrame(rows, columns=["url", "text"])


@pytest.fixture(scope="module")
def inputs(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("crawl_inputs")
    prev, cur = d / "prev.parquet", d / "cur.parquet"
    robots = d / "robots.parquet"
    _pages(20).to_parquet(prev)
    _pages(20, changed={2, 4}, dropped={6}, added={100}).to_parquet(cur)
    pd.DataFrame(
        [("a.nl", "User-agent: *\nDisallow: /p/1")],
        columns=["host", "robots_txt"],
    ).to_parquet(robots)
    return {"prev": str(prev), "cur": str(cur), "robots": str(robots)}


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("schedule_out")


@pytest.fixture(scope="module")
def first_run(spark, inputs, out_dir):
    return run_job(
        spark, inputs["cur"], str(out_dir),
        previous_path=inputs["prev"], robots_path=inputs["robots"],
        per_host_cap=3,
    )


def _read(spark, out_dir, table):
    return spark.read.parquet(
        str(sorted((out_dir / table / "data").glob("snap-*"))[-1])
    )


class TestScheduleCrawl:
    def test_stage_chain_and_tables(self, first_run, out_dir):
        assert set(first_run["stages"]) == {
            "delta", "policy", "schedule", "frontier"
        }
        for t in ("delta", "allowed", "schedule", "frontier"):
            assert (out_dir / t / "metadata").exists(), t

    def test_delta_statuses(self, spark, first_run, out_dir):
        status = {
            r["url"]: r["status"]
            for r in _read(spark, out_dir, "delta").collect()
        }
        assert status["https://a.nl/p/2"] == "changed"
        assert status["https://a.nl/p/6"] == "deleted"
        assert status["https://a.nl/new/100"] == "added"
        assert status["https://b.nl/p/1"] == "unchanged"

    def test_robots_blocks_and_delta_drops(self, spark, first_run, out_dir):
        frontier = {
            r["url"] for r in _read(spark, out_dir, "frontier").collect()
        }
        # a.nl disallows /p/1 -> /p/1* urls on a.nl gone; b.nl untouched
        assert "https://a.nl/p/10" not in frontier
        assert "https://a.nl/p/12" not in frontier
        assert "https://b.nl/p/1" in frontier
        # deleted url never reaches the frontier
        assert "https://a.nl/p/6" not in frontier
        assert "https://a.nl/new/100" in frontier

    def test_aimd_intervals_from_delta(self, spark, first_run, out_dir):
        sched = {
            r["url"]: r["next_interval"]
            for r in _read(spark, out_dir, "schedule").collect()
        }
        assert sched["https://a.nl/p/2"] == 2000    # changed -> halved
        assert sched["https://b.nl/p/1"] == 8000    # unchanged -> doubled
        assert sched["https://a.nl/new/100"] == 4000  # added -> base
        assert "https://a.nl/p/6" not in sched      # deleted -> no row

    def test_wave_cap_per_host(self, spark, first_run, out_dir):
        per_wave = (
            _read(spark, out_dir, "frontier")
            .groupBy("host", "wave")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert per_wave and all(r["n"] <= 3 for r in per_wave)

    def test_resume_skips_all_stages(self, spark, inputs, out_dir,
                                     first_run):
        second = run_job(
            spark, inputs["cur"], str(out_dir),
            previous_path=inputs["prev"], robots_path=inputs["robots"],
            per_host_cap=3,
        )
        assert all(
            v == {"skipped": True} for v in second["stages"].values()
        )

    def test_crash_restart_recomputes_only_missing_stage(
        self, spark, inputs, out_dir, first_run
    ):
        # crash lost the frontier table after its stage ran: only the
        # frontier stage reruns; the three upstream stages stay skipped
        import shutil

        shutil.rmtree(out_dir / "frontier")
        again = run_job(
            spark, inputs["cur"], str(out_dir),
            previous_path=inputs["prev"], robots_path=inputs["robots"],
            per_host_cap=3,
        )
        assert again["stages"]["delta"] == {"skipped": True}
        assert again["stages"]["policy"] == {"skipped": True}
        assert again["stages"]["schedule"] == {"skipped": True}
        assert again["stages"]["frontier"].get("skipped") is not True
        assert again["stages"]["frontier"]["rows"] == first_run[
            "stages"
        ]["frontier"]["rows"]

    def test_changed_side_input_rebuilds(self, spark, inputs, out_dir,
                                         first_run, tmp_path_factory):
        # same --input, different --robots: stages must NOT be skipped
        d = tmp_path_factory.mktemp("robots2")
        robots2 = d / "robots2.parquet"
        pd.DataFrame(
            [("a.nl", "User-agent: *\nDisallow: /")],
            columns=["host", "robots_txt"],
        ).to_parquet(robots2)
        rerun = run_job(
            spark, inputs["cur"], str(out_dir),
            previous_path=inputs["prev"], robots_path=str(robots2),
            per_host_cap=3,
        )
        assert all(
            v != {"skipped": True} for v in rerun["stages"].values()
        )
        frontier = {
            r["url"] for r in _read(spark, out_dir, "frontier").collect()
        }
        # the new robots disallows ALL of a.nl
        assert not any(u.startswith("https://a.nl/") for u in frontier)
        # restore the original tables for any later test: rebuild with
        # the original inputs (fingerprint differs again -> full rerun)
        run_job(
            spark, inputs["cur"], str(out_dir),
            previous_path=inputs["prev"], robots_path=inputs["robots"],
            per_host_cap=3,
        )

    def test_rerun_is_deterministic(self, spark, inputs, out_dir,
                                    first_run, tmp_path_factory):
        other = tmp_path_factory.mktemp("schedule_out2")
        run_job(
            spark, inputs["cur"], str(other),
            previous_path=inputs["prev"], robots_path=inputs["robots"],
            per_host_cap=3,
        )
        a = sorted(
            map(tuple, _read(spark, out_dir, "frontier").collect())
        )
        b = sorted(map(tuple, _read(spark, other, "frontier").collect()))
        assert a == b
