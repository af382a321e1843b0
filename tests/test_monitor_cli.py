"""jobs/run_monitor.py — the geomag-monitor CLI analog: coverage report,
alert exit code, and CUSUM level-shift section."""

import contextlib
import io
import json

from usgs_geomag_algorithms_spark.sources.store import TierStore
from usgs_geomag_algorithms_spark.tiers import US

T0 = 1578268800 * US  # 2020-01-06T00:00:00
MIN = 60 * US


def run(argv):
    from jobs.run_monitor import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, json.loads(buf.getvalue().strip().splitlines()[-1])


def build_store(spark, tmp_path):
    # u_ok: complete day; u_gappy: 20% missing; u_shift: level shift
    rows = []
    for i in range(1440):
        rows.append(("u_ok", "text_len", T0 + i * MIN, 100.0))
        if i % 5 != 0:
            rows.append(("u_gappy", "text_len", T0 + i * MIN, 50.0))
        rows.append(
            ("u_shift", "text_len", T0 + i * MIN,
             float(100 + (40 if i >= 700 else 0)))
        )
    store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
    store.write(
        spark.createDataFrame(
            rows, "url string, channel string, t_us long, value double"
        ).repartition(4),
        "minute",
    )
    return store


class TestMonitorCli:
    def test_report_and_alert_exit_code(self, spark, tmp_path):
        build_store(spark, tmp_path)
        rc, rep = run([
            "--store", str(tmp_path / "t"), "--tier", "minute",
            "--start", "2020-01-06T00:00:00",
            "--end", "2020-01-06T23:59:00",
            "--warn-pct", "10",
        ])
        assert rc == 1  # u_gappy breaches 10%
        assert rep["n_series"] == 3 and rep["n_breaching"] == 1
        worst = rep["worst"][0]
        assert worst["url"] == "u_gappy" and 19 < worst["pct_missing"] < 21
        assert rep["level_shifts"] is None

    def test_no_breach_exits_zero(self, spark, tmp_path):
        build_store(spark, tmp_path)
        rc, rep = run([
            "--store", str(tmp_path / "t"), "--tier", "minute",
            "--start", "2020-01-06T00:00:00",
            "--end", "2020-06-06T23:59:00",  # degenerate long range
            "--warn-pct", "99.9",
        ])
        assert rc == 0 and rep["n_breaching"] == 0

    def test_cusum_section_flags_the_shifted_series(self, spark, tmp_path):
        build_store(spark, tmp_path)
        rc, rep = run([
            "--store", str(tmp_path / "t"), "--tier", "minute",
            "--start", "2020-01-06T00:00:00",
            "--end", "2020-01-06T23:59:00",
            "--warn-pct", "50",
            "--cusum-baseline", "240", "--cusum-h", "20",
        ])
        assert rc == 0
        shifts = rep["level_shifts"]
        assert shifts and shifts[0]["url"] == "u_shift"
        assert shifts[0]["first_flag_us"] >= T0 + 700 * MIN
        flagged_urls = {s["url"] for s in shifts}
        assert "u_ok" not in flagged_urls


class TestLayoutMode:
    """--mode layout: the metadata-only maintenance advisor."""

    def test_recommendations_cover_the_matrix(self, spark, tmp_path):
        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        # small-file buildup: 6 appended files per partition via upserts
        rows = [
            ("u0", "text_len", T0 + i * MIN, float(i)) for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, "url string, channel string, t_us long, value double"
        )
        # one write, 6 tasks -> up to 6 files in the day's partition
        store.write(df.repartition(6), "minute")
        # pending equality delete; the evolve commit below ages it
        store.delete_rows(
            spark.createDataFrame(
                [("u0", "text_len", T0)],
                "url string, channel string, t_us long",
            ),
            "minute",
        )
        # unfinished spec migration (also the commit that ages the delete)
        store.evolve_buckets("minute", 5)
        rc, out = run(
            ["--store", str(tmp_path / "t"), "--tier", "minute",
             "--mode", "layout", "--small-files", "2"]
        )
        assert rc == 0
        (rep,) = out["tiers"]
        actions = {a for a, _ in rep["recommendations"]}
        assert "compact" in actions  # small files AND old-spec files
        assert "materialize_deletes" in actions
        assert rep["pending_delete_files"] == 1
        assert rep["files_on_old_spec"] == rep["n_files"]
        assert rep["small_file_partitions"]
        # maintenance clears every advisory
        store.materialize_deletes("minute")
        store.compact("minute")
        rep2 = store.maintenance_report("minute", small_files_per_partition=2)
        assert rep2["recommendations"] == []
        assert rep2["files_on_old_spec"] == 0

    def test_skew_advisory(self, spark, tmp_path):
        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        # u0/u1 land in different buckets at n=2; u0 gets 100x the rows
        rows = [
            ("u0", "text_len", T0 + i * MIN, 1.0) for i in range(1200)
        ] + [("u1", "text_len", T0 + i * MIN, 1.0) for i in range(10)]
        store.write(
            spark.createDataFrame(
                rows, "url string, channel string, t_us long, value double"
            ),
            "minute",
        )
        rep = store.maintenance_report("minute", skew_ratio=8.0)
        if len(rep.get("bucket_rows", {})) == 2:
            assert any(
                a == "evolve_buckets" for a, _ in rep["recommendations"]
            )

    def test_coverage_mode_still_requires_window(self, spark, tmp_path):
        import pytest

        store = TierStore(spark, str(tmp_path / "t"), n_buckets=2)
        store.write(
            spark.createDataFrame(
                [("u", "text_len", T0, 1.0)],
                "url string, channel string, t_us long, value double",
            ),
            "minute",
        )
        with pytest.raises(SystemExit):
            run(["--store", str(tmp_path / "t"), "--tier", "minute"])
