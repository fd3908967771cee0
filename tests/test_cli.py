"""CLI entry point (python -m detector_network_processor_spark): list/run/
oracle in-process, and the stream daemon mode end-to-end over a spool dir."""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile

from detector_network_processor_spark.__main__ import main


def test_list_names_every_registered_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    from detector_network_processor_spark.plans import all_queries

    for name in all_queries():
        assert name in out


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "SELECT" in capsys.readouterr().out.upper()


def test_oracle_unknown_query(capsys):
    assert main(["oracle", "no_such_query"]) == 2


def test_run_unknown_query():
    assert main(["run", "no_such_query"]) == 2


def test_run_shows_rows(spark, capsys):
    # get_spark inside the CLI returns the active test session (getOrCreate)
    assert main(["run", "top_orders", "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"]) == 0
    assert "o_orderkey" in capsys.readouterr().out


def test_run_explain(spark, capsys):
    assert main(["run", "q1_pricing_summary", "--sf-dir", "/root/testdata/sf0.001", "--explain"]) == 0
    assert "AdaptiveSparkPlan" in capsys.readouterr().out


def test_stream_daemon_drains_spool(spark):
    """stream --available-now over a tiny spool produces flattened L1 rows."""
    import pyspark.sql.functions as F

    from muon_fixtures import STATIONS, make_events

    events = make_events(n_base=200, seed=7)
    EPOCH_NS = 1_700_000_000 * 10**9

    def line(e):
        s, en = (e["start"] + EPOCH_NS) / 1e9, (e["end"] + EPOCH_NS) / 1e9
        return (
            f"muonpi/data/user{e['hash']}/det",
            f"{s:.9f} {en:.9f} {e['time_acc']} {e['ublox_counter']} {e['fix']} 0 1",
        )

    lines = [line(e) for e in events]
    # close-out sentinel so the watermark passes every real session
    sent_s = (max(e["start"] for e in events) + EPOCH_NS + 10**12) / 1e9
    sentinel = ("muonpi/data/user1001/det", f"{sent_s:.9f} {sent_s + 1e-6:.9f} 1 0 1 0 1")

    st_rows = [
        dict(username=f"user{h}", station_id="det", lat=lat, lon=lon, h=hh)
        for (h, lat, lon, hh) in STATIONS
    ] + [dict(username="user1001", station_id="det", lat=47.0, lon=8.0, h=450.0)]
    stations = spark.createDataFrame(st_rows).select(
        F.xxhash64(F.concat_ws("/", "username", "station_id")).alias("hash"), "lat", "lon", "h"
    )

    tmp = tempfile.mkdtemp(prefix="dnp_cli_stream_")
    try:
        schema = "topic string, payload string"
        spark.createDataFrame(lines, schema).coalesce(1).write.parquet(f"{tmp}/spool/b0")
        spark.createDataFrame([sentinel], schema).coalesce(1).write.parquet(f"{tmp}/spool/b1")
        stations.write.parquet(f"{tmp}/stations")
        rc = main(
            [
                "stream",
                "--lines-dir", f"{tmp}/spool/b*",
                "--stations-parquet", f"{tmp}/stations",
                "--out", f"{tmp}/l1",
                "--checkpoint", f"{tmp}/ckpt",
                "--available-now",
            ]
        )
        assert rc == 0
        out = spark.read.parquet(f"{tmp}/l1")
        assert out.count() > 0
        assert {"hash", "start", "n"} <= set(out.columns)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_module_invocation_smoke():
    """python -m ... list works as a real subprocess (no Spark needed)."""
    r = subprocess.run(
        [sys.executable, "-m", "detector_network_processor_spark", "list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 0
    assert "l1_coincidence" in r.stdout


def test_materialize_day_partitions_events(spark, tmp_path):
    rc = main(
        [
            "materialize",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", str(tmp_path / "lake"),
            "--tables", "events",
        ]
    )
    assert rc == 0
    import pyspark.sql.functions as F

    out = spark.read.parquet(str(tmp_path / "lake" / "events"))
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert out.count() == src.count()
    # hive-style day directories exist and a day filter prunes to one of them
    days = [r["day"] for r in out.select("day").distinct().collect()]
    assert len(days) > 1
    one = out.filter(F.col("day") == days[0])
    files = {r[0] for r in one.select(F.input_file_name()).distinct().collect()}
    assert all(f"day={days[0]}" in f for f in files)


def test_materialize_unknown_table(tmp_path):
    assert main(["materialize", "--out", str(tmp_path), "--tables", "nope"]) == 2


def test_verify_subcommand(spark, capsys):
    rc = main(["verify", "top_orders", "q1_pricing_summary", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "top_orders: OK" in out and "2/2 OK" in out


def test_verify_unknown_query():
    assert main(["verify", "nope"]) == 2


def test_compact_removes_exact_and_near_duplicates(spark, tmp_path):
    """compact: exact copies collapse to min doc_id; near-identical texts
    (one token changed) collapse to their cluster's canonical; distinct
    docs survive."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (1, base, "en", "web"),
        (2, base, "en", "web"),                      # exact dup of 1
        (3, base.replace("pi", "PI"), "en", "web"),  # near-dup of 1
        (4, "completely different text about other things entirely with many unique words", "en", "web"),
    ]
    src = str(tmp_path / "lake")
    out = str(tmp_path / "clean")
    spark.createDataFrame(rows, "doc_id long, text string, lang string, source string").write.parquet(src)
    rc = main(["compact", "--in", src, "--out", out, "--jaccard", "0.5"])
    assert rc == 0
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 4]


def test_compact_clone_safe_mode(spark, tmp_path):
    """compact --clone-safe: K clones of a doc collapse via spanning-star
    LSH bucket edges (the clone-regime path; no pair listing), and a
    distinct doc still survives untouched."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    K = 8
    rows = [(i, base + f" trailer{i}", "en", "web") for i in range(1, K + 1)]
    rows.append((99, "completely different text about other things entirely with many unique words", "en", "web"))
    src = str(tmp_path / "lake")
    out = str(tmp_path / "clean")
    spark.createDataFrame(rows, "doc_id long, text string, lang string, source string").write.parquet(src)
    rc = main(["compact", "--in", src, "--out", out, "--clone-safe"])
    assert rc == 0
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 99]


def test_cli_monitor_drains_spool(spark, tmp_path):
    """`monitor --available-now`: (topic, payload) spool -> streaming
    detector summaries -> K1 text lines parquet."""
    import subprocess
    import sys

    import pyspark.sql.functions as F

    NS = 10**9
    EPOCH_NS = 1_700_000_000 * NS
    lines = []
    for h in (1, 2):
        t, ub = 3 * h, 10
        while t < 600:
            s = (t * NS + EPOCH_NS) / 1e9
            lines.append((f"muonpi/data/user{h}/det", f"{s:.9f} {s + 3e-7:.9f} 100 {ub % 65536} 1 0 1"))
            ub, t = ub + 3, t + 9
    spark.createDataFrame(lines, "topic string, payload string").coalesce(1).write.parquet(
        str(tmp_path / "spool" / "b0")
    )
    from detector_network_processor_spark.sources.lines import parse_events

    parse_events(
        spark.createDataFrame(lines, "topic string, payload string")
    ).select("hash").distinct().select(
        "hash",
        F.concat(F.lit("u"), F.col("hash")).alias("user"),
        F.lit("det").alias("station_id"),
    ).write.parquet(str(tmp_path / "stations"))

    r = subprocess.run(
        [sys.executable, "-m", "detector_network_processor_spark", "monitor",
         "--lines-dir", str(tmp_path / "spool" / "*"),
         "--stations-parquet", str(tmp_path / "stations"),
         "--out", str(tmp_path / "out"), "--checkpoint", str(tmp_path / "ckpt"),
         "--available-now", "--cpus", "4"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = spark.read.parquet(str(tmp_path / "out"))
    rows = out.collect()
    assert len(rows) > 0
    assert all(" eventrate " in r_["line"] or " " in r_["line"] for r_ in rows)
    assert {f.name for f in out.schema.fields} == {"hash", "win", "idx", "line"}


def test_cli_ingest_builds_index_and_finds_pairs(spark, tmp_path):
    """`ingest --available-now`: document spool -> incremental near-dup
    checker; pairs land partitioned by batch, the band index persists."""
    import subprocess
    import sys

    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    docs = [(i, base if i % 2 == 0 else " ".join(f"w{i}_{j}" for j in range(14))) for i in range(12)]
    spark.createDataFrame(docs[:6], "doc_id long, text string").coalesce(1).write.parquet(
        str(tmp_path / "spool" / "b0")
    )
    spark.createDataFrame(docs[6:], "doc_id long, text string").coalesce(1).write.parquet(
        str(tmp_path / "spool" / "b1")
    )
    r = subprocess.run(
        [sys.executable, "-m", "detector_network_processor_spark", "ingest",
         "--docs-dir", str(tmp_path / "spool" / "*"),
         "--index", str(tmp_path / "index"), "--out", str(tmp_path / "out"),
         "--checkpoint", str(tmp_path / "ckpt"), "--available-now", "--cpus", "4"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    pairs = spark.read.parquet(str(tmp_path / "out")).collect()
    # the 6 identical docs form C(6,2)=15 pairs, split across increments
    keys = {(min(p.doc_a, p.doc_b), max(p.doc_a, p.doc_b)) for p in pairs}
    assert keys == {(a, b) for a in range(0, 12, 2) for b in range(a + 2, 12, 2)}
    assert spark.read.parquet(str(tmp_path / "index")).count() > 0
