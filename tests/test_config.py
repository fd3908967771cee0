"""EngineConfig surface (reference src/configuration.cpp:30-58,
config/config.h Default:: block) + the single python-stage-width knob."""

from __future__ import annotations

import pyspark.sql.functions as F

from detector_network_processor_spark.config import (
    PY_STAGE_CONF_KEY,
    EngineConfig,
    python_stage_partitions,
)


def test_defaults_match_reference():
    cfg = EngineConfig()
    # config.h:70-72 Default::interval {60 s, 120 s, 24 h}, Default::meta
    assert cfg.clusterlog_interval_s == 60
    assert cfg.detectorsummary_interval_s == 120
    assert cfg.histogram_sample_time_h == 24
    assert cfg.geohash_length == 6
    assert cfg.station_id == "muondetector_cluster"


def test_from_file_parses_reference_format(tmp_path):
    p = tmp_path / "dnp.cfg"
    p.write_text(
        "# comment line\n"
        "station_id = processor\n"
        "source_mqtt_host = broker.example  # trailing comment\n"
        "source_mqtt_port = 8883\n"
        "detectorsummary_interval = 5\n"  # minutes, configuration.cpp:58
        "clusterlog_interval = 2\n"
        "histogram_sample_time = 12\n"  # hours, configuration.cpp:55
        "store_histogram = true\n"
        "unknown_key = ignored\n"
        "source_mqtt_user =\n"  # empty value -> keep default
    )
    cfg = EngineConfig.from_file(str(p))
    assert cfg.station_id == "processor"
    assert cfg.source_mqtt_host == "broker.example"
    assert cfg.source_mqtt_port == 8883
    assert cfg.detectorsummary_interval_s == 300  # 5 min -> seconds
    assert cfg.clusterlog_interval_s == 120
    assert cfg.histogram_sample_time_h == 12
    assert cfg.store_histogram is True
    assert cfg.geohash_length == 6  # untouched default


def test_from_env_overrides(monkeypatch):
    monkeypatch.setenv("DNP_STATION_ID", "envstation")
    monkeypatch.setenv("DNP_PYTHON_STAGE_PARTITIONS", "48")
    cfg = EngineConfig.from_env()
    assert cfg.station_id == "envstation"
    assert cfg.python_stage_partitions == 48


def test_python_stage_partitions_resolution(spark):
    base = spark.sparkContext.defaultParallelism
    assert python_stage_partitions(spark) == base
    spark.conf.set(PY_STAGE_CONF_KEY, "7")
    try:
        assert python_stage_partitions(spark) == 7
        # explicit config wins over the session conf
        assert python_stage_partitions(spark, EngineConfig(python_stage_partitions=3)) == 3
    finally:
        spark.conf.unset(PY_STAGE_CONF_KEY)
    assert python_stage_partitions(spark) == base


def test_interval_changes_detector_summary(spark):
    """A non-default detectorsummary interval must change the windowing of
    detector_summaries (the verdict's wiring criterion)."""
    from detector_network_processor_spark.operators.station import detector_summaries

    NS = 10**9
    rows = [(1, t * 30 * NS, t * 30 * NS + 1000, 500, t) for t in range(16)]
    ev = spark.createDataFrame(
        rows, "hash long, start long, end long, time_acc long, ublox_counter long"
    )
    default_wins = detector_summaries(ev).select("win").distinct().count()
    fast = EngineConfig.from_file("/dev/null")  # defaults
    assert detector_summaries(ev, cfg=fast).select("win").distinct().count() == default_wins
    slow = EngineConfig(detectorsummary_interval_s=240)
    slow_wins = detector_summaries(ev, cfg=slow).select("win").distinct().count()
    assert slow_wins < default_wins


def test_from_file_parses_reference_shipped_cfg():
    """The reference's actual shipped config file must parse unchanged
    (configuration.cpp consumes the same file via boost program_options)."""
    import os

    import pytest

    path = "/root/reference/config/detector-network-processor.cfg"
    if not os.path.exists(path):
        pytest.skip("reference checkout not present")
    cfg = EngineConfig.from_file(path)
    assert cfg.station_id == "processor"
    assert cfg.source_mqtt_host == "muonpi.org"
    assert cfg.source_mqtt_port == 1883
    # commented-out keys keep defaults
    assert cfg.sink_mqtt_base_path == "muonpi/"
