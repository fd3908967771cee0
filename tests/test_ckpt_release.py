"""r12 tracked-checkpoint release (session.eager_ckpt_tracked /
release_ckpts): the iterative loops (components contraction, converged
LPA/PageRank) switched from persist+unpersist to per-iteration eager
localCheckpoints, which DataFrame.unpersist does NOT release — storage is
freed via the tracked JVM RDD handles instead. These tests pin the helper's
contract and that the contraction loop actually bounds live checkpoint
state (without the release, every round's O(edges) state stays live until
an eventual GC runs the ContextCleaner)."""

from __future__ import annotations

import pyspark.sql.functions as F

from detector_network_processor_spark.operators.components import connected_components
from detector_network_processor_spark.plans.muon import station_communities_converged
from detector_network_processor_spark.session import eager_ckpt_tracked, release_ckpts

from conftest import SF_DIR_SMALL


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keys())


def test_eager_ckpt_tracked_returns_data_and_releasable_handles(spark):
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    before = _persistent_ids(spark)
    ck, handles = eager_ckpt_tracked(df)
    # the checkpoint holds the same rows
    assert [int(r["x"]) for r in ck.orderBy("id").collect()] == [2 * i for i in range(100)]
    # it persisted at least one new RDD, and the handles cover the diff
    assert handles
    new_ids = _persistent_ids(spark) - before
    assert new_ids
    release_ckpts(handles)
    # release drops the checkpoint's storage (plain DataFrame.unpersist
    # leaves localCheckpoint blocks live — probed on Spark 4.1 — which is
    # the whole reason the handles exist); compare against the new ids
    # only, so an unrelated ContextCleaner sweep of PRE-existing state
    # cannot flake the assertion
    assert not (_persistent_ids(spark) & new_ids)


def test_components_loop_releases_all_but_final_checkpoint(spark):
    # a 40-node chain forces several large-star/small-star rounds
    edges = [(i, i + 1) for i in range(1, 40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    before = _persistent_ids(spark)
    out = connected_components(df)
    res = {int(r["node"]): int(r["component"]) for r in out.collect()}
    assert set(res.values()) == {1} and len(res) == 40
    new = _persistent_ids(spark) - before
    # only the FINAL round's checkpoint may stay live (the returned frame
    # reads it); every earlier round — initial orient plus one per
    # contraction round — must have been released inside the loop
    assert len(new) <= 2, f"leaked checkpoint RDDs: {sorted(new)}"


def test_converged_lpa_live_state_is_constant_in_iterations(spark):
    before = _persistent_ids(spark)
    out, iters = station_communities_converged(spark, SF_DIR_SMALL, max_iters=20)
    out.collect()
    assert iters >= 2  # the bound below is vacuous on a 1-iteration run
    new = _persistent_ids(spark) - before
    # live state after the run: the edge-table checkpoints (_station_edges)
    # plus the FINAL iteration's label checkpoint — never one per iteration
    # (the per-iteration release is what lets a max_iters=50 production run
    # hold only two iterations' O(nodes) state at any moment)
    assert len(new) <= 4, f"live checkpoints {sorted(new)} for {iters} iterations"
