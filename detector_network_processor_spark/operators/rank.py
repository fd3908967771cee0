"""Distributed exact ranking: ``ntile`` semantics without a per-group
single-task sort window.

``ntile(B) OVER (PARTITION BY g ORDER BY k)`` is the one remaining
global-sort shape in the engine's exact paths (ccnet_ppl_buckets): Spark
executes it as ONE task per group value, which serializes a 100 TB
language partition through a single sort. The distributed equivalent
here needs exactly ONE statistics pass and ONE shuffle, and is
recompute-safe by construction:

1. every order-key value is quantized by a MONOTONE, DATA-INDEPENDENT
   cell function (sign-split log2 cells, ~256 per octave — a pure column
   expression); one aggregation pass counts rows per ``(group, cell)``.
   That histogram is EXACT, so the driver derives from it, in one step,
   (a) per-group bucket boundaries at cell edges (greedy walk to ~equal
   row counts) and (b) the EXACT number of rows in every bucket — no
   approx-percentile sketch, and no second counting job after the
   shuffle (the r8 design's reservoir-sampled range exchange needed
   both, and its sampled boundaries made recompute a fail-loud abort);
2. each row's logical bucket id ``_lpid = base(group) + #boundary cells
   below its cell`` is a pure function of the row (broadcast boundary
   table frozen into the plan as literals), and rows shuffle by
   ``hash(_lpid)``. Recomputation of any partition — cache eviction,
   executor loss, a full unpersist — replays identical placement;
3. one Arrow pass with per-bucket running counters: global rank within
   the group = bucket starting offset (prefix-summed on the driver from
   the exact histogram — kilobytes) + local rank. Each logical bucket
   lands wholly in one physical partition and ``_lpid`` is monotone
   along the group's sort order, so bucket runs are contiguous slices
   of the global order; the ntile bucket falls out of the closed form
   (first ``n mod B`` buckets get one extra row) — bit-identical to the
   window ``ntile`` for any total order.

The sort key must be TOTAL (include a unique tiebreaker such as doc_id);
with ties across a bucket boundary the per-engine orders could otherwise
diverge. Cell-level skew (heavy ties / one dense cell) only affects
BALANCE, never correctness: an unsplittable cell simply becomes one fat
bucket. Non-numeric first order columns get one bucket per group (cast
order wouldn't be monotone); group cardinality is expected to be small
(languages) — every group costs one broadcast-table row. All per-row
bookkeeping keys on the integer ``_lpid``, never on the group value, so
the r8 ADVICE NaN-vs-None dict mismatch is structurally impossible.
Nothing anywhere sorts a whole group on one task. Known Arrow caveat
(applies to any mapInPandas operator, not this design): a genuine NaN in
a double VALUE column does not round-trip the pandas pass (NaN and null
conflate); the ntile itself is unaffected — NaN order keys still rank
last via the dedicated top cell. Ref parity: CCNet's per-language
perplexity tertiles (Wenzek et al. 2020) at hypertable scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Monotone quantization resolution: cells per octave (power of two) of
# the order key. 256 keeps the per-group histogram in the hundreds of
# rows for unit-scale domains while splitting finely enough that bucket
# balance is limited by genuine ties, not quantization.
_CELLS_PER_OCTAVE = 256

# cell-space layout constants: negatives < zero < positives < NaN, with
# enough headroom that floor(K * log2(|x|)) (|log2| <= 1075) never
# crosses a category boundary
_POS_BASE = 2_000_000
_NAN_CELL = 4_000_000

# Spark types whose cast-to-double is weakly monotone in the native sort
# order — only these may be range-split within a group
_SPLITTABLE = {
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "date",
    "timestamp",
    "timestamp_ntz",
}


def _splittable(dtype: str) -> bool:
    return dtype in _SPLITTABLE or dtype.startswith("decimal")


def _cell_expr(col: str) -> F.Column:
    """Monotone map double -> long cell id, data-independent (so it is
    identical on any recompute and needs no min/max pre-pass). Nulls stay
    null (they sort FIRST under Spark ascending and the bucket expression
    sends null comparisons to the first bucket); NaN gets the top cell
    (Spark sorts NaN LAST, above +inf)."""
    x = F.col(col).cast("double")
    k = float(_CELLS_PER_OCTAVE)
    # clamp the octave term so +-infinity stays inside the category band
    # (finite doubles give |floor(k*log2 |x|)| <= 1075*k << 1_000_000)
    mag = F.least(
        F.greatest(F.floor(F.log2(F.abs(x)) * k), F.lit(-1_000_000)),
        F.lit(1_000_000),
    ).cast("long")
    pos = mag + _POS_BASE
    neg = -mag - _POS_BASE
    return (
        F.when(F.isnan(x), F.lit(_NAN_CELL).cast("long"))
        .when(x > 0, pos)
        .when(x < 0, neg)
        .when(x == 0, F.lit(0).cast("long"))
    )


def exact_ntile(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    n_buckets: int,
    bucket_col: str = "bucket",
    bucket_names: list[str] | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Append ``bucket_col`` holding the exact ``ntile(n_buckets)`` bucket
    of each row within its ``group_col`` group under ``order_cols``
    (which, with ``group_col`` prepended, must be a total order).

    ``bucket_names[i]`` labels bucket i+1 (default: the bucket number as
    a string). Output rows and all input columns are preserved. The
    result is deterministic under arbitrary recomputation; the only loud
    failure mode left is a NON-DETERMINISTIC INPUT ``df`` (rows changing
    between the statistics pass and the action), which no exact rank can
    survive.
    """
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if bucket_names is None:
        bucket_names = [str(i + 1) for i in range(n_buckets)]
    assert len(bucket_names) == n_buckets
    assert order_cols, "exact_ntile needs at least one order column"
    if dict(df.dtypes)[group_col] in ("float", "double"):
        # bucketing itself would be exact (all bookkeeping keys on the
        # integer bucket id), but Arrow's pandas round-trip conflates NaN
        # with null in float columns, so a genuine-NaN group VALUE would
        # silently surface as null in the output rows (r8 ADVICE)
        raise TypeError(
            "exact_ntile: float/double group columns are unsupported — a NaN "
            "group key cannot round-trip through the Arrow pass losslessly; "
            "cast the group column to string or decimal first"
        )

    o1 = order_cols[0]
    split_ok = _splittable(dict(df.dtypes)[o1])

    # the input is read by the statistics pass and again by the shuffle
    # map side — pin it so expensive upstreams (ccnet's LM scoring joins)
    # compute once. O(input)-sized, so it honours the session pin knob.
    from ..session import pin_storage_level

    lvl = pin_storage_level(spark)
    src = df.persist(lvl) if lvl is not None else df.persist()

    # ---- the ONE statistics pass: exact (group, cell) histogram -------
    # O(G x distinct cells) rows on the driver — cells are log-quantized,
    # so a unit-scale domain is a few hundred rows per group; even the
    # full double range is bounded at ~1.1M cells (pathological).
    if split_ok:
        hist = (
            src.groupBy(F.col(group_col).alias("_g"), _cell_expr(o1).alias("_cell"))
            .count()
            .collect()
        )
    else:
        hist = [
            {"_g": r["_g"], "_cell": None, "count": r["count"]}
            for r in src.groupBy(F.col(group_col).alias("_g")).count().collect()
        ]

    # per-group cell tallies in cell (= sort) order; null cell first
    by_group: dict = {}
    for r in hist:
        by_group.setdefault(r["_g"], []).append((r["_cell"], r["count"]))
    for cells in by_group.values():
        cells.sort(key=lambda t: (t[0] is not None, t[0] if t[0] is not None else 0))
    total = sum(c for cells in by_group.values() for _, c in cells)

    # size the exchange to the data: the histogram already knows the row
    # count, so a small input doesn't pay n_partitions near-empty tasks
    # per downstream stage (~0.3-0.6 s of pure scheduling per 32-task job
    # on the fixture host), while a 100 TB input still spreads over the
    # full configured width — n_partitions stays the cap, never the floor
    n_partitions = max(1, min(n_partitions, -(-total // 65_536)))
    target = 2 * n_partitions  # 2x logical buckets -> decent hash balance

    # deterministic base allocation (order across groups is arbitrary for
    # correctness — each group's buckets are a disjoint id range — but a
    # stable order keeps plans reproducible across runs). Boundaries sit
    # at cell EDGES, so every bucket's row count is an exact sum of cell
    # counts: offsets need no post-shuffle counting job.
    groups = sorted(by_group, key=lambda g: (g is not None, str(g)))
    binfo: list[tuple[object, int, list[int]]] = []  # (group, base, boundary cells)
    offsets: dict[int, int] = {}  # lpid -> group-global starting offset
    totals: dict[int, int] = {}  # lpid -> its group's row count
    count_by_lpid: dict[int, int] = {}
    base = 0
    for g in groups:
        cells = by_group[g]
        n_g = sum(c for _, c in cells)
        p_g = max(1, round(target * n_g / total)) if total else 1
        bnds: list[int] = []
        cut = -(-n_g // p_g)  # ceil: close a bucket every ~cut rows
        bucket_rows: list[int] = []
        acc = 0
        run = 0
        for cell, c in cells:
            acc += c
            run += c
            # close the bucket at this cell edge once it is full enough,
            # unless this is the last cell (no boundary after the end)
            if run >= cut and acc < n_g and cell is not None and len(bnds) < p_g - 1:
                bnds.append(int(cell))
                bucket_rows.append(run)
                run = 0
        bucket_rows.append(run)
        off = 0
        for i, rows in enumerate(bucket_rows):
            lpid = base + i
            offsets[lpid] = off
            totals[lpid] = n_g
            count_by_lpid[lpid] = rows
            off += rows
        binfo.append((g, base, bnds))
        base += len(bnds) + 1

    bschema = StructType(
        [
            StructField("_g", df.schema[group_col].dataType, True),
            StructField("_base", LongType(), False),
            StructField("_bnds", ArrayType(LongType(), False), False),
        ]
    )
    bdf = spark.createDataFrame(binfo, bschema)

    # _lpid: pure function of the row (boundary cells are frozen plan
    # literals). Null order key -> null comparisons -> filter keeps
    # nothing -> first bucket (nulls sort FIRST); NaN -> top cell ->
    # beyond every boundary -> last bucket (NaN sorts LAST).
    cell = _cell_expr(o1)
    lpid = (
        F.col("_base") + F.size(F.filter(F.col("_bnds"), lambda b: cell > b))
    ).cast("long")
    data = (
        src.join(F.broadcast(bdf), F.col(group_col).eqNullSafe(F.col("_g")), "left")
        .select(*df.columns, lpid.alias("_lpid"))
        .repartition(n_partitions, "_lpid")
        .sortWithinPartitions(group_col, *order_cols)
    )
    # persist (lazy): the first downstream action populates it, and any
    # later action reuses the shuffle output instead of recomputing the
    # upstream. Placement is deterministic, so an eviction just
    # recomputes correctly.
    data = data.persist()

    sc = spark.sparkContext
    offsets_b = sc.broadcast(offsets)
    totals_b = sc.broadcast(totals)
    lpid_counts_b = sc.broadcast(count_by_lpid)

    # fresh StructType — StructType.add MUTATES, and DataFrame.schema is a
    # cached object, so adding to it in place corrupts the input's schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(bucket_col, StringType(), False)]
    )
    names = list(bucket_names)
    nb = n_buckets

    def assign(iterator):
        import numpy as np

        seen: dict = {}
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            # rows arrive sorted by (group, order); _lpid is monotone
            # along that order within a group and bucket ids are disjoint
            # across groups, so buckets are CONTIGUOUS runs — everything
            # per-row derives from one per-BUCKET lookup + np.repeat. All
            # keys are int64 bucket ids: no None-vs-NaN group ambiguity.
            sizes = pdf.groupby("_lpid", sort=False).size()
            lids = [int(l) for l in sizes.index]
            counts = sizes.to_numpy()
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            local = np.arange(len(pdf), dtype="int64") - np.repeat(starts, counts)
            bucket_base = np.array(
                [offsets_b.value[l] + seen.get(l, 0) for l in lids], dtype="int64"
            )
            rank = np.repeat(bucket_base, counts) + local + 1  # 1-based in-group rank
            n = np.repeat(
                np.array([totals_b.value[l] for l in lids], dtype="int64"), counts
            )
            # closed-form ntile: q = n div B, rem = n mod B; the first rem
            # buckets hold q+1 rows
            q, rem = n // nb, n % nb
            fat = rem * (q + 1)  # rows covered by the q+1-sized buckets
            in_fat = rank <= fat
            b = np.where(
                in_fat,
                (rank - 1) // np.maximum(q + 1, 1),
                rem + (rank - fat - 1) // np.maximum(q, 1),
            ).astype("int64")  # 0-based bucket
            out = pdf.drop(columns=["_lpid"])
            out[bucket_col] = np.array(names, dtype=object)[b]
            # advance the carry for the buckets seen in this batch
            for l, c in zip(lids, counts):
                seen[l] = seen.get(l, 0) + int(c)
            yield out
        # true invariant check: every bucket lands wholly in one physical
        # partition, so a partition must see EXACTLY the histogram's row
        # count for each bucket it saw. Placement is deterministic, so
        # this can only fire on a nondeterministic INPUT or an engine bug
        # — never on a mere recompute (which the r8 design aborted on).
        for l, c in seen.items():
            if c != lpid_counts_b.value.get(l):
                raise RuntimeError(
                    f"exact_ntile: bucket {l} saw {c} rows but the statistics "
                    f"pass counted {lpid_counts_b.value.get(l)} — the input "
                    "DataFrame is not deterministic between passes"
                )

    # note: src and data persists are released by the caller's
    # session-level cache cleanup (bench, the oracle-parity tests, and
    # the verify CLI all call session.release_cached periodically); both
    # are recompute-safe if evicted earlier
    return data.mapInPandas(assign, out_schema)
