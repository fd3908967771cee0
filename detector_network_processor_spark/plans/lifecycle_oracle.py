"""Station-lifecycle state machine as a DuckDB recursive-CTE oracle.

SQL mirror of operators/station_golden.py (reference
src/analysis/detectorstation.cpp:31-156, src/supervision/station.cpp:53-118):
per station the state is ONE row — status, last GNSS log, the two 10-slot
rate rings reduced to what transitions depend on, the 5-sample
reliability-time ring, and the accumulated transition list — advanced one
record per recursive iteration with list lambdas. Validated
transition-for-transition against the golden model at sf0.001 and sf0.01.

The generated SQL is self-contained ANSI-ish DuckDB (no engine functions)
so the driver can adjudicate the §2.8 operator by value hash, not just
row count.
"""

from __future__ import annotations

from ..constants import (
    HYSTERESIS,
    LOG_INTERVAL_S,
    MAX_LOCATION_ERROR_M,
    MAX_TIMING_ERROR_NS,
    OFFLINE_INTERVAL_S,
    QUIT_INTERVAL_S,
    STDDEV_FACTOR,
)

NS = 1_000_000_000
HI = 1.0 + HYSTERESIS
LO = 1.0 - HYSTERESIS
I30 = 30 * NS

TR_T = "STRUCT(ts BIGINT, status VARCHAR, reason VARCHAR)"
STATE_T = (
    "STRUCT(status BIGINT, status_ts BIGINT, last_log BIGINT, dop DOUBLE, h_acc DOUBLE, v_acc DOUBLE, "
    "cr_counter BIGINT, cr_start BIGINT, "
    f"mr_slots DOUBLE[], mr_counter BIGINT, mr_start BIGINT, ring5 DOUBLE[], tr {TR_T}[])"
)
ZERO10 = "[0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]"
EMPTY_TR = f"CAST([] AS {TR_T}[])"

_UNREL = "'unreliable'"
_MISSED = "'missed_log_interval'"
_OFFL = "'offline'"
_DELE = "'deleted'"
_ONLINE = "'online'"
_MISC = "'miscellaneous'"
_EXTREME = "'time_accuracy_extreme'"

_FIELDS = [
    "status", "status_ts", "last_log", "dop", "h_acc", "v_acc",
    "cr_counter", "cr_start", "mr_slots", "mr_counter", "mr_start", "ring5", "tr",
]


def mk(src: str, **over) -> str:
    """struct_pack of the state carrying `src`'s fields with overrides."""
    parts = ", ".join(f"{f} := {over.get(f, src + '.' + f)}" for f in _FIELDS)
    return f"struct_pack({parts})"


def tr(ts: str, status: str, reason: str) -> str:
    return f"struct_pack(ts := {ts}, status := {status}, reason := {reason})"


def bind(val: str, name: str, body: str) -> str:
    """Single-element-list lambda binding: evaluate `val` once as `name`."""
    return f"list_transform([{val}], {name} -> {body})[1]"


def check_reliability(s_expr: str, now: str) -> str:
    """check_reliability(now): binds cs (state), crm (mean), csd (stddev),
    cv (verdict). Mirrors detectorstation.cpp:89-107 incl. the unguarded
    stddev/(mean*0.75): NaN (0/0) fails both hysteresis branches, inf
    (x/0) triggers only the unreliable branch — spelled out explicitly
    because DuckDB orders NaN above all doubles, unlike IEEE comparisons."""
    f_loc = f"((cs.dop * sqrt(cs.h_acc * cs.h_acc + cs.v_acc * cs.v_acc)) / {MAX_LOCATION_ERROR_M!r})"
    f_time = (
        "((CASE WHEN len(cs.ring5) = 0 THEN 0.0 "
        f"ELSE list_aggregate(cs.ring5, 'sum') / CAST(len(cs.ring5) AS DOUBLE) END) / {MAX_TIMING_ERROR_NS!r})"
    )
    rm_v = "list_aggregate(cs.mr_slots, 'sum') / 10.0"
    sd_v = "sqrt(list_aggregate(list_transform(cs.mr_slots, x -> (x - crm) * (x - crm)), 'sum') / 10.0)"
    denom = f"(crm * {STDDEV_FACTOR!r})"
    verdict = f"""CASE
      WHEN {f_loc} > {HI!r} THEN struct_pack(st2 := CAST(4 AS BIGINT), rs := 'location_precision')
      WHEN {f_time} > {HI!r} THEN struct_pack(st2 := CAST(4 AS BIGINT), rs := 'time_accuracy')
      WHEN ({denom} = 0.0 AND csd > 0.0) OR ({denom} > 0.0 AND csd / {denom} > {HI!r})
        THEN struct_pack(st2 := CAST(4 AS BIGINT), rs := 'rate_unstable')
      WHEN {f_loc} < {LO!r} AND {f_time} < {LO!r} AND {denom} > 0.0 AND csd / {denom} < {LO!r}
        THEN struct_pack(st2 := CAST(5 AS BIGINT), rs := 'miscellaneous')
      ELSE struct_pack(st2 := CAST(0 AS BIGINT), rs := '') END"""
    newtr = (
        "CASE WHEN cv.st2 != 0 AND cv.st2 != cs.status THEN cs.tr || ["
        + tr(now, "CASE cv.st2 WHEN 4 THEN 'unreliable' ELSE 'reliable' END", "cv.rs")
        + "] ELSE cs.tr END"
    )
    applied = mk(
        "cs",
        status="CASE WHEN cv.st2 != 0 THEN cv.st2 ELSE cs.status END",
        status_ts=f"CASE WHEN cv.st2 != 0 AND cv.st2 != cs.status THEN {now} ELSE cs.status_ts END",
        tr=newtr,
    )
    return bind(
        s_expr, "cs",
        bind(rm_v, "crm", bind(sd_v, "csd", bind(verdict, "cv", applied))),
    )


def rate_step(s_expr: str, now: str) -> str:
    """current_rate.step(now) + conditional mean_rate.step(now).
    Binds rp (state), rk (current intervals crossed), rk2 (mean)."""
    rolled_mr = mk(
        "rp",
        cr_counter="CAST(0 AS BIGINT)",
        cr_start=f"rp.cr_start + rk * {I30}",
        mr_slots=bind(
            f"rp.mr_slots || [CAST(rp.mr_counter AS DOUBLE) / 30.0] || list_transform(range(1, rk2), zz -> 0.0)",
            "nl", "nl[len(nl) - 9:]",
        ),
        mr_counter="CAST(0 AS BIGINT)",
        mr_start=f"rp.mr_start + rk2 * {I30}",
    )
    rolled_cr_only = mk("rp", cr_counter="CAST(0 AS BIGINT)", cr_start=f"rp.cr_start + rk * {I30}")
    mr_init = mk(
        "rp", cr_counter="CAST(0 AS BIGINT)", cr_start=f"rp.cr_start + rk * {I30}", mr_start=now
    )
    mr_branch = (
        f"CASE WHEN rp.mr_start IS NULL THEN {mr_init} ELSE "
        + bind(
            f"({now} - rp.mr_start) // {I30}", "rk2",
            f"CASE WHEN rk2 <= 0 THEN {rolled_cr_only} ELSE {rolled_mr} END",
        )
        + " END"
    )
    body = (
        f"CASE WHEN rp.cr_start IS NULL THEN {mk('rp', cr_start=now)} ELSE "
        + bind(
            f"({now} - rp.cr_start) // {I30}", "rk",
            f"CASE WHEN rk <= 0 THEN rp ELSE {mr_branch} END",
        )
        + " END"
    )
    return bind(s_expr, "rp", body)


def step(s_expr: str, now: str) -> str:
    """step(now): timers then reliability/rate (detectorstation.cpp:109-135
    with event-time thresholds). Binds sp (state), sdf (gap)."""
    log_ns, off_ns, quit_ns = LOG_INTERVAL_S * NS, OFFLINE_INTERVAL_S * NS, QUIT_INTERVAL_S * NS
    # Re-transitions after a later wake-up must not be stamped before the
    # transition that preceded them: clamp every timer stamp to the time of
    # the last status change (mirrors golden set_status).
    u_ts = f"greatest(sp.last_log + {log_ns}, sp.status_ts)"
    o_ts = f"greatest(sp.last_log + {off_ns}, sp.status_ts)"
    d_ts = f"greatest(sp.last_log + {quit_ns}, sp.status_ts)"
    early_tr = (
        "sp.tr || (CASE WHEN sp.status NOT IN (3, 1) THEN "
        f"(CASE WHEN sp.status != 4 THEN [{tr(u_ts, _UNREL, _MISSED)}] "
        f"ELSE {EMPTY_TR} END) || [{tr(o_ts, _OFFL, _MISSED)}] "
        f"ELSE {EMPTY_TR} END) "
        f"|| (CASE WHEN sdf > {quit_ns} THEN [{tr(d_ts, _DELE, _MISSED)}] "
        f"ELSE {EMPTY_TR} END)"
    )
    early = mk(
        "sp",
        status=f"CASE WHEN sdf > {quit_ns} THEN 1 WHEN sp.status != 3 THEN 3 ELSE sp.status END",
        status_ts=(
            f"CASE WHEN sdf > {quit_ns} THEN {d_ts} "
            f"WHEN sp.status NOT IN (3, 1) THEN {o_ts} ELSE sp.status_ts END"
        ),
        tr=early_tr,
    )
    mid = mk(
        "sp",
        status="CAST(4 AS BIGINT)",
        status_ts=f"CASE WHEN sp.status != 4 THEN {u_ts} ELSE sp.status_ts END",
        tr=(
            f"CASE WHEN sp.status != 4 THEN sp.tr || [{tr(u_ts, _UNREL, _MISSED)}] "
            "ELSE sp.tr END"
        ),
    )
    body = bind(
        f"{now} - sp.last_log", "sdf",
        f"CASE WHEN sdf > {off_ns} THEN {early} "
        f"WHEN sdf > {log_ns} THEN {rate_step(mid, now)} "
        f"ELSE {rate_step(check_reliability('sp', now), now)} END",
    )
    return bind(s_expr, "sp", body)


def process_log(s_expr: str) -> str:
    upd = mk("lp", last_log="rec.ts", dop="rec.dop", h_acc="rec.h_acc", v_acc="rec.v_acc")
    return check_reliability(bind(s_expr, "lp", upd), "rec.ts")


def process_event(s_expr: str) -> str:
    upd = mk(
        "pe",
        status_ts=(
            "CASE WHEN rec.time_acc > 100000.0 AND pe.status != 4 "
            "THEN rec.ts ELSE pe.status_ts END"
        ),
        cr_counter="pe.cr_counter + 1",
        mr_counter="pe.mr_counter + 1",
        ring5=bind("pe.ring5 || [CAST(rec.time_acc AS DOUBLE)]", "nl", "nl[greatest(len(nl) - 4, 1):]"),
        status="CASE WHEN rec.time_acc > 100000.0 THEN 4 ELSE pe.status END",
        tr=(
            "CASE WHEN rec.time_acc > 100000.0 AND pe.status != 4 "
            f"THEN pe.tr || [{tr('rec.ts', _UNREL, _EXTREME)}] ELSE pe.tr END"
        ),
    )
    return bind(s_expr, "pe", upd)


def fold() -> str:
    """fold(st, rec) -> new state; st/rec provided by the enclosing query."""
    created = mk(
        "st",
        status="CAST(2 AS BIGINT)",
        status_ts="rec.ts",
        last_log="rec.ts",
        dop="rec.dop",
        h_acc="rec.h_acc",
        v_acc="rec.v_acc",
        cr_counter="CAST(0 AS BIGINT)",
        cr_start="CAST(NULL AS BIGINT)",
        mr_slots=ZERO10,
        mr_counter="CAST(0 AS BIGINT)",
        mr_start="CAST(NULL AS BIGINT)",
        ring5="CAST([] AS DOUBLE[])",
        tr=f"COALESCE(st.tr, {EMPTY_TR}) || [{tr('rec.ts', _ONLINE, _MISC)}]",
    )
    after_step = bind(
        step("st", "rec.ts"), "s1",
        f"CASE WHEN s1.status = 1 THEN s1 "
        f"WHEN rec.is_log THEN {process_log('s1')} "
        f"ELSE {process_event('s1')} END",
    )
    return (
        "CASE WHEN st.status IS NULL OR st.status = 1 THEN "
        f"CASE WHEN NOT rec.is_log THEN st ELSE {created} END "
        f"ELSE {after_step} END"
    )


def station_lifecycle_oracle_sql(
    ts_ns: str = "epoch_us(ts) * 1000",
    ev_time_acc: str = "event_id % 2000",
    dop: str = "1.0 + (event_id % 40) / 10.0",
    h_acc: str = "30.0 + (event_id % 200)",
) -> str:
    """Full oracle SQL for the station_lifecycle driver query.

    The fixture-framing expressions are parameters so derived queries can
    replay the SAME state machine on a different deterministic framing —
    pair_uptime uses a time-compressed, quality-clean variant in which
    stations actually reach `reliable` (the real 30-day cadence never
    clears the 90 s log timer, so the default framing has no reliable
    intervals and per-pair uptime would be vacuously empty)."""
    return f"""
WITH RECURSIVE
lev AS (
  SELECT user_id AS hash, {ts_ns} AS ts_ns, event_id FROM events
),
lmerged AS (
  SELECT hash, ts_ns AS ts, FALSE AS is_log,
         CAST({ev_time_acc} AS BIGINT) AS time_acc,
         CAST(0.0 AS DOUBLE) AS dop, CAST(0.0 AS DOUBLE) AS h_acc, CAST(0.0 AS DOUBLE) AS v_acc
  FROM lev
  UNION ALL
  SELECT hash, ts_ns AS ts, TRUE AS is_log, CAST(0 AS BIGINT) AS time_acc,
         CAST({dop} AS DOUBLE) AS dop,
         CAST({h_acc} AS DOUBLE) AS h_acc, CAST(40.0 AS DOUBLE) AS v_acc
  FROM lev WHERE event_id % 5 = 0
),
srecs AS MATERIALIZED (
  -- MATERIALIZED is load-bearing (same pin as the converged-graph and
  -- L1-replay oracles): the recursive step joins srecs every iteration,
  -- and DuckDB inlines non-recursive CTEs referenced from a recursive
  -- term — without the pin the lev/lmerged framing re-evaluates once per
  -- replayed record position at sf0.1
  SELECT hash, CAST(count(*) AS BIGINT) AS len,
         list(struct_pack(ts := ts, is_log := is_log, time_acc := time_acc,
                          dop := dop, h_acc := h_acc, v_acc := v_acc)
              ORDER BY ts, is_log DESC) AS rl
  FROM lmerged GROUP BY hash
),
walk(hash, i, len, st) AS (
  SELECT hash, CAST(0 AS BIGINT), len, CAST(NULL AS {STATE_T}) FROM srecs
  UNION ALL
  SELECT hash, i, len, {fold()}
  FROM (
    SELECT w.hash, w.i + 1 AS i, w.len, w.st AS st, s.rl[w.i + 1] AS rec
    FROM walk w JOIN srecs s ON w.hash = s.hash
    WHERE w.i < w.len
  )
)
SELECT hash, t.ts AS ts, t.status AS status, t.reason AS reason
FROM (SELECT hash, unnest(st.tr) AS t FROM walk WHERE i = len AND st.tr IS NOT NULL)
"""
