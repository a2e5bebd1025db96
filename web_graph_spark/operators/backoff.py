"""Adaptive per-host backoff budgets — operator E52.

A polite crawler reacts to what hosts tell it: HTTP 429 / 5xx mean
"slow down", and a host that keeps failing should cost one probe per
wave, not a full budget of doomed fetches.  The reference's politeness
is static (one queue consumer per host shard,
/root/reference/pkg/linkprocessor/linkprocessor.go:80-121); this
extension derives the per-host wave budget from the observed fetch
outcomes, in the AIMD spirit of TCP congestion control (multiplicative
decrease on failure streaks, recovery to the base budget as soon as a
fetch succeeds).

All-integer scoring, so any SQL engine reproduces the budgets
bit-for-bit:

* ``err_bp``        — failure share of the host's history in basis
                      points: ``n_err * 10000 div n_obs``.
* ``trail_streak``  — consecutive failures at the END of the history:
                      the count of outcomes strictly newer than the
                      host's last success (the whole history when it
                      never succeeded).
* ``budget``        — ``max(1, (base * (10000 - err_bp) div 10000)
                      >> min(trail_streak, 6))``: a proportional
                      penalty for chronic flakiness times a halving
                      per trailing failure, floored at one probe so a
                      recovering host is always re-tested.

Physical shape: two uniform-key aggregations over the outcomes
relation (host keys; the conditional-max for ``last_ok_ts`` and the
conditional counts fold into ONE groupBy via ``max(when)`` /
``sum(when)``) — no window, no sort, no skew: a hot host contributes
more ROWS to the agg's map-side partials, never more KEYS.  The output
dim feeds ``schedule_wave(budgets=...)`` unchanged.

Deliberately NOT wired into ``SparkCrawler``'s wave loop: the fetch
seam records ``fetch_ok`` only (FETCH_COLS), which conflates 404 (bad
URL — must not back off) with 5xx (struggling host — must).  Deriving
budgets from fetch_ok would punish hosts for their dead links, so the
operator requires a status-carrying outcome relation (the pooled
fetcher sees statuses internally; a deployment logs them alongside
the page sink) and composes upstream of the crawler via the
``budgets=`` seam — composition pinned in
tests/test_skew_priority.py::test_backoff_budgets_feed_schedule_wave.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["backoff_budgets", "ERROR_STATUSES"]

# "slow down" signals: rate limiting + server-side failure.  4xx other
# than 429 means the URL is bad, not the host — it does not back off.
ERROR_STATUSES = (429, 500, 502, 503, 504)


def backoff_budgets(outcomes: DataFrame, base_budget: int,
                    host_col: str = "host", ts_col: str = "fetched_at",
                    status_col: str = "status") -> DataFrame:
    """(host, n_obs, n_err, err_bp, trail_streak, budget) from a fetch
    outcome relation ``(host, fetched_at, status)``.

    ``budget`` is the per-wave page budget for ``schedule_wave``:
    multiplicative decrease per trailing failure, proportional penalty
    for lifetime error share, floor of one probe fetch per wave.
    """
    is_err = F.col(status_col).isin(*ERROR_STATUSES)
    per_host = (outcomes
                .groupBy(F.col(host_col).alias("host"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_obs"),
                     F.sum(is_err.cast("long")).alias("n_err"),
                     F.max(F.when(~is_err, F.col(ts_col)))
                     .alias("last_ok_ts")))
    # trailing-failure streak: outcomes strictly newer than the last
    # success.  Second agg joins back on the host key — both sides
    # hash-partition on host, AQE broadcasts the dim when it fits.
    ok_dim = per_host.select(F.col("host").alias("__h"), "last_ok_ts")
    streak = (outcomes
              .join(ok_dim, F.col(host_col) == F.col("__h"))
              .groupBy(F.col("__h").alias("host"))
              .agg(F.sum((F.col("last_ok_ts").isNull() |
                          (F.col(ts_col) > F.col("last_ok_ts")))
                         .cast("long")).alias("trail_streak")))
    return (per_host.join(streak, "host")
            .select(
                "host", "n_obs", "n_err",
                F.expr("n_err * 10000 div n_obs").cast("long")
                .alias("err_bp"),
                F.col("trail_streak").cast("long").alias("trail_streak"),
                F.expr(
                    f"greatest(1L, shiftright(cast({int(base_budget)} * "
                    "(10000 - n_err * 10000 div n_obs) div 10000 "
                    "as long), cast(least(trail_streak, 6) as int)))")
                .cast("long").alias("budget")))


def aimd_trajectory(outcomes: DataFrame, base: int = 4, cap: int = 8,
                    host_col: str = "host", wave_col: str = "wave",
                    fail_col: str = "failed") -> DataFrame:
    """Per-host AIMD budget TRAJECTORY (the TCP congestion-control
    recurrence, Chiu & Jain 1989 — the stateful twin of
    :func:`backoff_budgets`): fold the host's wave outcomes in wave
    order through ``b ← failed ? max(1, b div 2) : min(cap, b + 1)``
    starting from ``base`` and emit the budget AFTER every wave.

    Why a second operator: :func:`backoff_budgets` is a CLOSED-FORM
    score of the history (order enters only via the trailing streak);
    AIMD is order-sensitive state — fail-then-recover and
    recover-then-fail end at different budgets (pinned), which is the
    behavior a rate controller actually needs (slow-start recovery
    after a 429 burst instead of an instant jump back to base).

    Physical shape: ONE host-key aggregation collects each host's
    ``(wave, failed)`` pairs (sort_array makes the fold order
    deterministic whatever the shuffle order), then a JVM
    higher-order ``aggregate`` fold builds the whole budget array in
    a single pass — no per-wave shuffle, no Python, no window; waves
    per host are bounded (a controller's horizon), hosts are the
    uniform parallel key.  posexplode restores the row grain.

    → ``(host, wave, failed, budget)``; budget = after that wave.

    Reference analog: none — engine extension (SURVEY §2.10 E137).
    """
    per = (outcomes.groupBy(F.col(host_col).alias("host"))
           .agg(F.sort_array(F.collect_list(F.struct(
               F.col(wave_col).cast("long").alias("w"),
               F.col(fail_col).cast("int").alias("f")))).alias("obs")))
    step = (f"CASE WHEN x.f > 0 THEN greatest(element_at(acc, -1) "
            f"div 2, 1L) ELSE least(element_at(acc, -1) + 1L, "
            f"{int(cap)}L) END")
    fold = F.expr(
        f"slice(aggregate(obs, array(cast({int(base)} as long)), "
        f"(acc, x) -> concat(acc, array({step}))), 2, size(obs))")
    return (per.select("host", F.posexplode(
                F.arrays_zip(F.col("obs"), fold.alias("b"))))
            .select("host",
                    F.col("col.obs.w").alias("wave"),
                    F.col("col.obs.f").cast("int").alias("failed"),
                    F.col("col.b").cast("long").alias("budget")))
