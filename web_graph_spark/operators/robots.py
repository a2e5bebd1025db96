"""Robots-rule evaluation: broadcast prefix rules, vectorized verdicts.

The reference crawler has NO robots handling (its politeness surface is
client timeouts + a 2-worker cap, /root/reference/pkg/linkprocessor/
linkprocessor.go:51-75); robots evaluation is a north_star requirement:
"robots.txt rules broadcast and evaluated in vectorized Arrow UDFs".

Rules model (the ``robots_rules`` fixture table, FIXTURES.md):
``(host, rule_type 'allow'|'disallow', path_prefix, crawl_delay)`` —
one pre-parsed user-agent group per host (parsing robots.txt text is a
fetch-side concern; the engine consumes the parsed rule relation, the
same split the reference makes between fetching and storage).

Decision semantics = RFC 9309 §2.2.2 longest-match:

* among the host's rules whose ``path_prefix`` is a prefix of the
  page path, the LONGEST prefix wins;
* at equal length, ``allow`` wins;
* no matching rule, or no rules for the host → allowed.

Physical shape at 100 TB: the rule relation is tiny relative to the
frontier (≤ a few rules × distinct hosts), so it is compiled to a
``{host: [(prefix, allow)]}`` dict, broadcast once per wave, and probed
in ONE Arrow-batched pandas UDF — per batch the work is
(rules-of-host × batch-slice) vectorized ``str.startswith`` scans, no
per-row Python, no shuffle, no join.  A frontier of 10^10 URLs pays
only the map-side scan it already needed for canonicalization.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host -> rules sorted (longest prefix first, allow before disallow at
# equal length) so that FIRST match wins during evaluation.
CompiledRules = dict[str, list[tuple[str, bool]]]


def compile_rules(rows: Iterable[Mapping]) -> CompiledRules:
    """rows: mappings with host / rule_type / path_prefix.  Rows whose
    rule_type is neither allow nor disallow (e.g. the ``crawl-delay``
    carrier rows :func:`parse_robots_txt` emits for rule-less hosts)
    and rows with an empty/NULL prefix (RFC 9309 §2.2.2: an empty
    pattern matches nothing) are skipped — feeding the parser's output
    straight in is safe."""
    by_host: CompiledRules = {}
    for r in rows:
        rt = str(r["rule_type"]).lower()
        if rt not in ("allow", "disallow"):
            continue
        prefix = str(r["path_prefix"] or "")
        if not prefix:
            continue
        allow = rt == "allow"
        by_host.setdefault(r["host"], []).append((prefix, allow))
    for host in by_host:
        by_host[host].sort(key=lambda pa: (-len(pa[0]), not pa[1]))
    return by_host


def allowed_py(rules: CompiledRules, host: str, path: str) -> bool:
    """Scalar twin of the vectorized UDF — used by the oracle simulator
    (tests assert the two tiers agree on every fixture page)."""
    for prefix, allow in rules.get(host, ()):
        if path.startswith(prefix):
            return allow
    return True


def load_rules_py(fixture_dir: str) -> CompiledRules:
    import pyarrow.parquet as pq

    return compile_rules(
        pq.read_table(f"{fixture_dir}/robots_rules.parquet").to_pylist())


def _eval_batch(rules: CompiledRules, hosts: pd.Series,
                paths: pd.Series) -> pd.Series:
    verdict = np.ones(len(hosts), dtype=bool)
    if not rules or not len(hosts):
        return pd.Series(verdict)
    h = hosts.to_numpy(dtype=object)
    p = paths.astype(str).reset_index(drop=True)
    # one slice per distinct host in the batch; per rule a vectorized
    # startswith over that slice; first (longest) match wins.
    for host in pd.unique(h):
        host_rules = rules.get(host)
        if not host_rules:
            continue
        pos = np.nonzero(h == host)[0]
        ps = p.iloc[pos]
        undecided = np.ones(len(pos), dtype=bool)
        out = np.ones(len(pos), dtype=bool)
        for prefix, allow in host_rules:
            hit = undecided & ps.str.startswith(prefix).to_numpy()
            if hit.any():
                out[hit] = allow
                undecided &= ~hit
                if not undecided.any():
                    break
        verdict[pos] = out
    return pd.Series(verdict)


def robots_eval_udf(spark, rules: CompiledRules):
    """Arrow-vectorized (host, path) -> allowed:boolean with the
    compiled rules broadcast to every executor."""
    b = spark.sparkContext.broadcast(rules)

    @F.pandas_udf("boolean")
    def allowed(hosts: pd.Series, paths: pd.Series) -> pd.Series:
        return _eval_batch(b.value, hosts, paths)

    return allowed


def parse_robots_txt(df: DataFrame, agent: str = "*",
                     host_col: str = "host",
                     text_col: str = "robots_txt") -> DataFrame:
    """Parse raw robots.txt bodies into the engine's rule relation
    ``(host, rule_type, path_prefix, crawl_delay)`` — the fetch-side
    step this module previously declared out of scope, now first-class
    so a deployment can go fetched-bytes → rules → verdicts entirely
    in-engine.

    RFC 9309 subset, deterministic:

    * comments (``#`` to EOL) stripped, lines trimmed; a directive is
      ``key : value`` with a case-insensitive key;
    * consecutive ``User-agent`` lines open a GROUP (RFC 9309 §2.2.1:
      a rule line closes the agent list; a later ua line starts a new
      group); rules bind to their group;
    * group selection (§2.2.1): if any group names ``agent`` exactly
      (case-insensitive), ONLY those groups apply; otherwise the
      ``*`` groups; otherwise no rules (everything allowed);
    * empty ``Disallow:`` matches nothing → no row (§2.2.2);
      ``Crawl-delay`` (de-facto extension) is integer seconds,
      attached per group and folded to the host's max over applicable
      groups — the same shape :func:`budgets_from_crawl_delay` eats.

    Physical shape: bodies explode to lines partitioned by host (a
    body is ≤ a few KiB, so the per-host window is tiny however many
    hosts exist); grouping is two lag/sum windows; everything is JVM
    split/regexp/window — no Python, no driver materialization.  At
    10^8 hosts this is one host-keyed shuffle of small rows."""
    from pyspark.sql import Window

    h = F.col(host_col)
    lines = df.select(
        h.alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"))
    line = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    key = F.lower(F.trim(F.regexp_extract(line, r"^([A-Za-z-]+)\s*:", 1)))
    val = F.trim(F.regexp_extract(line, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    parsed = (lines.select("host", "pos", key.alias("key"),
                           val.alias("val"))
              .filter(F.col("key").isin("user-agent", "allow",
                                        "disallow", "crawl-delay")))
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    starts = is_ua & ~F.lag(is_ua, 1, False).over(w)
    grouped = parsed.withColumn("grp",
                                F.sum(starts.cast("int")).over(w))
    # applicable groups: exact-agent groups if any exist for the host,
    # else the '*' groups (RFC precedence) — a tiny host-keyed agg dim
    agents = (grouped.filter(is_ua)
              .groupBy("host", "grp")
              .agg(F.max((F.lower(F.col("val")) == agent.lower())
                         .cast("int")).alias("has_agent"),
                   F.max((F.col("val") == "*").cast("int"))
                   .alias("has_star")))
    host_pref = (agents.groupBy("host")
                 .agg(F.max("has_agent").alias("any_agent")))
    applicable = (agents.join(host_pref, "host")
                  .filter((F.col("has_agent") == 1)
                          | ((F.col("any_agent") == 0)
                             & (F.col("has_star") == 1)))
                  .select("host", "grp"))
    body = grouped.filter(~is_ua).join(applicable, ["host", "grp"])
    delays = (body.filter((F.col("key") == "crawl-delay")
                          & F.col("val").rlike("^[0-9]+$"))
              .groupBy("host")
              .agg(F.max(F.col("val").cast("int")).alias("crawl_delay")))
    rules = (body.filter(F.col("key").isin("allow", "disallow")
                         & (F.col("val") != ""))
             .select("host",
                     F.when(F.col("key") == "allow", "allow")
                     .otherwise("disallow").alias("rule_type"),
                     F.col("val").alias("path_prefix"))
             .distinct())
    # full outer: a host whose applicable groups carry only a delay
    # still surfaces (rule_type='crawl-delay', NULL prefix — a carrier
    # row compile_rules skips and budgets_from_crawl_delay folds in)
    return (rules.join(delays, "host", "full")
            .select("host",
                    F.coalesce("rule_type", F.lit("crawl-delay"))
                    .alias("rule_type"),
                    "path_prefix",
                    F.col("crawl_delay").cast("int").alias("crawl_delay")))


def budgets_from_crawl_delay(rules_df: DataFrame,
                             wave_seconds: float) -> DataFrame:
    """Derive the politeness budget dim from robots ``crawl_delay``:
    a host whose strictest (max) delay is d seconds may be fetched at
    most ``max(1, floor(wave_seconds / d))`` times per wave — the
    wave-batch translation of "one request every d seconds" (RFC 9309
    has no crawl-delay; this is the de-facto extension the rules table
    carries).  Hosts with no positive delay get no row: the crawler's
    ``default_budget`` applies.  The result is a broadcast dim like any
    hand-fed budgets table.

    ``wave_period``: for hosts whose delay EXCEEDS the wave cadence a
    per-wave budget cannot go below one-fetch-per-wave, so the dim also
    carries ``ceil(d / wave_seconds)`` — fetch this host only every
    that-many waves.  The crawler gates pending rows on
    ``wave % period == hash(host) % period`` (host-stable phase, so a
    long-delay host still progresses rather than starving); hosts with
    d ≤ wave_seconds get period 1 (every wave, budget binds instead).
    The effective rate is then ≤ 1/(period·wave_seconds) ≤ 1/d, honest
    politeness instead of the old clamp-to-1 that over-fetched."""
    per_host = (rules_df.groupBy("host")
                .agg(F.max("crawl_delay").alias("d"))
                .filter(F.col("d") > 0))
    ws = F.lit(float(wave_seconds))
    return per_host.select(
        "host",
        F.greatest(F.floor(ws / F.col("d")),
                   F.lit(1)).cast("int").alias("max_pages_per_wave"),
        F.greatest(F.ceil(F.col("d") / ws),
                   F.lit(1)).cast("int").alias("wave_period"))


def robots_gate_cogroup(pending: DataFrame, rules_df: DataFrame,
                        host_col: str = "host", path_col: str = "path",
                        out_col: str = "__ok") -> DataFrame:
    """Append the robots verdict via a host-keyed COGROUP — zero
    driver materialization at ANY rules/wave size (the third tier
    above full-broadcast and wave-host pruning): each task receives
    one host group's pending rows plus exactly that host's rules,
    compiles them locally, and evaluates the same vectorized
    ``_eval_batch`` the broadcast path uses.  Pick this when even one
    WAVE's distinct hosts × rules won't fit through the driver
    (10^6+ hosts/wave); it costs one extra host-shuffle of the wave
    plus an Arrow round-trip, which the politeness host-window was
    about to pay anyway.  Result ≡ the broadcast path by construction
    (same rule compilation + evaluator); equality is test-pinned."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    # copy, don't .add() in place — DataFrame.schema is a cached object
    # and mutating it corrupts the source frame's resolved columns
    out_schema = StructType(list(pending.schema.fields)
                            + [StructField(out_col, BooleanType())])
    cols = [f.name for f in out_schema.fields]

    def gate(ppdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(ppdf) == 0:
            # rules-only host group (no pending rows this wave)
            return pd.DataFrame({c: [] for c in cols})
        rules = (compile_rules(rpdf.to_dict("records"))
                 if len(rpdf) else {})
        out = ppdf.copy()
        out[out_col] = _eval_batch(rules, ppdf[host_col],
                                   ppdf[path_col]).to_numpy()
        return out[cols]

    return (pending.groupBy(host_col)
            .cogroup(rules_df.groupBy(F.col("host").alias(host_col)))
            .applyInPandas(gate, schema=out_schema))


def with_robots_allowed(spark, df: DataFrame, rules_df: DataFrame | None,
                        host_col: str | Column = "host",
                        path_col: str | Column = "path",
                        out_col: str = "robots_allowed") -> DataFrame:
    """Append the robots verdict column.  ``rules_df`` is the small rule
    relation (collected driver-side once — it is a broadcast dim by
    construction); None ≡ no rules ≡ everything allowed."""
    if rules_df is None:
        return df.withColumn(out_col, F.lit(True))
    rules = compile_rules(r.asDict() for r in rules_df.collect())
    udf = robots_eval_udf(spark, rules)
    host = F.col(host_col) if isinstance(host_col, str) else host_col
    path = F.col(path_col) if isinstance(path_col, str) else path_col
    return df.withColumn(out_col, udf(host, path))


def sitemap_urls(df: DataFrame, host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """Extract ``Sitemap:`` declarations from raw robots.txt bodies —
    the discovery half of the sitemaps.org protocol (the ingest half
    is operators/sitemap.py).  Per the protocol the directive is
    independent of every user-agent group (it may appear anywhere in
    the file), its key is case-insensitive, and its value must be an
    absolute URL — relative values are dropped, duplicates dedupe.

    The value regex captures everything after the FIRST colon, so the
    ``https://`` in the URL survives the key split.  Pure JVM
    split/regexp scan + one (host, url) distinct; at 10^8 hosts this
    is scan-bound with a single uniform-key shuffle.  Returns
    ``(host, sitemap_url)``."""
    h = F.col(host_col)
    lines = df.select(
        h.alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"))
    line = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    key = F.lower(F.trim(F.regexp_extract(line, r"^([A-Za-z-]+)\s*:", 1)))
    val = F.trim(F.regexp_extract(line, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    return (lines.select("host", key.alias("k"), val.alias("v"))
            .filter((F.col("k") == "sitemap")
                    & F.col("v").rlike("^https?://"))
            .select("host", F.col("v").alias("sitemap_url"))
            .distinct())


def wildcard_regex(pattern: Column) -> Column:
    """Compile an RFC 9309 §2.2.3 wildcard path pattern to an anchored
    regex, entirely in JVM expressions: every regex metacharacter is
    escaped, ``*`` becomes ``.*`` (any octets), and a TRAILING ``$``
    becomes the end-anchor (a mid-pattern ``$`` stays literal, the
    Googlebot reading).  No trailing ``$`` → prefix semantics, i.e.
    the regex is start-anchored and right-open."""
    esc = F.regexp_replace(pattern, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    star = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.when(
        pattern.endswith("$"),
        F.concat(F.lit("^"),
                 star.substr(F.lit(1), F.length(star) - 2),
                 F.lit("$"))
    ).otherwise(F.concat(F.lit("^"), star))


def robots_wildcard_eval(pending: DataFrame, rules_df: DataFrame,
                         id_cols: list[str],
                         broadcast_rules: bool = True) -> DataFrame:
    """Wildcard-capable robots verdicts (E150) — the §2.2.3 extension
    tier next to the prefix tiers (:func:`robots_eval_udf` broadcast
    UDF, :func:`robots_gate_cogroup`): rules carry ``*`` and ``$``,
    precedence is MOST-SPECIFIC-MATCH by octet length of the pattern
    (RFC 9309 §2.2.2 applied to the pattern string, the Googlebot
    rule), ties → least restrictive (allow first), then (pattern,
    rule_type) lexicographic so the winner is fully deterministic.
    No matching rule, or a host with no rules → allowed.

    Shape: rules are compiled to anchored regexes ONCE on the dim
    side (JVM ``regexp_replace``/``replace``, no Python), then an
    equi-join on host + an ``rlike`` filter + one window per pending
    row keyed by ``id_cols``.  With ``broadcast_rules`` (the default
    — a parsed-rules dim is tiny next to a frontier) the join is
    map-side and the only shuffle is the per-URL window; at 10^8-host
    rule dims flip it off and the join shuffles on host, where AQE
    skew-split absorbs hot hosts.  Unmatched pending rows rejoin via
    a left join on the same keys.

    → pending columns + ``(allowed, m_pattern, m_type)`` — the
    winning rule surfaced for auditability (NULL when no rule
    matched).

    Reference analog: none (the reference has no robots layer);
    engine extension, SURVEY §2.10 E150.
    """
    from pyspark.sql import Window

    rx = rules_df.select(
        F.col("host"), F.col("rule_type"), F.col("pattern"),
        wildcard_regex(F.col("pattern")).alias("rx"),
        F.length("pattern").alias("spec"))
    if broadcast_rules:
        rx = F.broadcast(rx)
    hits = (pending.join(rx, "host", "inner")
            .where(F.expr("path rlike rx")))
    w = (Window.partitionBy(*id_cols)
         .orderBy(F.col("spec").desc(),
                  (F.col("rule_type") == "allow").desc(),
                  F.col("pattern"), F.col("rule_type")))
    best = (hits.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(*id_cols,
                    (F.col("rule_type") == "allow").alias("m_allow"),
                    F.col("pattern").alias("m_pattern"),
                    F.col("rule_type").alias("m_type")))
    return (pending.join(best, id_cols, "left")
            .select(*pending.columns,
                    F.coalesce(F.col("m_allow"), F.lit(True))
                    .alias("allowed"),
                    "m_pattern", "m_type"))


def robots_transition(pending: DataFrame, rules_old: DataFrame,
                      rules_new: DataFrame, id_cols: list[str],
                      broadcast_rules: bool = True) -> DataFrame:
    """Retro-compliance audit across a robots.txt change (E151) —
    the operational reality behind AI-crawler opt-outs: a host
    tightening its rules does not just gate FUTURE fetches, it
    obligates the pipeline to find every already-stored page the new
    rules now forbid (the purge list) and, symmetrically, every page
    a loosening re-opens for recrawl.  Verdict per pending row under
    BOTH snapshots (two :func:`robots_wildcard_eval` passes — full
    §2.2.3 wildcard precedence each) folded to one transition label:

    * ``kept``    — allowed before and after;
    * ``purge``   — allowed → blocked (delete/quarantine these);
    * ``opened``  — blocked → allowed (recrawl candidates);
    * ``blocked`` — blocked both sides (never stored, nothing owed).

    Shape: the two eval passes share the pending scan shape (host
    equi-join + rlike + per-URL window each); the fold is two
    key-joins on ``id_cols``.  An audit job, not a per-wave gate —
    two passes over 10^10 URLs is the honest cost of re-deciding
    every URL under two rule sets.

    → pending columns + ``(allowed_old, allowed_new, transition)``.

    Reference analog: none (no robots layer in the reference);
    engine extension, SURVEY §2.10 E151.
    """
    old = (robots_wildcard_eval(pending, rules_old, id_cols,
                                broadcast_rules)
           .select(*id_cols, F.col("allowed").alias("allowed_old")))
    new = (robots_wildcard_eval(pending, rules_new, id_cols,
                                broadcast_rules)
           .select(*id_cols, F.col("allowed").alias("allowed_new")))
    lab = (F.when(F.col("allowed_old") & F.col("allowed_new"),
                  F.lit("kept"))
           .when(F.col("allowed_old") & ~F.col("allowed_new"),
                 F.lit("purge"))
           .when(~F.col("allowed_old") & F.col("allowed_new"),
                 F.lit("opened"))
           .otherwise(F.lit("blocked")))
    return (pending.join(old, id_cols).join(new, id_cols)
            .select(*pending.columns, "allowed_old", "allowed_new",
                    lab.alias("transition")))
