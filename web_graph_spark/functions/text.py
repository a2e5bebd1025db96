"""Text analysis over the ``documents`` table — all JVM-side built-ins
(whole-stage codegen; no Python in the hot path).

Ratios are exposed as ``floor(ratio * 10000)`` integers so the DuckDB
oracle compares exactly (no cross-engine float-rounding hazards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

# language marker words (word-boundary counted); text here is synthetic
# word soup, so this is a deterministic heuristic, not a real classifier.
LANG_MARKERS = {
    "de": ("der", "und", "die", "das"),
    "en": ("the", "and", "is", "of"),
    "es": ("el", "la", "los", "las"),
    "fr": ("le", "et", "les", "des"),
}

PUNCT_CLASS = r"[.,;:!?]"


def token_count(text: Column) -> Column:
    """Whitespace tokenization via non-overlapping \\S+ matches —
    identical to DuckDB ``len(regexp_extract_all(text, '\\S+'))``."""
    return F.regexp_count(text, F.lit(r"\S+"))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish sub-word proxy: count word pieces of ≤4 chars after
    splitting on non-alphanumerics (deterministic, JVM-side)."""
    return F.regexp_count(text, F.lit(r"[A-Za-z0-9]{1,4}"))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """length / punctuation / stopword / digit ratios → 0-10000 ints +
    a composite quality score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.regexp_count(t, F.lit(PUNCT_CLASS))
    n_digit = F.regexp_count(t, F.lit(r"[0-9]"))
    n_stop = sum((F.regexp_count(F.lower(t), F.lit(rf"\b{w}\b"))
                  for w in STOPWORDS), F.lit(0))
    r = lambda num, den: F.floor(num * 10000 / F.greatest(den, F.lit(1))) \
        .cast("long")
    out = (df.withColumn("n_chars", n_chars.cast("long"))
             .withColumn("n_tokens", n_tokens.cast("long"))
             .withColumn("punct_ratio_bp", r(n_punct, n_chars))
             .withColumn("digit_ratio_bp", r(n_digit, n_chars))
             .withColumn("stopword_ratio_bp", r(n_stop, n_tokens)))
    # composite: reward stopword density + length, penalize punct/digit
    score = (F.least(F.col("n_tokens"), F.lit(200)) * 20
             + F.col("stopword_ratio_bp")
             - F.col("punct_ratio_bp") - F.col("digit_ratio_bp"))
    return out.withColumn("quality_score", F.greatest(score, F.lit(0))
                          .cast("long"))


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    scores = {
        lang: sum((F.regexp_count(low, F.lit(rf"\b{m}\b")) for m in ms),
                  F.lit(0))
        for lang, ms in LANG_MARKERS.items()
    }
    scores["zh"] = F.regexp_count(text, F.lit(r"[一-鿿]")) * 3
    return scores


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """argmax over marker-hit counts; ties break alphabetically
    (identical CASE-chain semantics in the DuckDB oracle)."""
    s = lang_scores(F.col(text_col))
    langs = sorted(s)  # alphabetical precedence on ties
    guess = None
    for lang in langs:
        # winner iff ≥ every later lang and > every earlier lang —
        # exactly one lang satisfies this (argmax, alphabetical ties)
        cond = F.lit(True)
        for other in langs:
            if other == lang:
                continue
            ge = (s[lang] >= s[other]) if other > lang else (s[lang] > s[other])
            cond = cond & ge
        guess = F.when(cond, F.lit(lang)) if guess is None \
            else guess.when(cond, F.lit(lang))
    return df.withColumn("lang_guess", guess)


def normalize_text(text: Column) -> Column:
    """lowercase + collapse whitespace + trim (dedupe normal form)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint = md5 of the normal form (X1-style identity
    for documents; md5 so the DuckDB oracle can reproduce it)."""
    return df.withColumn(out_col, F.md5(normalize_text(F.col(text_col))))


# word n-gram arrays via transform-with-index over a SLICE of the token
# array — NOT transform(sequence(0, size-n), ...): Spark's sequence()
# generates a DESCENDING range when start > stop, so docs shorter than
# n tokens would produce garbage grams instead of an empty array.
_BIGRAMS = ("transform(slice(t, 1, greatest(size(t) - 1, 0)), "
            "(x, i) -> concat(x, ' ', t[i + 1]))")
_TRIGRAMS = ("transform(slice(t, 1, greatest(size(t) - 2, 0)), "
             "(x, i) -> concat(x, ' ', t[i + 1], ' ', t[i + 2]))")


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021
    §A1.1 'repetitious documents are poor training text'):

    * ``distinct_token_bp`` — type/token ratio (low = repetitious)
    * ``top_bigram_bp``     — fraction of bigram occurrences taken by
      the single most frequent bigram
    * ``dup_trigram_bp``    — fraction of trigram occurrences whose
      trigram appears more than once

    All ratios are ``floor(r * 10000)`` ints (cross-engine exact).
    Physical shape: explode n-grams → count per (doc, gram) → fold per
    doc.  Both shuffles key on (doc_id[, gram]) — high-cardinality,
    uniform, map-side partial aggregation applies; nothing is
    quadratic in document length and no Python runs anywhere.
    """
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.split(F.col(text_col), " ").alias("t"))

    def grams(expr: str) -> DataFrame:
        g = toks.select("doc_id", F.explode(F.expr(expr)).alias("g"))
        return g.groupBy("doc_id", "g").agg(F.count("*").alias("c"))

    tstat = (grams("t")
             .groupBy("doc_id")
             .agg(F.sum("c").alias("n_tokens"),
                  F.count("*").alias("n_distinct")))
    bstat = (grams(_BIGRAMS)
             .groupBy("doc_id")
             .agg(F.max("c").alias("mx"), F.sum("c").alias("tot")))
    dstat = (grams(_TRIGRAMS)
             .groupBy("doc_id")
             .agg(F.sum(F.when(F.col("c") > 1, F.col("c"))
                        .otherwise(F.lit(0))).alias("dup"),
                  F.sum("c").alias("tot")))
    bp = lambda num, den: F.floor(num * 10000.0
                                  / F.greatest(den, F.lit(1))).cast("long")
    z = lambda c: F.coalesce(c, F.lit(0))
    return (tstat
            .join(bstat, "doc_id", "left")
            .join(dstat.withColumnRenamed("tot", "ttot"), "doc_id", "left")
            .select("doc_id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    bp(F.col("n_distinct"), F.col("n_tokens"))
                    .alias("distinct_token_bp"),
                    bp(z(F.col("mx")), z(F.col("tot")))
                    .alias("top_bigram_bp"),
                    bp(z(F.col("dup")), z(F.col("ttot")))
                    .alias("dup_trigram_bp")))


def source_reputation(df: DataFrame, min_docs: int = 3,
                      quality_floor: int = 2000,
                      bad_share_max_bp: int = 5000,
                      id_col: str = "doc_id", text_col: str = "text",
                      group_col: str = "source") -> DataFrame:
    """Domain-level reputation filter — the "URL/domain filtering"
    stage of C4 (Raffel et al. 2020 §2.2) and RefinedWeb (Penedo et
    al. 2023 §3.1), applied at the ``source``/host granularity: a
    domain whose documents are MOSTLY junk poisons even its
    above-floor pages (boilerplate farms, SEO spam), so the unit of
    the keep/drop decision is the domain, not the page.

    Per source: doc count, mean composite quality (floored int), and
    the basis-point share of docs under ``quality_floor``; verdict
    ``keep`` = enough docs to judge (``min_docs``) AND low-quality
    share ≤ ``bad_share_max_bp``.  All signals are the existing
    integer with_quality ratios — one codegen'd projection + one
    uniform-key agg (|sources| keys), no Python, no skew.  Compose
    with :func:`corpus source filter <source_filter>` for the kept
    docs."""
    q = with_quality(df, text_col)
    agg = (q.groupBy(group_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.floor(F.sum("quality_score") / F.count(F.lit(1)))
                .cast("long").alias("avg_quality"),
                F.floor(F.sum((F.col("quality_score") < quality_floor)
                              .cast("long")) * 10000
                        / F.count(F.lit(1)))
                .cast("long").alias("low_quality_share_bp")))
    return agg.withColumn(
        "keep", (F.col("n_docs") >= min_docs)
        & (F.col("low_quality_share_bp") <= bad_share_max_bp))


def source_filter(df: DataFrame, min_docs: int = 3,
                  quality_floor: int = 2000,
                  bad_share_max_bp: int = 5000,
                  id_col: str = "doc_id", text_col: str = "text",
                  group_col: str = "source") -> DataFrame:
    """Docs surviving the domain-reputation cut: semi-join against the
    kept sources (the reputation dim is |sources|-sized — broadcast at
    sane domain counts, plain shuffle join beyond)."""
    rep = source_reputation(df, min_docs, quality_floor,
                            bad_share_max_bp, id_col, text_col,
                            group_col)
    return df.join(rep.filter("keep").select(group_col), group_col,
                   "left_semi")


def grouped_split(df: DataFrame, group_col: str = "source",
                  bounds: tuple[tuple[str, str], ...] = (("val", "1999"),
                                                         ("test", "3332")),
                  out_col: str = "split") -> DataFrame:
    """Leakage-safe train/val/test assignment: the sampling coin is
    ``substr(md5(GROUP), 1, 4)`` — keyed on the group (source / host /
    domain), NOT the document — so every document from one group lands
    in the same split and near-duplicates within a site can never
    straddle train and validation (the contamination mode a doc-level
    coin like `corpus_sample_mix`'s cannot prevent).

    ``bounds`` = ordered (name, hex-upper-bound-exclusive) pairs over
    the 4-hex-char coin; anything past the last bound is ``train``.
    The defaults carve ≈9.8% val and ≈9.8% test.  Pure lexicographic
    hex compare → bit-identical in any engine, reproducible across
    runs and cluster sizes, zero-shuffle (one scan, codegen'd
    projection — splitting 100 TB costs exactly one pass)."""
    coin = F.substring(F.md5(F.col(group_col).cast("string")), 1, 4)
    expr = F.lit("train")
    for name, hi in reversed(bounds):
        expr = F.when(coin < hi, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def importance_weights(corpus: DataFrame, target: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       bucket_hex: int = 3) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every corpus document by how much its token distribution
    resembles a TARGET corpus relative to the raw corpus — the
    data-selection step that picks pre-training data to match a
    high-quality domain.

    Grams (unigrams + bigrams) hash into ``B = 16**bucket_hex``
    buckets keyed by the first ``bucket_hex`` hex chars of md5 — the
    digest string is identical in every engine, so the whole statistic
    is cross-engine exact.  Where the paper sums ``log(p_T/p_R)``
    (float log is the one step two engines can disagree on at the
    ulp), each bucket instead carries the integer rational likelihood
    ratio in basis points::

        w(b) = ((ct_T(b)+1) * (tot_R+B) * 10000)
               DIV ((ct_R(b)+1) * (tot_T+B))

    (add-one smoothing over the B buckets) and a document's score is
    the SUM of ``w`` over its gram occurrences — a monotone
    likelihood-ratio statistic with the same selection behaviour,
    reproducible bit-for-bit.  bigint is exact up to ~10^9-gram
    corpora at the default B; past that cast the two products to
    decimal(38,0) (same discipline as the components digest).

    Physical shape: one explode over the corpus → bucket-count agg
    (≤B distinct keys, map-side partials absorb everything), the same
    over the target; the two ≤B-row count tables meet the scoring join
    as a broadcast dim, and the per-doc score is one agg on doc_id.
    At 100 TB the corpus is scanned exactly twice (once for ct_R, once
    to score) and the weight dim never exceeds B rows — nothing scales
    with corpus size except the two linear passes.

    Returns ``(doc_id, n_grams, imp_sum, imp_avg_bp)``; 10000 bp =
    "this doc's grams are distribution-neutral", higher = target-like.
    """
    n_buckets = 16 ** bucket_hex

    def grams(df: DataFrame) -> DataFrame:
        toks = df.select(F.col(id_col).alias("doc_id"),
                         F.split(F.col(text_col), " ").alias("t"))
        uni = toks.select("doc_id", F.explode("t").alias("g"))
        bi = toks.select("doc_id", F.explode(F.expr(_BIGRAMS)).alias("g"))
        return (uni.unionByName(bi)
                .withColumn("b", F.substring(F.md5(F.col("g")), 1,
                                             bucket_hex)))

    def bucket_counts(g: DataFrame, out: str) -> DataFrame:
        return g.groupBy("b").agg(F.count("*").cast("long").alias(out))

    corpus_grams = grams(corpus)
    ct_r = bucket_counts(corpus_grams, "ct_r")
    ct_t = bucket_counts(grams(target), "ct_t")
    tot_r = ct_r.agg(F.sum("ct_r").alias("tot_r"))
    tot_t = ct_t.agg(F.coalesce(F.sum("ct_t"), F.lit(0)).alias("tot_t"))

    weights = (ct_r
               .join(ct_t, "b", "left")
               .crossJoin(F.broadcast(tot_r))
               .crossJoin(F.broadcast(tot_t))
               .select("b", F.expr(
                   f"((coalesce(ct_t, 0) + 1) * (tot_r + {n_buckets})"
                   f" * 10000) div ((ct_r + 1) * (tot_t + {n_buckets}))")
                   .cast("long").alias("w")))

    return (corpus_grams
            .join(F.broadcast(weights), "b")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_grams"),
                 F.sum("w").cast("long").alias("imp_sum"))
            .select("doc_id", "n_grams", "imp_sum",
                    F.expr("imp_sum div n_grams").cast("long")
                    .alias("imp_avg_bp")))


def perplexity_buckets(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       bucket_hex: int = 3) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under a unigram model of the corpus itself and
    split the corpus into ``head`` / ``middle`` / ``tail`` terciles —
    the standard quality gate where head feeds pre-training directly,
    middle is kept with caveats, and tail is dropped or re-filtered.

    Where CCNet scores with a KenLM log-perplexity (float logs — the
    one step two engines disagree on at the ulp), each token instead
    carries its integer unigram probability in ppb::

        w(b) = ct(b) * 10^9 div N_total

    over ``B = 16**bucket_hex`` hashed token buckets (md5-prefix — the
    digest string is identical in every engine), and a document's
    score is ``avg_like_ppb = Σ w div n_tokens`` — a monotone inverse
    of unigram perplexity, so the tercile split selects the same
    documents while reproducing bit-for-bit.  bigint is exact up to
    ~10^13-token corpora; past that cast the ``ct * 10^9`` product to
    decimal(38,0) (same discipline as the importance weights).

    Tercile thresholds derive from a bounded HISTOGRAM, not a global
    sort: scores bin at 10^3-ppb granularity (≤ 10^6 bins at any
    corpus size — the bound comes from the ppb value range, not the
    row count), the desc-cumulative runs over that dim only, and a
    bin straddling a boundary goes wholly to the higher bucket —
    deterministic, and the corpus-sized frames never see a
    single-partition exchange.  Physical shape: one explode scan →
    ≤B-row model dim (map-side partials) → broadcast score join →
    per-doc agg → bounded histogram; the corpus is scanned twice
    (model, score) regardless of scale.

    Returns ``(doc_id, n_tokens, avg_like_ppb, ppx_bucket)``.
    """
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(F.split(F.col(text_col), " ")).alias("g"))
            .withColumn("b", F.substring(F.md5(F.col("g")), 1, bucket_hex))
            .drop("g"))
    model = toks.groupBy("b").agg(F.count("*").cast("long").alias("ct"))
    tot = model.agg(F.sum("ct").cast("long").alias("n_total"))
    w = (model.crossJoin(F.broadcast(tot))
         .select("b", F.expr("ct * 1000000000 div n_total")
                 .cast("long").alias("w")))
    scores = (toks.join(F.broadcast(w), "b")
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_tokens"),
                   F.sum("w").cast("long").alias("like_sum"))
              .select("doc_id", "n_tokens",
                      F.expr("like_sum div n_tokens").cast("long")
                      .alias("avg_like_ppb"))
              .withColumn("sbin", F.expr("avg_like_ppb div 1000")))
    hist = scores.groupBy("sbin").agg(F.count("*").cast("long")
                                      .alias("cnt"))
    n = hist.agg(F.sum("cnt").cast("long").alias("n_docs"))
    from pyspark.sql import Window
    wdw = (Window.orderBy(F.col("sbin").desc())
           .rowsBetween(Window.unboundedPreceding, -1))
    bkt = (hist.withColumn("cum_excl",
                           F.coalesce(F.sum("cnt").over(wdw), F.lit(0)))
           .crossJoin(F.broadcast(n))
           .select("sbin",
                   F.when(F.col("cum_excl")
                          < F.expr("(n_docs + 2) div 3"), "head")
                   .when(F.col("cum_excl")
                         < F.expr("(2 * n_docs + 2) div 3"), "middle")
                   .otherwise("tail").alias("ppx_bucket")))
    return (scores.join(F.broadcast(bkt), "sbin")
            .select("doc_id", "n_tokens", "avg_like_ppb", "ppx_bucket"))


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_docs: int = 2) -> DataFrame:
    """Corpus-level duplicated-line removal (the RefinedWeb / CCNet
    boilerplate pass): a line whose trimmed md5 occurs in at least
    ``min_docs`` DISTINCT documents is dropped from EVERY document;
    surviving lines are reassembled in original order.  Returns
    ``(doc_id, n_lines, n_kept, clean_text)`` — one row per input doc,
    ``clean_text = ''`` when everything was boilerplate.

    Physical shape: posexplode lines → distinct-doc count per line
    hash → anti-join → fold per doc.  The line-hash key is where web
    boilerplate skews hard ('| privacy policy |' in 10^8 docs), which
    is why the count is an aggregation (map-side partials absorb the
    hot keys) and the removal is an anti-join against the SMALL
    boilerplate set (AQE broadcasts it when it fits) — never a join
    against the raw line table.  Reassembly shuffles on doc_id,
    uniform by construction.
    """
    lines = (df.select(F.col(id_col).alias("doc_id"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("pos", "line"))
             .withColumn("lh", F.md5(F.trim(F.col("line")))))
    boiler = (lines.groupBy("lh")
              .agg(F.countDistinct("doc_id").alias("nd"))
              .filter(F.col("nd") >= min_docs)
              .select("lh"))
    kept = lines.join(boiler, "lh", "left_anti")
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    folded = (kept.groupBy("doc_id")
              .agg(F.count("*").alias("n_kept"),
                   F.concat_ws(
                       "\n",
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("pos", "line"))),
                           lambda s: s["line"])).alias("clean_text")))
    return (totals.join(folded, "doc_id", "left")
            .select("doc_id",
                    F.col("n_lines").cast("long").alias("n_lines"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("clean_text", F.lit(""))
                    .alias("clean_text")))


def lang_temperature_mix(df: DataFrame, lang_col: str = "lang",
                         id_col: str = "doc_id") -> DataFrame:
    """Temperature-based language rebalancing (the mC4 / XLM-R
    multilingual sampling step) at α = 0.5: each language's keep rate
    is ``sqrt(n_lang / n_max)`` — head languages are downsampled
    toward the tail so the training mix is not 80% English just
    because the crawl is.  Unlike the fixed-rate quality mix
    (``corpus_sample_mix``), the rates are DERIVED from the observed
    distribution in-plan.

    α = 0.5 is the drift-free choice: IEEE-754 requires sqrt (and /,
    ×, floor) to be correctly rounded, so the data-derived rates are
    bit-identical in any engine — a general α needs ``pow()``, whose
    last-ulp behavior is libm-specific and could flip a floor()
    boundary between Spark and an oracle.

    The keep coin is the first 24 bits of ``md5(doc_id)`` compared
    against the rate scaled to 2^24 (hex-string lexicographic compare,
    the same engine-portable trick as ``grouped_split``); the
    full-rate language keeps everything explicitly (its threshold
    needs 25 bits).  → ``(id, lang, n_lang, rate_ppm, keep)``.

    Physical shape: one uniform-key lang count (a tiny dim at any
    corpus size — languages, not documents), a 1-row max joined onto
    it, then one broadcast join back to the scan: sampling 100 TB
    costs one pass plus a ~200-row dim.
    """
    counts = (df.groupBy(F.col(lang_col).alias("lang"))
              .agg(F.count(F.lit(1)).cast("long").alias("n_lang")))
    mx = counts.agg(F.max("n_lang").alias("n_max"))
    frac = F.sqrt(F.col("n_lang").cast("double") / F.col("n_max"))
    rates = (counts.crossJoin(F.broadcast(mx))
             .withColumn("t24",
                         F.floor(frac * (1 << 24)).cast("long"))
             .withColumn("rate_ppm",
                         F.floor(frac * 1000000).cast("long")))
    coin = F.substring(F.md5(F.col(id_col).cast("string")), 1, 6)
    thr = F.lower(F.lpad(F.hex(F.col("t24")), 6, "0"))
    return (df.select(id_col, F.col(lang_col).alias("lang"))
            .join(F.broadcast(rates.select("lang", "n_lang",
                                           "rate_ppm", "t24")), "lang")
            .select(id_col, "lang", "n_lang", "rate_ppm",
                    ((F.col("t24") >= (1 << 24)) | (coin < thr))
                    .alias("keep")))


def host_boilerplate(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", group_col: str = "source",
                     min_frac_bp: int = 5000,
                     min_docs: int = 2) -> DataFrame:
    """HOST-scoped boilerplate removal — the site-template pass
    (trafilatura / Pomikálek "justext" family, distributed): a line is
    boilerplate for a given ``group_col`` (host / source) when it
    appears in at least ``min_frac_bp``/10000 of THAT group's
    documents (and in ≥ ``min_docs`` of them) — nav bars, cookie
    banners, footers repeat across one site's pages, not across the
    corpus, which is exactly what :func:`line_dedup`'s corpus-wide
    rule cannot express without also deleting legitimately-quoted
    text between unrelated sites.  Thresholding is integer basis
    points (``nd * 10000 >= min_frac_bp * group_docs``) so any SQL
    engine reproduces the verdict bit-for-bit.

    Returns ``(doc_id, n_lines, n_kept, boiler_bp, clean_text)`` —
    ``boiler_bp`` = dropped-line share of the doc in basis points.

    Physical shape: one posexplode scan → per-(group, line-hash)
    distinct-doc agg (map-side partials absorb the hot template
    lines) joined to the tiny per-group doc-count dim (broadcast) →
    the per-group boilerplate set anti-joins the line table on
    (group, lh) — a key that CANNOT collide across sites, so one
    mega-site's templates never fan out to other groups' partitions.
    Reassembly shuffles on doc_id, uniform by construction.
    """
    lines = (df.select(F.col(id_col).alias("doc_id"),
                       F.col(group_col).alias("grp"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("pos", "line"))
             .withColumn("lh", F.md5(F.trim(F.col("line")))))
    group_docs = (df.groupBy(F.col(group_col).alias("grp"))
                  .agg(F.countDistinct(id_col).alias("g_docs")))
    boiler = (lines.groupBy("grp", "lh")
              .agg(F.countDistinct("doc_id").alias("nd"))
              .join(F.broadcast(group_docs), "grp")
              .filter((F.col("nd") >= min_docs) &
                      (F.col("nd") * 10000 >=
                       F.lit(min_frac_bp) * F.col("g_docs")))
              .select("grp", "lh"))
    kept = lines.join(boiler, ["grp", "lh"], "left_anti")
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    folded = (kept.groupBy("doc_id")
              .agg(F.count("*").alias("n_kept"),
                   F.concat_ws(
                       "\n",
                       F.transform(
                           F.array_sort(F.collect_list(
                               F.struct("pos", "line"))),
                           lambda s: s["line"])).alias("clean_text")))
    return (totals.join(folded, "doc_id", "left")
            .select("doc_id",
                    F.col("n_lines").cast("long").alias("n_lines"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.expr("(n_lines - coalesce(n_kept, 0)) * 10000"
                           " div n_lines").cast("long")
                    .alias("boiler_bp"),
                    F.coalesce("clean_text", F.lit(""))
                    .alias("clean_text")))


SMALL_PACK_THRESHOLD = 200_000


def pack_sequences(df: DataFrame, budget: int, id_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   num_partitions: int | None = None,
                   small_hint: int | None = None) -> DataFrame:
    """Training-sequence packing: concatenate the corpus token stream
    in ``id_col`` order and cut it every ``budget`` tokens (the
    GPT-style packed-batch layout).  Per document:

    * ``pack_id``          — pack its first token lands in
    * ``offset_in_pack``   — its start offset inside that pack
    * ``n_packs_spanned``  — packs it touches (1 = no boundary cross)

    Everything derives from the EXCLUSIVE prefix sum of token counts.
    A global ``sum() over (order by id)`` window collapses to one
    partition — a non-starter at 10^10 docs — so past ``small_hint``
    the sum runs as the weighted analog of
    :func:`web_graph_spark.operators.frontier.ordered_seq`:
    range-partition by id, per-partition token totals (a tiny
    driver-side array; the persist pins the sampled range boundaries so
    both passes see identical partitioning), then ``offset +
    local running sum`` assigned in ``mapInPandas`` — fully parallel
    and deterministic.  Small corpora take the one-window plan (a
    single tiny partition IS the right plan there); both paths produce
    identical packs (pinned by test).
    """
    d = df.select(F.col(id_col).alias("__id"),
                  F.col(tokens_col).cast("long").alias("n_tokens"))
    cached = None
    if small_hint is not None and small_hint <= SMALL_PACK_THRESHOLD:
        from pyspark.sql import Window

        w = (Window.orderBy("__id")
             .rowsBetween(Window.unboundedPreceding, -1))
        body = d.withColumn("__off",
                            F.coalesce(F.sum("n_tokens").over(w),
                                       F.lit(0)))
    else:
        from typing import Iterator

        import pandas as pd

        if num_partitions is None:
            num_partitions = int(d.sparkSession.conf.get(
                "spark.sql.shuffle.partitions"))
        parted = (d.repartitionByRange(num_partitions, "__id")
                  .sortWithinPartitions("__id")
                  .withColumn("__pid", F.spark_partition_id())
                  .persist())
        sums = {r["__pid"]: r["s"] for r in
                parted.groupBy("__pid")
                .agg(F.sum("n_tokens").alias("s")).collect()}
        offsets, acc = {}, 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += int(sums[pid])

        schema = parted.drop("__pid").schema.add("__off", "long")
        cols = [f.name for f in schema.fields]

        def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local = 0
            for pdf in it:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["__pid"].iloc[0])
                out = pdf.drop(columns="__pid")
                out["__off"] = (offsets[pid] + local
                                + (pdf["n_tokens"].cumsum()
                                   - pdf["n_tokens"]))
                local += int(pdf["n_tokens"].sum())
                yield out[cols]

        body = parted.mapInPandas(assign, schema=schema)
        cached = parted
    b = int(budget)
    # integer DIV keeps the arithmetic exact at any corpus size (no
    # double-precision detour past 2^53 tokens)
    last = f"(__off + greatest(n_tokens, 1L) - 1L)"
    out = body.select(
        F.col("__id").alias(id_col), "n_tokens",
        F.expr(f"__off DIV {b}").cast("long").alias("pack_id"),
        (F.col("__off") % F.lit(b)).cast("long").alias("offset_in_pack"),
        F.expr(f"{last} DIV {b} - __off DIV {b} + 1L").cast("long")
        .alias("n_packs_spanned"))
    if cached is not None:
        out._wgs_cached_parent = cached  # frontier.release-compatible
    return out


# PII scrubbing rules: (name, pattern, replacement).  Patterns are
# deliberately restricted to the Java-regex ∩ RE2 common subset (no
# backreferences / lookaround) with identical leftmost-first match
# semantics, so the Spark pass and the DuckDB oracle redact
# byte-identically.  Order matters (applied sequentially): an address
# inside an already-redacted span is never double-counted — both
# engines apply the same order.
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d ()-]{7,}\d", "<PHONE>"),
)


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the privacy pass every production
    training corpus runs before release (e.g. the email/IP/phone regex
    family in Dolma / RefinedWeb / CCNet pipelines).

    Per document: ``n_email`` / ``n_ipv4`` / ``n_phone`` match counts
    (on the original text), ``clean_len`` and ``clean_hash`` of the
    redacted text (hash, not the text itself, so the contract result
    stays narrow).  Entirely JVM ``regexp_count`` / ``regexp_replace``
    inside one codegen'd projection: zero shuffles, zero Python — at
    100 TB this is a single pass at scan speed, embarrassingly
    parallel."""
    t = F.col(text_col)
    counts = [F.regexp_count(t, F.lit(p)).cast("long").alias(f"n_{name}")
              for name, p, _ in PII_RULES]
    clean = t
    for _, p, repl in PII_RULES:
        clean = F.regexp_replace(clean, p, repl)
    return df.select(
        F.col(id_col), *counts,
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_hash"))


# tf-idf scoring scale: idf_t = (N * TFIDF_SCALE) div (df_t + 1) —
# integer floor division, exact in any engine at any corpus size (no
# float logs to drift across platforms; the div-based idf preserves the
# rare-term-wins ordering that matters for retrieval).
TFIDF_SCALE = 1_000_000


def tfidf_topk(df: DataFrame, terms: tuple[str, ...], k: int = 20,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic tf-idf top-k keyword search over the corpus —
    the retrieval primitive behind corpus exploration / targeted
    subset extraction ("find the k docs most about X").

    score(d) = Σ_t tf_t(d) · ((N · SCALE) div (df_t + 1)), all-integer.

    Physical shape (the 100 TB plan): tf columns are word-boundary
    ``regexp_count`` in one codegen'd scan; the df/N statistics are ONE
    tiny single-row aggregate broadcast back over the scored rows; the
    top-k cut is ``orderBy().limit(k)`` — Spark plans TakeOrdered, a
    map-side per-partition heap + driver merge of k·P rows, never a
    global sort.  Ranks are then assigned over exactly k rows."""
    from pyspark.sql import Window

    low = F.lower(F.col(text_col))
    tf_cols = [F.regexp_count(low, F.lit(rf"\b{t}\b")).cast("long")
               .alias(f"tf_{t}") for t in terms]
    tf = df.select(F.col(id_col), *tf_cols)
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
          for t in terms])
    scored = tf.crossJoin(F.broadcast(stats))
    score = None
    for t in terms:
        c = F.expr(f"tf_{t} * ((n_docs * {TFIDF_SCALE}L) div (df_{t} + 1L))")
        score = c if score is None else score + c
    scored = (scored.withColumn("score", score.cast("long"))
              .filter(F.col("score") > 0))
    top = scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", id_col, "score",
                    *[f"tf_{t}" for t in terms]))


# Gopher/MassiveText document-quality rules (Rae et al. 2021, table A1
# — a public filter set distinct from with_quality's composite score):
# hard per-document pass/fail gates, each rendered as exact integer
# ratios (bp / x100 fixed-point, floor division) so the DuckDB oracle
# agrees bit-for-bit.  Thresholds are the paper's.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_WORDLEN_X100 = 300      # mean word length ≥ 3 chars
GOPHER_MAX_WORDLEN_X100 = 1_000    # ≤ 10 chars
GOPHER_MAX_SYMBOL_BP = 1_000       # (# + …) per word ≤ 0.1
GOPHER_MAX_BULLET_BP = 9_000       # < 90% of lines bullet-led
GOPHER_MAX_ELLIPSIS_BP = 3_000     # < 30% of lines …-terminated
GOPHER_MIN_ALPHA_BP = 8_000        # ≥ 80% words contain a letter
GOPHER_MIN_STOP_KINDS = 2          # ≥ 2 distinct stopwords present

_BULLET_LINE = r"(?:^|\n)[ \t]*[-*•]"
_ELLIPSIS_LINE = r"\.\.\.(?:\n|$)"
_ALPHA_WORD = r"[^\s]*[A-Za-z][^\s]*"


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document Gopher rule evaluation: every gate as a visible
    integer column plus its boolean flag, `passes` = AND of all gates
    — the form a curation pipeline wants (audit WHY a doc dropped,
    not just that it did).

    100 TB shape: a single codegen'd projection — every count is a
    JVM ``regexp_count`` over the text column, no shuffle, no Python;
    filters compose downstream as a plain ``WHERE passes``."""
    t = F.col(text_col)
    n_words = token_count(t).cast("long")
    n_nonspace = (F.length(t) - F.regexp_count(t, F.lit(r"\s"))).cast("long")
    n_lines = (F.regexp_count(t, F.lit(r"\n")) + 1).cast("long")
    n_bullet = F.regexp_count(t, F.lit(_BULLET_LINE)).cast("long")
    n_ellipsis = F.regexp_count(t, F.lit(_ELLIPSIS_LINE)).cast("long")
    n_symbol = (F.regexp_count(t, F.lit(r"#"))
                + F.regexp_count(t, F.lit(r"\.\.\."))).cast("long")
    n_alpha = F.regexp_count(t, F.lit(_ALPHA_WORD)).cast("long")
    n_stop = sum(((F.regexp_count(F.lower(t), F.lit(rf"\b{w}\b")) > 0)
                  .cast("long") for w in STOPWORDS), F.lit(0)).cast("long")

    base = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_nonspace.alias("n_nonspace"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet"),
        n_ellipsis.alias("n_ellipsis"),
        n_symbol.alias("n_symbol"),
        n_alpha.alias("n_alpha"),
        n_stop.alias("n_stop_kinds"))
    e = F.expr
    scored = base.select(
        id_col, "n_words", "n_stop_kinds",
        e("(n_nonspace * 100) div greatest(n_words, 1)")
        .alias("mean_wordlen_x100"),
        e("(n_symbol * 10000) div greatest(n_words, 1)")
        .alias("symbol_ratio_bp"),
        e("(n_bullet * 10000) div n_lines").alias("bullet_line_bp"),
        e("(n_ellipsis * 10000) div n_lines").alias("ellipsis_line_bp"),
        e("(n_alpha * 10000) div greatest(n_words, 1)")
        .alias("alpha_word_bp"))
    flags = {
        "ok_words": f"n_words BETWEEN {GOPHER_MIN_WORDS} "
                    f"AND {GOPHER_MAX_WORDS}",
        "ok_wordlen": f"mean_wordlen_x100 BETWEEN {GOPHER_MIN_WORDLEN_X100} "
                      f"AND {GOPHER_MAX_WORDLEN_X100}",
        "ok_symbol": f"symbol_ratio_bp <= {GOPHER_MAX_SYMBOL_BP}",
        "ok_bullet": f"bullet_line_bp < {GOPHER_MAX_BULLET_BP}",
        "ok_ellipsis": f"ellipsis_line_bp < {GOPHER_MAX_ELLIPSIS_BP}",
        "ok_alpha": f"alpha_word_bp >= {GOPHER_MIN_ALPHA_BP}",
        "ok_stop": f"n_stop_kinds >= {GOPHER_MIN_STOP_KINDS}",
    }
    for name, cond in flags.items():
        scored = scored.withColumn(name, e(cond))
    return scored.withColumn(
        "passes", e(" AND ".join(flags)))


# BM25 with k1 = 1.2, b = 0.75 rendered as EXACT integer arithmetic.
# The per-term saturation tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
# with avgdl = T/N clears all fractions when multiplied by 10·T:
#     (22·T·tf) / (10·T·tf + 3·T + 9·dl·N)
# — numerator and denominator are plain int64 products, so Spark `div`
# and DuckDB `//` agree bit-for-bit.  idf keeps tfidf_topk's log-free
# monotone form (N·SCALE) div (df+1).  int64 headroom: the largest
# intermediate is 22·T·tf·BM25_SCALE ≈ 2e16 at sf0.1 (T≈1e7, tf≤1e2);
# a true 100 TB corpus (T≈1e12) promotes these four products to
# decimal(38,0) — same expressions, wider type.
BM25_SCALE = 1_000_000      # saturation fixed-point scale
BM25_IDF_SCALE = 10_000     # idf scale (kept small: the two multiply)


def bm25_topk(df: DataFrame, terms: tuple[str, ...], k: int = 20,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic BM25 top-k retrieval (Robertson/Sparck-Jones as
    popularized by Lucene defaults k1=1.2, b=0.75) — unlike tf-idf it
    saturates repeated terms and normalizes by document length, the
    ranking an LLM-corpus curation pass actually wants for "the k docs
    most about X" extraction.

    score(d) = Σ_t idf_t · ((22·T·tf·S) div (10·T·tf + 3·T + 9·dl·N))

    all-integer (see module comment), so the DuckDB oracle reproduces
    the ranking bit-for-bit.  Physical shape — identical to
    :func:`tfidf_topk`, the 100 TB plan: tf and dl come from ONE
    codegen'd scan (word-boundary ``regexp_count``); N/T/df_t are ONE
    single-row aggregate broadcast back over the scored rows; the
    top-k cut is TakeOrdered (map-side per-partition heap, k·P driver
    merge), never a global sort."""
    from pyspark.sql import Window

    low = F.lower(F.col(text_col))
    tf_cols = [F.regexp_count(low, F.lit(rf"\b{t}\b")).cast("long")
               .alias(f"tf_{t}") for t in terms]
    tf = df.select(F.col(id_col), *tf_cols,
                   token_count(F.col(text_col)).cast("long").alias("dl"))
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
          for t in terms])
    scored = tf.crossJoin(F.broadcast(stats))
    score = None
    for t in terms:
        c = F.expr(
            f"((n_docs * {BM25_IDF_SCALE}L) div (df_{t} + 1L)) * "
            f"((22L * total_len * tf_{t} * {BM25_SCALE}L) div "
            f"(10L * total_len * tf_{t} + 3L * total_len + 9L * dl * n_docs))")
        score = c if score is None else score + c
    scored = (scored.withColumn("score", score.cast("long"))
              .filter(F.col("score") > 0))
    top = scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", id_col, "score", "dl",
                    *[f"tf_{t}" for t in terms]))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL mirrors (generated from the same constants so the
# two dialects cannot drift)
# ---------------------------------------------------------------------------

def count_sql(expr: str, pattern: str) -> str:
    """DuckDB mirror of F.regexp_count."""
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


def normalize_sql(expr: str = "text") -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def stopword_count_sql(expr: str = "text") -> str:
    return " + ".join(count_sql(f"lower({expr})", rf"\b{w}\b")
                      for w in STOPWORDS)


def lang_scores_sql(expr: str = "text") -> dict[str, str]:
    s = {lang: "(" + " + ".join(count_sql(f"lower({expr})", rf"\b{m}\b")
                                for m in ms) + ")"
         for lang, ms in LANG_MARKERS.items()}
    s["zh"] = f"(3 * {count_sql(expr, '[一-鿿]')})"
    return s


def pii_scrub_sql(expr: str = "text") -> dict[str, str]:
    """DuckDB mirrors of pii_scrub, generated from PII_RULES: count
    expressions per rule plus the sequentially-redacted text."""
    out = {f"n_{name}": f"CAST({count_sql(expr, pat)} AS BIGINT)"
           for name, pat, _ in PII_RULES}
    clean = expr
    for _, pat, repl in PII_RULES:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    out["clean"] = clean
    return out


def tfidf_sql(terms: tuple[str, ...], k: int = 20,
              id_col: str = "doc_id", expr: str = "text",
              table: str = "documents") -> str:
    """DuckDB mirror of tfidf_topk (same integer idf arithmetic)."""
    def _tf(t: str) -> str:
        pat = "\\b" + t + "\\b"
        return (f"CAST({count_sql(f'lower({expr})', pat)} AS BIGINT)"
                f" AS tf_{t}")

    tf_cols = ",\n    ".join(_tf(t) for t in terms)
    df_cols = ",\n    ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in terms)
    score = " + ".join(
        f"tf_{t} * ((n_docs * {TFIDF_SCALE}) // (df_{t} + 1))"
        for t in terms)
    tf_out = ", ".join(f"tf_{t}" for t in terms)
    return f"""
WITH tf AS (
  SELECT {id_col},
    {tf_cols}
  FROM {table}
),
d AS (
  SELECT count(*) AS n_docs,
    {df_cols}
  FROM tf
),
s AS (
  SELECT tf.{id_col}, CAST({score} AS BIGINT) AS score, {tf_out}
  FROM tf, d
),
r AS (
  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, {id_col})
                 AS INTEGER) AS rank
  FROM s WHERE score > 0
)
SELECT rank, {id_col}, score, {tf_out} FROM r WHERE rank <= {k}"""


def gopher_sql(expr: str = "text", id_col: str = "doc_id",
               table: str = "documents") -> str:
    """DuckDB mirror of gopher_rules (same integer gates, same regex
    counts via RE2 — non-overlapping scan semantics match Java's for
    every pattern used here)."""
    stop_kinds = " + ".join(
        "(CASE WHEN " + count_sql(f"lower({expr})", rf"\b{w}\b")
        + " > 0 THEN 1 ELSE 0 END)" for w in STOPWORDS)
    c_words = count_sql(expr, r"[^\s]+")
    c_space = count_sql(expr, r"\s")
    c_nl = count_sql(expr, r"\n")
    c_bullet = count_sql(expr, _BULLET_LINE)
    c_ellipsis = count_sql(expr, _ELLIPSIS_LINE)
    c_hash = count_sql(expr, "#")
    c_dots = count_sql(expr, r"\.\.\.")
    c_alpha = count_sql(expr, _ALPHA_WORD)
    counts = f"""
  SELECT {id_col},
    CAST({c_words} AS BIGINT) AS n_words,
    CAST(length({expr}) - {c_space} AS BIGINT) AS n_nonspace,
    CAST({c_nl} + 1 AS BIGINT) AS n_lines,
    CAST({c_bullet} AS BIGINT) AS n_bullet,
    CAST({c_ellipsis} AS BIGINT) AS n_ellipsis,
    CAST({c_hash} + {c_dots} AS BIGINT) AS n_symbol,
    CAST({c_alpha} AS BIGINT) AS n_alpha,
    CAST({stop_kinds} AS BIGINT) AS n_stop_kinds
  FROM {table}"""
    return f"""
WITH c AS ({counts}),
s AS (
  SELECT {id_col}, n_words, n_stop_kinds,
    (n_nonspace * 100) // greatest(n_words, 1) AS mean_wordlen_x100,
    (n_symbol * 10000) // greatest(n_words, 1) AS symbol_ratio_bp,
    (n_bullet * 10000) // n_lines AS bullet_line_bp,
    (n_ellipsis * 10000) // n_lines AS ellipsis_line_bp,
    (n_alpha * 10000) // greatest(n_words, 1) AS alpha_word_bp
  FROM c
)
SELECT *,
  n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS ok_words,
  mean_wordlen_x100 BETWEEN {GOPHER_MIN_WORDLEN_X100}
    AND {GOPHER_MAX_WORDLEN_X100} AS ok_wordlen,
  symbol_ratio_bp <= {GOPHER_MAX_SYMBOL_BP} AS ok_symbol,
  bullet_line_bp < {GOPHER_MAX_BULLET_BP} AS ok_bullet,
  ellipsis_line_bp < {GOPHER_MAX_ELLIPSIS_BP} AS ok_ellipsis,
  alpha_word_bp >= {GOPHER_MIN_ALPHA_BP} AS ok_alpha,
  n_stop_kinds >= {GOPHER_MIN_STOP_KINDS} AS ok_stop,
  (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
    AND (mean_wordlen_x100 BETWEEN {GOPHER_MIN_WORDLEN_X100}
         AND {GOPHER_MAX_WORDLEN_X100})
    AND symbol_ratio_bp <= {GOPHER_MAX_SYMBOL_BP}
    AND bullet_line_bp < {GOPHER_MAX_BULLET_BP}
    AND ellipsis_line_bp < {GOPHER_MAX_ELLIPSIS_BP}
    AND alpha_word_bp >= {GOPHER_MIN_ALPHA_BP}
    AND n_stop_kinds >= {GOPHER_MIN_STOP_KINDS} AS passes
FROM s"""


def bm25_sql(terms: tuple[str, ...], k: int = 20,
             id_col: str = "doc_id", expr: str = "text",
             table: str = "documents") -> str:
    """DuckDB mirror of bm25_topk (same integer k1/b arithmetic)."""
    def _tf(t: str) -> str:
        pat = "\\b" + t + "\\b"
        return (f"CAST({count_sql(f'lower({expr})', pat)} AS BIGINT)"
                f" AS tf_{t}")

    tf_cols = ",\n    ".join(_tf(t) for t in terms)
    df_cols = ",\n    ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in terms)
    score = " + ".join(
        f"((n_docs * {BM25_IDF_SCALE}) // (df_{t} + 1)) * "
        f"((22 * total_len * tf_{t} * {BM25_SCALE}) // "
        f"(10 * total_len * tf_{t} + 3 * total_len + 9 * dl * n_docs))"
        for t in terms)
    tf_out = ", ".join(f"tf_{t}" for t in terms)
    dl_sql = count_sql(expr, r"\S+")
    return f"""
WITH tf AS (
  SELECT {id_col},
    {tf_cols},
    CAST({dl_sql} AS BIGINT) AS dl
  FROM {table}
),
d AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_len,
    {df_cols}
  FROM tf
),
s AS (
  SELECT tf.{id_col}, CAST({score} AS BIGINT) AS score, dl, {tf_out}
  FROM tf, d
),
r AS (
  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, {id_col})
                 AS INTEGER) AS rank
  FROM s WHERE score > 0
)
SELECT rank, {id_col}, score, dl, {tf_out} FROM r WHERE rank <= {k}"""


def lang_guess_sql(expr: str = "text") -> str:
    """CASE chain mirroring with_lang_guess (argmax, alphabetical ties)."""
    s = lang_scores_sql(expr)
    langs = sorted(s)
    whens = []
    for lang in langs:
        conds = []
        for other in langs:
            if other == lang:
                continue
            op = ">=" if other > lang else ">"
            conds.append(f"{s[lang]} {op} {s[other]}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " END"


def doc_positions(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """``(doc_id, pos, term)`` — the 0-based positional token stream
    every index/search operator consumes; one posexplode scan, empty
    tokens dropped with their positions preserved."""
    return (df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " "))
        .alias("pos", "term"))
        .filter(F.col("term") != ""))


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Positional inverted-index build — the search-engine (and
    phrase-dedup) core: per term, document frequency, total term
    frequency, and an md5 digest of the FULL positional postings list
    (``doc:pos,pos,...`` entries, lexicographically ordered) so the
    contract pins every position without shipping nested arrays.

    Returns ``(term, n_docs, n_occurrences, postings_digest)``.

    Scale shape: one corpus scan -> (term, doc) hash agg (map-side
    partials absorb stopword-hot terms: a hot term adds rows to
    partials, never keys, because doc_id disambiguates) -> term-level
    agg whose output is vocabulary-sized.  At deployment scale the
    per-doc postings rows themselves are the stored index, written
    partitioned by term hash; the digest projection here exists so an
    oracle can certify the build bit-for-bit."""
    t = doc_positions(df, id_col, text_col)
    per_doc = (t.groupBy("term", "doc_id")
               .agg(F.count("*").cast("long").alias("tf"),
                    F.array_join(F.sort_array(F.collect_list("pos")),
                                 ",").alias("plist")))
    entry = F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                     F.col("plist"))
    return (per_doc.groupBy("term")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("tf").cast("long").alias("n_occurrences"),
                 F.md5(F.array_join(
                     F.sort_array(F.collect_list(entry)), "|"))
                 .alias("postings_digest")))


def phrase_hits(df: DataFrame, phrase: tuple[str, ...],
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact-phrase search via positional-postings intersection — the
    query an inverted index exists to answer: docs where the phrase's
    terms occur at consecutive positions; returns ``(doc_id,
    n_matches)`` with one row per matching document and the number of
    distinct anchor positions.

    Each phrase term contributes one filtered slice of the token
    stream (predicate pushed to the scan); slices equi-join on
    ``(doc, anchor_pos)`` — position arithmetic keys the join, so
    candidate rows shrink at every step and the plan is |postings|-
    bounded, never |corpus|².  Over a stored index the same joins run
    on the term-partitioned postings table (term filters become
    partition pruning)."""
    if len(phrase) < 1:
        raise ValueError("phrase must have at least one term")
    t = doc_positions(df, id_col, text_col)
    cur = (t.filter(F.col("term") == phrase[0])
           .select("doc_id", F.col("pos").alias("p0")))
    for i, w in enumerate(phrase[1:], start=1):
        nxt = (t.filter(F.col("term") == w)
               .select("doc_id", (F.col("pos") - i).alias("p0")))
        cur = cur.join(nxt, ["doc_id", "p0"])
    return (cur.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_matches")))


def shuffle_shards(df: DataFrame, n_shards: int = 16,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Deterministic global shuffle + sharding for training output —
    the last step before a corpus ships to a trainer: every document
    gets a pseudo-random shard and a pseudo-random position within it,
    WITHOUT a global sort.  Shard = ``hex16(md5('shuf:' || doc)) mod
    n_shards`` (uniform, engine-independent); within-shard order is
    the md5 coin itself.  Returns the vocabulary of the write:
    ``(shard, n_docs, n_tokens, order_digest)`` where order_digest =
    md5 over the shard's doc ids in shuffled order — one row per
    shard, pinning the exact permutation.

    Scale shape: one scan + one hash agg keyed on shard; the per-shard
    ordered fold happens inside the aggregate (sort_array over the
    shard's collected (coin, doc) pairs).  Choose ``n_shards`` so a
    shard fits an executor (10^5 shards at 100 TB -> ~1 GB each);
    uniform hash keys mean no skew by construction.  The actual write
    is ``df.withColumn(shard).repartition(shard).sortWithinPartitions
    (coin)`` — same keys, no digest — this operator exists so the
    permutation is certifiable."""
    from web_graph_spark.operators.graph_algos import _hex16

    coin = F.md5(F.concat(F.lit("shuf:"), F.col(id_col).cast("string")))
    d = df.select(
        F.col(id_col).cast("string").alias("doc"),
        (_hex16(F.concat(F.lit("shuf:"), F.col(id_col).cast("string")))
         % n_shards).cast("int").alias("shard"),
        coin.alias("coin"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("nt"))
    pair = F.struct(F.col("coin"), F.col("doc"))
    return (d.groupBy("shard")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("nt").cast("long").alias("n_tokens"),
                 F.md5(F.array_join(
                     F.transform(F.sort_array(F.collect_list(pair)),
                                 lambda x: x["doc"]), ","))
                 .alias("order_digest")))


def cooccurrence_counts(df: DataFrame, window: int = 2,
                        min_pairs: int = 3,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """GloVe-style windowed co-occurrence statistics (Pennington et
    al. 2014) — the count matrix a count-based word embedding trains
    on: for every unordered word pair within ``window`` positions,
    the raw pair count and the distance-weighted GloVe mass
    ``Σ 1/d`` carried as exact integer ppm (1000000 div d — no float
    accumulation to drift between engines).

    Returns ``(w1, w2, n_pairs, weight_ppm)`` with ``w1 < w2``
    lexicographically and pairs below ``min_pairs`` dropped.

    Scale shape: ``window`` is a small constant, so the range join is
    unrolled into ``window`` exact equi-joins on ``(doc, pos + d)`` —
    each one hash-partitioned on the uniform (doc, pos) key, no
    range-join machinery, no position explosion; the pair agg's keys
    are Zipf-hot but map-side partials absorb repeats (same argument
    as the BPE pair counter).  One corpus scan feeds all d's."""
    t = doc_positions(df, id_col, text_col)
    pairs = None
    for d in range(1, window + 1):
        left = t.select("doc_id", F.col("pos").alias("p"),
                        F.col("term").alias("a"))
        right = t.select("doc_id", (F.col("pos") - d).alias("p"),
                         F.col("term").alias("b"))
        p = (left.join(right, ["doc_id", "p"])
             .select(F.least("a", "b").alias("w1"),
                     F.greatest("a", "b").alias("w2"),
                     F.lit(1000000 // d).cast("long").alias("wppm")))
        pairs = p if pairs is None else pairs.unionByName(p)
    return (pairs.groupBy("w1", "w2")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.sum("wppm").cast("long").alias("weight_ppm"))
            .filter(F.col("n_pairs") >= min_pairs))


def keyphrases(df: DataFrame, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-document keyphrase extraction: top-k bigrams by integer
    tf·idf — the metadata-enrichment pass (doc tagging, cluster
    labeling, dataset cards) run after curation.  Bigrams touching a
    stopword are dropped (the classic RAKE-style delimiter rule);
    idf is E36's log-free ``(N·10^6) div (df+1)``; ties break on the
    bigram string ascending so ranks are total.

    Scale shape: bigrams come from the SAME posexplode stream the
    inverted index uses — adjacent positions pair via one shifted
    equi-join on (doc, pos+1), uniform keys (doc_id disambiguates hot
    terms).  Per-doc tf and corpus df are two hash aggs; df joins
    back onto per-doc rows keyed by bigram (skew-safe: the stopword
    rule already removed the hottest bigrams; map-side combine
    absorbed the rest); the per-doc top-k is a doc-keyed window —
    partitioned, never global.

    Returns ``(doc_id, rank, bigram, tf, df, score)``."""
    from pyspark.sql import Window

    toks = doc_positions(df, id_col, text_col)
    nxt = toks.select("doc_id", (F.col("pos") - 1).alias("pos"),
                      F.col("term").alias("term2"))
    grams = (toks.join(nxt, ["doc_id", "pos"])
             .filter(~F.col("term").isin(*STOPWORDS)
                     & ~F.col("term2").isin(*STOPWORDS))
             .select("doc_id", F.concat_ws(" ", "term", "term2")
                     .alias("bigram")))
    tf = grams.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("bigram").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfreq, "bigram")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("score", F.expr(
                  f"tf * ((n_docs * {TFIDF_SCALE}L) div (df + 1L))")
                  .cast("long")))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("bigram"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "bigram", "tf", "df", "score"))


def keyphrases_sql(k: int = 3, id_col: str = "doc_id",
                   expr: str = "text", table: str = "documents") -> str:
    """DuckDB mirror of keyphrases (bigrams via the positions CTE +
    pos+1 self-join, same stopword rule and integer idf)."""
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, u.pos AS pos, u.term AS term FROM (
    SELECT {id_col}, unnest(list_transform(range(1, len(l) + 1),
           i -> {{'pos': i - 1, 'term': l[i]}})) AS u
    FROM (SELECT {id_col}, string_split({expr}, ' ') AS l FROM {table}))
  WHERE u.term <> ''
),
g AS (
  SELECT a.doc_id, a.term || ' ' || b.term AS bigram
  FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term NOT IN ({stop_list}) AND b.term NOT IN ({stop_list})
),
tf AS (SELECT doc_id, bigram, count(*) AS tf FROM g GROUP BY 1, 2),
dfreq AS (SELECT bigram, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM {table}),
s AS (
  SELECT tf.doc_id, tf.bigram, tf.tf, dfreq.df,
         CAST(tf.tf * ((nd.n_docs * {TFIDF_SCALE}) // (dfreq.df + 1))
              AS BIGINT) AS score
  FROM tf JOIN dfreq USING (bigram), nd
),
r AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, bigram ASC)
      AS INTEGER) AS rank
  FROM s
)
SELECT doc_id, rank, bigram, tf, df, score FROM r WHERE rank <= {k}"""


def chunk_overlap(df: DataFrame, size: int = 64, stride: int = 48,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id_col, chunk_idx, start_tok, n_tok, chunk_digest) — sliding
    context-window chunking: cut each document's token stream into
    windows of ``size`` tokens starting every ``stride`` (stride <
    size ⇒ overlap) — the per-document retrieval/embedding chunking
    that complements :func:`pack_sequences`' cross-document packing
    (RAG indexing, long-doc embedding, window-level dedup all consume
    this shape).  Start positions are 0, stride, 2·stride, … with
    exactly ⌈max(n−size, 0)/stride⌉ + 1 windows: full coverage, no
    redundant all-inside-the-previous tail window; the last window
    clips to the document end.  Tokens are the repo's normal form
    (lowercase, collapsed whitespace — same recipe as the dedup
    tiers), ``chunk_digest`` = md5 of the space-joined window, so the
    SQL oracle rebuilds every digest.

    Shape: tokenization + window explosion are one narrow projection
    (posexplode of a per-row ⌈n/stride⌉-element sequence; the token
    array materializes ONCE before the lambda — never re-tokenized
    per window) — zero shuffles, scan-bound at 100 TB, ~size/stride×
    output amplification by construction."""
    from web_graph_spark.functions.dedup import tokens_col

    d = (df.select(F.col(id_col).alias("__id"),
                   tokens_col(text_col).alias("__tok"))
         .withColumn("__n", F.size("__tok"))
         .filter(F.col("__n") > 0)
         .withColumn("__nc", F.expr(
             f"CASE WHEN __n <= {size} THEN 1L "
             f"ELSE (__n - {size} + {stride} - 1) div {stride} + 1 "
             "END")))
    chunk = F.slice("__tok", F.col("__k") * stride + 1, size)
    return (d.select("__id", "__tok",
                     F.posexplode(F.sequence(
                         F.lit(0).cast("long"),
                         F.col("__nc") - 1)).alias("__p", "__k"))
            .select(F.col("__id").alias(id_col),
                    F.col("__k").cast("int").alias("chunk_idx"),
                    (F.col("__k") * stride).cast("long").alias("start_tok"),
                    F.size(chunk).cast("long").alias("n_tok"),
                    F.md5(F.array_join(chunk, " ")).alias("chunk_digest")))


def doc_similarity_pairs(df: DataFrame, threshold_bp: int = 7000,
                         df_cap: int = 50, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(id_a, id_b, num, na, nb) — document pairs whose raw-tf cosine
    similarity reaches ``threshold_bp``/10⁴ in the df-capped term
    subspace: the "related documents" / lexical near-dup tier that
    needs no embeddings and no MinHash, served straight off the
    inverted index.  Terms with document frequency > ``df_cap`` are
    dropped from BOTH the numerator and the norms (the stopword-class
    terms that would make every pair similar AND make the postings
    self-join quadratic — the cap is the standard prefix-filtering
    move, and cosine is computed consistently in the surviving
    subspace, which the oracle replays verbatim).

    Exact integers end-to-end: the cosine test
    ``num/√(na·nb) ≥ t`` is decided as ``num²·10⁸ ≥ t_bp²·na·nb``
    over decimal(38,0) (num, na, nb ≤ L² for L-token docs — safe to
    L = 10⁶ tokens), so both engines admit exactly the same pairs;
    num/na/nb are emitted rather than a floored cosine so the
    contract hash pins the raw algebra.

    Shape: one (term, doc) tf agg (map-side partials), a df agg +
    semi-join to apply the cap, one postings SELF-JOIN ON TERM whose
    per-term fan-out is ≤ df_cap² by construction (never corpus-
    quadratic), then a (doc_a, doc_b) sum agg and two norm joins."""
    t = doc_positions(df, id_col, text_col)
    tf = (t.groupBy("term", "doc_id")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    keep = (tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap).select("term"))
    tfk = tf.join(keep, "term", "semi")
    norms = (tfk.groupBy("doc_id")
             .agg(F.sum(F.col("tf") * F.col("tf")).cast("long")
                  .alias("n2")))
    a = tfk.select("term", F.col("doc_id").alias("id_a"),
                   F.col("tf").alias("tf_a"))
    b = tfk.select("term", F.col("doc_id").alias("id_b"),
                   F.col("tf").alias("tf_b"))
    pairs = (a.join(b, "term")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("long")
                  .alias("num")))
    dec = "decimal(12,0)"
    num_d = F.col("num").cast(dec)
    lhs = num_d * num_d * F.lit(100000000).cast("decimal(9,0)")
    rhs = (F.lit(threshold_bp * threshold_bp).cast("decimal(9,0)")
           * F.col("na").cast(dec) * F.col("nb").cast(dec))
    return (pairs
            .join(norms.select(F.col("doc_id").alias("id_a"),
                               F.col("n2").alias("na")), "id_a")
            .join(norms.select(F.col("doc_id").alias("id_b"),
                               F.col("n2").alias("nb")), "id_b")
            .filter(lhs >= rhs)
            .select("id_a", "id_b", "num", "na", "nb"))


def stratified_quota_sample(df: DataFrame, strata_col: str,
                            quota: int, id_col: str = "doc_id"
                            ) -> DataFrame:
    """EXACT-size per-stratum sampling — the eval-set / ablation-pool
    construction next to the Bernoulli tiers (sample_mix keeps a
    RATE; this keeps a COUNT): within each stratum take the ``quota``
    rows ranked first by the md5 of their id — a deterministic,
    engine-independent uniform order that is stable under corpus
    growth (a doc's hash rank never changes, so enlarging the corpus
    only ever APPENDS candidates, it never reshuffles the chosen
    prefix's relative order).

    Scale shape: one stratum-keyed ``row_number`` window whose
    ``<= quota`` filter is a literal, so Spark plans WindowGroupLimit
    — every map task keeps only its local top-``quota`` per stratum
    BEFORE the shuffle; the exchange carries O(strata · quota ·
    partitions) rows, never the corpus.  Returns the input columns
    plus ``sample_rank`` (1-based within the stratum)."""
    from pyspark.sql import Window

    w = (Window.partitionBy(strata_col)
         .orderBy(F.md5(F.col(id_col).cast("string")),
                  F.col(id_col)))
    return (df.withColumn("sample_rank",
                          F.row_number().over(w).cast("long"))
            .filter(F.col("sample_rank") <= quota))


def bigram_lm_scores(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Bigram language-model document scoring with interpolated
    unigram backoff — the KenLM-grade upgrade of the unigram
    perplexity gate (:func:`perplexity_buckets`): fluency now
    requires plausible token TRANSITIONS, not just plausible tokens
    (a bag of frequent words scrambled scores high under a unigram
    model, low here — the tests pin exactly that).

    Each bigram (v, w) carries an integer ppb likelihood under the
    Lidstone-interpolated model::

        P(w | v) = (ct(v,w) + P1(w)) / (ct(v) + 1)
        ppb      = 10^9 * (ct(v,w)*N + ct(w)) div (N * (ct(v)+1))

    — one exact decimal(38,0) division per bigram, no float logs to
    drift between engines (same discipline as the unigram gate; the
    monotone integer surrogate orders documents identically).  A
    document's score is ``avg_like_ppb = Σ ppb div n_bigrams``, a
    monotone inverse of bigram perplexity.

    Shape at scale: transition pairs assemble MAP-SIDE from the
    token array (an adjacent-zip transform — no per-doc window, no
    shuffle to build bigrams) -> the bigram/unigram count models are
    hash aggs whose map-side partials absorb hot tokens -> scoring
    is three hash joins on token keys + a 1-row N dim.  The corpus
    is scanned twice (model, score) at any scale; prune the bigram
    model with a min-count at the trillion-token tier (the backoff
    term already covers unseen transitions).

    Returns ``(doc_id, n_bigrams, sum_like_ppb, avg_like_ppb)`` for
    every document with at least one bigram.

    Reference analog: none — engine extension (SURVEY §2.10 E116).
    """
    arr = df.select(F.col(id_col).alias("doc_id"),
                    F.split(F.col(text_col), " ").alias("l"))
    bi = (arr.select("doc_id", F.explode(F.expr(
        "transform(sequence(1, size(l) - 1), "
        "i -> struct(element_at(l, i) as v, "
        "element_at(l, i + 1) as w))")).alias("p"))
        .select("doc_id", "p.v", "p.w"))
    toks = arr.select("doc_id", F.explode("l").alias("tok"))
    m_bi = bi.groupBy("v", "w").agg(F.count("*").alias("ct_vw"))
    m_uni = (toks.groupBy(F.col("tok"))
             .agg(F.count("*").alias("ct")))
    tot = m_uni.agg(F.sum("ct").cast("long").alias("n_total"))
    scored = (bi
              .join(m_bi, ["v", "w"])
              .join(m_uni.select(F.col("tok").alias("v"),
                                 F.col("ct").alias("ct_v")), "v")
              .join(m_uni.select(F.col("tok").alias("w"),
                                 F.col("ct").alias("ct_w")), "w")
              .crossJoin(F.broadcast(tot))
              .select("doc_id", F.expr(
                  "cast(1000000000 as decimal(38,0)) * "
                  "(cast(ct_vw as decimal(38,0)) * n_total + ct_w) "
                  "div (cast(n_total as decimal(38,0)) * (ct_v + 1))")
                  .cast("long").alias("ppb")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.sum("ppb").cast("long").alias("sum_like_ppb"))
            .select(F.col("doc_id").alias(id_col), "n_bigrams",
                    "sum_like_ppb",
                    F.expr("sum_like_ppb div n_bigrams").cast("long")
                    .alias("avg_like_ppb")))


def vocab_drift(df_a: DataFrame, df_b: DataFrame, text_col: str = "text",
                k: int = 20, min_count: int = 5) -> DataFrame:
    """Vocabulary drift between two corpus slices — the
    distribution-shift monitor a training-data pipeline runs between
    crawls (last month vs this month, source A vs source B, train vs
    eval): per token, the 2×2 chi-square of [token vs rest] × [slice
    A vs slice B] in EXACT ppm integers, top-k most-drifted tokens
    reported (the actionable "which words exploded" list — spam
    bursts, template rollouts, language mix swings surface here).

    Exact algebra (decimal(38,0), the Benford/assortativity
    discipline — no float chi-square to drift between engines): for
    token t with occurrence counts a,b and slice totals A,B:
    ``chi_ppm = (A+B)·(a·(B−b) − b·(A−a))² · 10^6 div
    ((a+b)·(A+B−a−b)·A·B)``.  Rare tokens (a+b < min_count) are
    excluded — the classic χ² validity floor, and the guard that
    keeps the top-k from being one-off typos.

    Shape at 100 TB: one explode+hash-agg per slice (map-side
    partials absorb repeats — token keys are the classic Zipf skew
    but the agg is partial-combining, never a join), a full-outer
    merge of two token dims, a codegen chi projection, one top-k.

    → top-k ``(token, n_a, n_b, chi_ppm)`` by (chi_ppm desc, token).

    Reference analog: none — engine extension (SURVEY §2.10 E139).
    """
    from .dedup import TOKEN_RE

    def counts(df: DataFrame, out: str) -> DataFrame:
        toks = F.explode(F.regexp_extract_all(
            normalize_text(F.col(text_col)), F.lit(TOKEN_RE), 0))
        return (df.select(toks.alias("token"))
                .groupBy("token")
                .agg(F.count(F.lit(1)).cast("long").alias(out)))

    ca = counts(df_a, "n_a")
    cb = counts(df_b, "n_b")
    j0 = (ca.join(cb, "token", "full_outer")
          .select("token",
                  F.coalesce("n_a", F.lit(0)).alias("n_a"),
                  F.coalesce("n_b", F.lit(0)).alias("n_b")))
    # totals over the UNFILTERED vocabulary — the χ² "rest" cell is
    # the slice's whole token mass, not the surviving tokens'
    tot = j0.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    j = j0.filter(F.col("n_a") + F.col("n_b") >= min_count)
    d = "cast({} as decimal(38,0))"
    chi = F.expr(
        f"cast(({d.format('ta + tb')} "
        f"* {d.format('n_a * (tb - n_b) - n_b * (ta - n_a)')} "
        f"* {d.format('n_a * (tb - n_b) - n_b * (ta - n_a)')} "
        f"* 1000000) div ({d.format('n_a + n_b')} "
        f"* {d.format('ta + tb - n_a - n_b')} "
        f"* {d.format('ta')} * {d.format('tb')}) as bigint)")
    return (j.crossJoin(F.broadcast(tot))
            .select("token", "n_a", "n_b", chi.alias("chi_ppm"))
            .orderBy(F.desc("chi_ppm"), "token").limit(k))


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             k: int = 10, c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09)
    of ranked lists — THE standard score-free ensemble for hybrid
    retrieval (fuse BM25 with tf-idf, lexical with vector ANN):
    each list contributes ``1/(c + rank)`` per document and the
    fused order is by summed contribution; c=60 is the paper's
    constant.  Score-free matters: the rankers' score scales never
    need calibrating, only their RANKS enter.

    Exact integers: contribution = ``10^6 div (c + rank)`` — the
    quantized harmonic weights preserve the RRF order at every
    realistic depth (distinct ranks < 940 stay distinct integers
    through c=60; ties broken by id), and both engines sum the same
    integers.  Inputs are top-k lists — dims by construction — so
    the fuse is a union + one hash agg + one tiny global window.

    → top-k ``(rank, id_col, rrf_score, n_lists)``.

    Reference analog: none — engine extension (SURVEY §2.10 E145).
    """
    from pyspark.sql import Window

    u = None
    for r in rankings:
        part = r.select(F.col(id_col),
                        F.expr(f"1000000 div ({int(c)} + rank)")
                        .cast("long").alias("pt"))
        u = part if u is None else u.unionByName(part)
    fused = (u.groupBy(id_col)
             .agg(F.sum("pt").cast("long").alias("rrf_score"),
                  F.count(F.lit(1)).cast("long").alias("n_lists")))
    w = Window.orderBy(F.desc("rrf_score"), id_col)
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("rank", id_col, "rrf_score", "n_lists"))


def ndcg_weights(k: int) -> list[int]:
    """The shared nDCG position-weight table: ``W[i] =
    round(10⁶/log2(i+2))`` for 0-based i — the ONE place the
    irrational discount is rounded, imported by both the Spark
    operator and the SQL-oracle generator so the two engines compare
    literal-identical integers (the exact-integer discipline applied
    to a formula with no exact form)."""
    import math

    return [round(1_000_000 / math.log2(i + 2)) for i in range(k)]


def retrieval_metrics(ranked: DataFrame, qrels: DataFrame,
                      k: int = 10) -> DataFrame:
    """Ranking-quality evaluation (E155) — the acceptance harness for
    every retrieval tier this engine ships (tf-idf, BM25, RRF fusion,
    the ANN family): given per-query ranked lists and graded
    relevance judgments, the three standard metrics in exact scaled
    integers:

    * ``recall_ppm`` — 10⁶·|relevant ∩ top-k| div |relevant|;
    * ``mrr_ppm``    — 10⁶ div rank of the first relevant hit
      (0 when the top-k contains none);
    * ``ndcg_ppm``   — 10⁶·DCG div IDCG with graded gains
      ``2^rel − 1`` and the :func:`ndcg_weights` literal discount
      table (ideal ordering by grade; equal grades carry equal
      gains, so judgment tie order cannot move IDCG).

    Inputs: ``ranked (query, doc_id, rank)`` 1-based, ``qrels
    (query, doc_id, rel)`` with integer grades ≥ 1; queries with no
    judgments are excluded (the standard eval convention — nothing
    to recall).  Shape: top-k filter → one (query, doc_id) left join
    (both sides k-ish per query), one window over the JUDGMENTS (dim
    sized by qrels, not the corpus), two per-query aggs — evaluation
    cost scales with queries × k, never with corpus size.

    → ``(query, n_rel, hits_at_k, recall_ppm, mrr_ppm, dcg, idcg,
    ndcg_ppm)``.

    Reference analog: none — engine extension (SURVEY §2.10 E155).
    """
    from pyspark.sql import Window

    W = ndcg_weights(k)
    warr = F.array(*[F.lit(w) for w in W])
    rel1 = F.col("rel") >= 1
    gain = F.expr("shiftleft(1, rel) - 1")
    top = ranked.where(F.col("rank") <= k).select(
        "query", "doc_id", "rank")
    j = (top.join(qrels.select("query", "doc_id", "rel"),
                  ["query", "doc_id"], "left")
         .fillna(0, subset=["rel"]))
    got = (j.groupBy("query")
           .agg(F.sum(gain * F.element_at(warr, F.col("rank")))
                .cast("long").alias("dcg"),
                F.sum(rel1.cast("int")).cast("long")
                .alias("hits_at_k"),
                F.min(F.when(rel1, F.col("rank"))).alias("first_hit")))
    wj = Window.partitionBy("query").orderBy(
        F.col("rel").desc(), "doc_id")
    ideal = (qrels.withColumn("pos", F.row_number().over(wj))
             .groupBy("query")
             .agg(F.count(F.lit(1)).cast("long").alias("n_rel"),
                  F.sum(F.when(F.col("pos") <= k,
                               gain * F.element_at(warr,
                                                   F.col("pos")))
                        .otherwise(0)).cast("long").alias("idcg")))
    return (ideal.join(got, "query", "left")
            .select("query", "n_rel",
                    F.coalesce("hits_at_k", F.lit(0))
                    .alias("hits_at_k"),
                    F.expr("1000000 * coalesce(hits_at_k, 0) "
                           "div n_rel").alias("recall_ppm"),
                    F.coalesce(F.expr("1000000 div first_hit"),
                               F.lit(0)).alias("mrr_ppm"),
                    F.coalesce("dcg", F.lit(0)).alias("dcg"),
                    "idcg",
                    F.expr("1000000 * coalesce(dcg, 0) div idcg")
                    .alias("ndcg_ppm")))


def packing_sweep(df: DataFrame,
                  budgets: tuple[int, ...] = (512, 1024, 2048, 4096),
                  id_col: str = "doc_id",
                  tokens_col: str = "n_tokens",
                  **pack_kw) -> DataFrame:
    """Context-length fragmentation sweep (E158) — the question a
    pretraining run answers before fixing its sequence length: under
    GPT-style concat-and-cut packing (:func:`pack_sequences`) there
    is no padding waste, so the cost of a SHORTER context is
    boundary CROSSINGS (documents split across packs, attention
    fragments, loss masks straddle) — and the sweep prices exactly
    that, per candidate budget, from ONE prefix-sum pass.

    The token offsets do not depend on the budget: the stream is cut
    at different points, the stream itself is fixed.  So
    :func:`pack_sequences` runs ONCE (at ``budgets[0]``, taking its
    10^10-safe distributed-prefix-sum path unchanged), the global
    offset is reconstructed as ``pack_id·b₀ + offset_in_pack``, and
    every other budget's span arithmetic is a pure projection over
    the same rows — N budgets for the price of one scan plus N
    1-row aggregates.

    Exact integers per budget: ``n_packs = ⌈total/L⌉``, split doc
    counts/ppm, and ``frag_tokens`` (tokens living in split docs —
    the mass whose attention is truncated somewhere).

    → ``(budget, n_docs, total_tokens, n_packs, n_split, split_ppm,
    frag_tokens, frag_ppm)``, one row per candidate length.

    Reference analog: none — engine extension (SURVEY §2.10 E158).
    """
    b0 = int(budgets[0])
    base = pack_sequences(df, budget=b0, id_col=id_col,
                          tokens_col=tokens_col, **pack_kw)
    rows = base.select(
        "n_tokens",
        (F.col("pack_id") * b0 + F.col("offset_in_pack"))
        .alias("off"))
    parts = []
    for L in budgets:
        b = int(L)
        spans = F.expr(f"(off + greatest(n_tokens, 1L) - 1L) div {b}"
                       f" - off div {b} + 1L")
        split = spans > 1
        parts.append(rows.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(split.cast("int")).cast("long").alias("n_split"),
            F.sum(F.when(split, F.col("n_tokens")).otherwise(0))
            .cast("long").alias("frag_tokens"))
            .select(F.lit(b).cast("long").alias("budget"),
                    "n_docs", "total_tokens",
                    F.expr(f"(total_tokens + {b} - 1) div {b}")
                    .alias("n_packs"),
                    "n_split",
                    F.expr("1000000 * n_split div n_docs")
                    .alias("split_ppm"),
                    "frag_tokens",
                    F.expr("1000000 * frag_tokens div total_tokens")
                    .alias("frag_ppm")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def synth_classifier_weights(spark, labels: tuple[str, ...],
                             bucket_hex: int = 2) -> DataFrame:
    """Deterministic dense weight dim for :func:`hashed_classifier`
    tests/benchmarks — one row per (bucket, label) over all
    ``B = 16**bucket_hex`` buckets, weight = hex16 of
    ``md5(bucket || '|' || label)`` centered to [-32768, 32767].
    Stands in for a trained model (the sandbox trains nothing); any
    real fastText export with the same (b, label, w) shape drops in.
    B×|labels| rows — always a broadcast dim."""
    from web_graph_spark.functions.stats import _hexchunk

    b = F.lower(F.lpad(F.hex(F.col("id")), bucket_hex, "0"))
    buckets = spark.range(16 ** bucket_hex).select(b.alias("b"))
    lab = spark.createDataFrame([(str(l),) for l in labels],
                                "label string")
    h = F.md5(F.concat(F.col("b"), F.lit("|"), F.col("label")))
    return buckets.crossJoin(lab).select(
        "b", "label", (_hexchunk(h, 1) - 32768).alias("w"))


def hashed_classifier(df: DataFrame, weights: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      bucket_hex: int = 2) -> DataFrame:
    """fastText-style hashed linear classifier INFERENCE (Joulin et
    al. 2016, "Bag of Tricks for Efficient Text Classification") —
    the model-based quality/topic gate every 100 TB curation pipeline
    runs after the cheap heuristics (E81/E11): each document's
    unigrams + bigrams hash into ``B = 16**bucket_hex`` buckets
    (md5-prefix, the repo's cross-engine recipe), and the per-class
    score is the integer dot product of the doc's bucket-count vector
    with a dense ``(b, label, w:int)`` weight dim::

        score(d, c) = Σ_b cnt_d(b) · w(b, c)

    — exactly fastText's linear layer over hashed n-gram features
    with the embedding dimension folded to 1 integer per (bucket,
    class), which keeps inference bit-reproducible across engines
    (float means/softmax only reorder scores monotonically per class
    when the dim is shared; argmax needs no softmax).  The winner is
    argmax with (score DESC, label ASC) tie-break; ``margin`` =
    winner − runner-up (0 when |labels| = 1) is the abstention
    signal a downstream router thresholds on.

    Physical shape at 100 TB: one explode scan → per-(doc, bucket)
    count agg whose map-side partials absorb repeated grams (≤B
    distinct buckets per doc survive the shuffle, NOT one row per
    token); the weight dim joins BROADCAST (B×|labels| rows — 16^2×C
    here, ≤16^4×C for any real model); per-(doc, label) sum rides a
    doc-keyed agg; winner + margin are one window over |labels| rows
    per doc.  Nothing scales beyond the single corpus scan.

    Returns ``(doc_id, n_grams, label, score, margin)``.

    Reference analog: none (the reference stores pages verbatim,
    pkg/crawler/crawler.go:66-78); engine extension (SURVEY §2.10
    E162).
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.split(F.col(text_col), " ").alias("t"))
    uni = toks.select("doc_id", F.explode("t").alias("g"))
    bi = toks.select("doc_id", F.explode(F.expr(_BIGRAMS)).alias("g"))
    grams = (uni.unionByName(bi)
             .withColumn("b", F.substring(F.md5(F.col("g")), 1,
                                          bucket_hex)))
    per_bucket = (grams.groupBy("doc_id", "b")
                  .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    scored = (per_bucket
              .join(F.broadcast(weights.select("b", "label", "w")), "b")
              .groupBy("doc_id", "label")
              .agg(F.sum(F.col("cnt") * F.col("w")).cast("long")
                   .alias("score"),
                   F.sum("cnt").cast("long").alias("n_grams")))
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("label").asc())
    return (scored
            .withColumn("rn", F.row_number().over(w_rank))
            .withColumn("runner", F.lead("score").over(w_rank))
            .filter(F.col("rn") == 1)
            .select("doc_id", "n_grams", "label", "score",
                    (F.col("score") - F.coalesce(F.col("runner"),
                                                 F.col("score")))
                    .cast("long").alias("margin")))


def pps_sample(df: DataFrame, k: int, id_col: str = "doc_id",
               weight_col: str = "weight",
               small_hint: int | None = None) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (E169,
    Madow 1949) — the exact weighted sampler a curation pipeline
    wants when "sample 10^6 docs proportional to token count" must be
    reproducible and must hit its size EXACTLY: lay the corpus out on
    the cumulative-weight line (``id_col`` order), drop ``k`` evenly
    spaced grid points (at ``m·W/k`` for m = 1..k — each landing in
    the half-open interval ``(cum, cum+w]`` of exactly one doc), take
    the document under each point.  Zero randomness (a seeded variant
    just adds a phase offset), zero rejection, Σmultiplicity = k
    exactly::

        n_points(i) = ⌊(cum_i + w_i)·k / W⌋ − ⌊cum_i·k / W⌋

    — a doc heavier than W/k can carry SEVERAL grid points;
    ``n_points`` is its multiplicity (the with-replacement view), so
    downstream weighting stays unbiased.  Zero-weight docs are never
    selected.  All BIGINT; exact while ``W·k < 2^63`` (10^12 tokens ×
    10^6 samples — past that, widen to decimal(38,0), the components-
    digest discipline).

    The cumulative line is the EXCLUSIVE prefix sum
    :func:`pack_sequences` already computes (range-partition +
    per-partition totals + mapInPandas running sum — never a global
    single-reducer window past ``small_hint``); this reuses it with a
    one-pack budget, so the sampler inherits the packer's scale path
    and its tests.

    Returns selected docs only: ``(id, weight, n_points)``.

    Reference analog: none (the reference stores everything it
    fetches); engine extension (SURVEY §2.10 E169).
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    b0 = 1 << 62
    base = pack_sequences(
        df.select(F.col(id_col), F.col(weight_col).cast("long")
                  .alias("n_tokens")),
        budget=b0, id_col=id_col, small_hint=small_hint)
    tot = base.agg(F.coalesce(F.sum("n_tokens"), F.lit(0))
                   .cast("long").alias("__W"))
    cum = (F.col("pack_id") * F.lit(b0) + F.col("offset_in_pack"))
    pts = (F.expr(f"(__cum + n_tokens) * {int(k)}L div __W")
           - F.expr(f"__cum * {int(k)}L div __W"))
    return (base.withColumn("__cum", cum.cast("long"))
            .crossJoin(F.broadcast(tot))
            .withColumn("n_points", pts.cast("long"))
            .filter(F.col("n_points") >= 1)
            .select(F.col(id_col),
                    F.col("n_tokens").alias(weight_col), "n_points"))


def readability_scores(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Flesch readability as an exact-integer quality gate (E174) —
    the classic pre-training text filter after the ratio heuristics
    (E11) and before the model gate (E162): reading ease and grade
    level from sentence / word / syllable counts (Flesch 1948,
    Kincaid 1975).  Everything is a JVM regexp count and the float
    constants become milli-scaled integer algebra whose divisions
    run on NON-NEGATIVE operands only (floor ≡ trunc there, so any
    engine reproduces the numbers bit-for-bit; the subtractions
    happen after the divisions):

        ease_milli  = 206835 − (1015·words) div sentences
                             − (84600·syllables) div words
        grade_milli = (390·words) div sentences
                      + (11800·syllables) div words − 15590

    Counts: sentences = [.!?]+ runs (min 1 — a trailing unterminated
    clause is a sentence), words = \\S+ tokens, syllables = the
    standard vowel-group proxy ([aeiouy]+ runs, lower-cased).  A doc
    with no words reports NULL scores.  Physical shape: ONE codegen'd
    projection — no shuffle, no join, no Python; a 10^10-doc table
    pays exactly its scan.

    Reference analog: none — engine extension (curation tier)."""
    t = F.col(text_col)
    n_sent = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)) \
        .cast("long")
    n_words = token_count(t).cast("long")
    n_syll = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")).cast("long")
    return (df.select(F.col(id_col), n_sent.alias("n_sentences"),
                      n_words.alias("n_words"),
                      n_syll.alias("n_syllables"))
            .select(id_col, "n_sentences", "n_words", "n_syllables",
                    F.when(F.col("n_words") > 0, F.expr(
                        "206835 - (1015 * n_words) div n_sentences"
                        " - (84600 * n_syllables) div n_words"))
                    .cast("long").alias("ease_milli"),
                    F.when(F.col("n_words") > 0, F.expr(
                        "(390 * n_words) div n_sentences"
                        " + (11800 * n_syllables) div n_words - 15590"))
                    .cast("long").alias("grade_milli")))


# Unicode script classes for script_mix — each a character-class
# regexp valid in both Java regex (Spark) and RE2 (DuckDB).  BMP
# ranges only: the corpus tier this gates runs before any NFC/NFKC
# normalization pass, and the ranges cover what web text actually
# carries at volume.
SCRIPT_CLASSES = (
    ("latin", "[A-Za-zÀ-ÖØ-öø-ÿ]"),
    ("cjk", "[一-鿿぀-ヿ가-힣]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("arabic", "[؀-ۿ]"),
    ("digit", "[0-9]"),
)


def script_mix(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Unicode-script composition per document (E175) — the
    language-ID feature BEFORE any model (fastText's first split is
    effectively script), and the homoglyph-spoofing signal spam
    triage keys on: a document whose body mixes Latin with Cyrillic
    confusables (``раypal``) is a phishing/spam tell, and a corpus
    slice labeled one language but dominated by another script is a
    mislabel audit hit.  Per doc: exact codepoint counts per script
    class, the dominant script (strict count max, ties broken by the
    fixed SCRIPT_CLASSES order, 'none' when no class matches), and
    the Latin×Cyrillic confusable flag.

    Physical shape: ONE codegen'd projection of regexp counts — no
    shuffle, no join, no Python; a 10^10-doc table pays exactly its
    scan.  Counts are exact integers (no ratios → no division rules
    to mirror); every class regexp is shared verbatim by the DuckDB
    oracle.

    → ``(id_col, n_latin, n_cjk, n_cyrillic, n_greek, n_arabic,
    n_digit, dominant, confusable)``.

    Reference analog: none — engine extension (curation tier; the
    reference stores UTF-8-sanitized text without inspecting it,
    linkstorage.go ToValidUTF8)."""
    t = F.col(text_col)
    counts = {name: F.regexp_count(t, F.lit(rx)).cast("long")
              for name, rx in SCRIPT_CLASSES}
    alpha = [n for n, _ in SCRIPT_CLASSES if n != "digit"]
    total_alpha = sum((counts[n] for n in alpha), F.lit(0))
    dom = F.when(total_alpha == 0, F.lit("none"))
    for i, name in enumerate(alpha):
        cond = F.lit(True)
        for other in alpha[i + 1:]:
            cond = cond & (counts[name] >= counts[other])
        for prev in alpha[:i]:
            cond = cond & (counts[name] > counts[prev])
        dom = dom.when(cond, F.lit(name))
    return df.select(
        F.col(id_col),
        *[counts[n].alias(f"n_{n}") for n, _ in SCRIPT_CLASSES],
        dom.alias("dominant"),
        ((counts["latin"] > 0) & (counts["cyrillic"] > 0))
        .alias("confusable"))


def kneser_ney_scores(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (E176; Kneser & Ney
    1995, the smoothing every production n-gram LM — KenLM included —
    actually ships) — the upgrade of :func:`bigram_lm_scores`'
    Lidstone backoff: the lower-order distribution is the
    CONTINUATION probability (how many distinct contexts a word
    FOLLOWS — 'Francisco' is frequent but follows almost nothing, so
    its backoff mass is tiny), which is what makes KN the right
    fluency gate for template-spam whose token frequencies look
    natural.  With absolute discount D = 3/4::

        P(w|v)    = (ct(v,w) − D)/ct(v) + D·N₊(v,·)/ct(v) · P_c(w)
        P_c(w)    = N₊(·,w) / T
        ppb       = 10^9·((4·ct_vw − 3)·T + 3·n_after_v·n_before_w)
                    div (4·ct_v·T)

    where N₊(v,·)/N₊(·,w) are distinct-successor/-predecessor type
    counts, T = distinct bigram types, and ct(v) = Σ_w ct(v,w) (the
    KN left-context mass, NOT the unigram token count).  Every
    scored bigram is observed, so ct_vw ≥ 1 and the discount term
    (4·ct_vw − 3) is already positive — the max(·,0) clamp is
    vacuous and the whole likelihood is ONE exact decimal(38,0)
    division (no float logs; monotone surrogate, same ordering as
    the real probabilities).

    Shape at 100 TB: bigrams assemble map-side (adjacent-zip
    transform, no window); the count model is one hash agg; the v-
    and w-dims DERIVE from it (groupBy v / groupBy w over the
    already-distinct (v,w) rows — distinct-type counts are plain
    count(*) there, no countDistinct shuffle); T is a 1-row
    broadcast.  Scoring = three token-keyed hash joins, map-side
    partials absorbing Zipf skew.

    → ``(id_col, n_bigrams, sum_kn_ppb, avg_kn_ppb)`` for every doc
    with ≥1 bigram.

    Reference analog: none — engine extension (curation tier)."""
    arr = df.select(F.col(id_col).alias("doc_id"),
                    F.split(F.col(text_col), " ").alias("l"))
    bi = (arr.select("doc_id", F.explode(F.expr(
        "transform(sequence(1, size(l) - 1), "
        "i -> struct(element_at(l, i) as v, "
        "element_at(l, i + 1) as w))")).alias("p"))
        .select("doc_id", "p.v", "p.w"))
    m_bi = bi.groupBy("v", "w").agg(F.count("*").alias("ct_vw"))
    left = m_bi.groupBy("v").agg(
        F.sum("ct_vw").cast("long").alias("ct_v"),
        F.count("*").cast("long").alias("n_after_v"))
    right = m_bi.groupBy("w").agg(
        F.count("*").cast("long").alias("n_before_w"))
    types = m_bi.agg(F.count("*").cast("long").alias("t_types"))
    scored = (bi
              .join(m_bi, ["v", "w"])
              .join(left, "v")
              .join(right, "w")
              .crossJoin(F.broadcast(types))
              .select("doc_id", F.expr(
                  "cast(1000000000 as decimal(38,0)) * "
                  "((4 * cast(ct_vw as decimal(38,0)) - 3) * t_types "
                  " + 3 * cast(n_after_v as decimal(38,0)) * n_before_w) "
                  "div (4 * cast(ct_v as decimal(38,0)) * t_types)")
                  .cast("long").alias("ppb")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.sum("ppb").cast("long").alias("sum_kn_ppb"))
            .select(F.col("doc_id").alias(id_col), "n_bigrams",
                    "sum_kn_ppb",
                    F.expr("sum_kn_ppb div n_bigrams").cast("long")
                    .alias("avg_kn_ppb")))


def extractive_summary(df: DataFrame, k: int = 2,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """TextRank-style extractive summarization (E180; Mihalcea &
    Tarau 2004, degree form) — the snippet/preview step of a corpus
    pipeline and the cheap 'central sentences' signal used for
    dataset cards and dedup previews: score every sentence by how
    much vocabulary it shares with the REST of its document, keep
    the top-k.

    The scale trick: the pairwise sentence-similarity graph is never
    built.  With shared-token counting, degree centrality
    decomposes linearly::

        score(i) = Σ_{j≠i} |tokens(i) ∩ tokens(j)|
                 = Σ_{tok ∈ i} (n_sentences_containing(tok) − 1)

    so one (doc, sentence, token)-distinct explode + one token-dim
    agg + one sentence agg replace the O(sentences²) self-join the
    textbook formulation runs (the oracle REPLAYS that quadratic
    pair form — equality certifies the decomposition).  All exact
    integers; ranking ties break to the earlier sentence.

    Physical shape: split/posexplode (narrow) → two hash aggs on
    (doc, token) / (doc, sentence) keys → one per-doc window over
    sentence-count-sized partitions.  Empty sentences (consecutive
    delimiters, trailing period) drop before scoring.

    → top-k rows per doc: ``(id_col, sent_idx, n_sents, score,
    rank, sentence)``.

    Reference analog: none — engine extension (curation tier)."""
    from pyspark.sql import Window

    sents = (df.select(F.col(id_col).alias("doc_id"),
                       F.posexplode(F.split(F.col(text_col), r"\."))
                       .alias("sent_idx", "raw"))
             .select("doc_id", "sent_idx",
                     F.trim(F.col("raw")).alias("sentence"))
             .filter(F.col("sentence") != ""))
    trip = (sents.select("doc_id", "sent_idx",
                         F.explode(F.array_distinct(
                             F.split(F.col("sentence"), " ")))
                         .alias("tok"))
            .filter(F.col("tok") != ""))
    tokdim = trip.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("n_with"))
    score = (trip.join(tokdim, ["doc_id", "tok"])
             .groupBy("doc_id", "sent_idx")
             .agg(F.sum(F.col("n_with") - 1).cast("long")
                  .alias("score")))
    nd = sents.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sents"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("sent_idx").asc())
    return (sents.join(score, ["doc_id", "sent_idx"])
            .join(nd, "doc_id")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("doc_id").alias(id_col),
                    F.col("sent_idx").cast("long").alias("sent_idx"),
                    "n_sents", "score",
                    F.col("rank").cast("long").alias("rank"),
                    "sentence"))


def winnowing_fingerprints(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           k: int = 8, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm) per document, with the guarantee
    the paper proves: every match of length ≥ k+w−1 between two
    documents shares at least one selected fingerprint, while only
    ~2/(w+1) of all k-gram hashes are kept.  The plagiarism /
    fine-grained-copy detector that md5-of-normal-form (X1) and
    shingle MinHash (E3) sit on either side of.

    Construction (cross-engine exact): the character stream is
    lowercased alnum-only; k-gram at position p hashes to hex16 of
    md5 (functions/stats.py:_hexchunk recipe); each complete window
    of w consecutive k-grams selects its minimal hash, RIGHTMOST
    occurrence on ties (robust winnowing) — encoded order-exactly as
    ``hash·2³² + (2³²−1−pos)`` so one BIGINT min() does (min hash,
    max pos) at once; selected keys are distinct'd per document.

    → per doc: ``(doc_id, n_kgrams, n_windows, n_fingerprints,
    density_ppm, fp_digest)`` where density is fingerprints per
    window (ppm) and ``fp_digest = Σ (hash·(pos+1))`` over the
    selected set — an order-insensitive exact digest that pins the
    fingerprint SET itself, not just its size.  Documents whose
    cleaned text is shorter than k chars emit an explicit zero row.

    Physical shape: one explode to |chars| k-gram rows (uniform
    doc_id keys), ONE doc-partitioned window pass (the min() frame
    is w rows), a distinct + doc agg, and a left join back to the
    doc dim for the short-doc zero rows.  No UDFs, no driver state.
    """
    if k < 1 or w < 1:
        raise ValueError("winnowing needs k >= 1 and w >= 1")
    from pyspark.sql import Window

    from web_graph_spark.functions.stats import _hexchunk

    clean = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    base = df.select(F.col(id_col), clean.alias("__c"))
    grams = (base
             .select(id_col,
                     F.explode(F.when(
                         F.length("__c") >= k,
                         F.sequence(F.lit(1),
                                    F.length("__c") - F.lit(k - 1)))
                         .otherwise(F.array().cast("array<int>")))
                     .alias("pos"),
                     "__c")
             .select(id_col, "pos",
                     _hexchunk(F.md5(F.expr(f"substring(__c, pos, {k})")),
                               1).alias("h")))
    # hash·2^32 + (2^32−1−pos): BIGINT min == (min hash, rightmost pos)
    key = (F.col("h") * F.lit(1 << 32)
           + (F.lit((1 << 32) - 1) - F.col("pos"))).cast("long")
    wd = Window.partitionBy(id_col)
    wf = (Window.partitionBy(id_col).orderBy("pos")
          .rowsBetween(Window.currentRow, w - 1))
    sel = (grams.withColumn("__n", F.count(F.lit(1)).over(wd))
           .withColumn("__k", key)
           .withColumn("__m", F.min("__k").over(wf))
           # complete windows only; a doc with 1 ≤ n < w grams keeps
           # its single (truncated) window at pos 1
           .filter(F.col("pos") <= F.greatest(F.col("__n") - F.lit(w - 1),
                                              F.lit(1)))
           .select(id_col, F.col("__n").alias("n_kgrams"),
                   F.col("__m").alias("sel_key"))
           .distinct())
    agg = (sel.groupBy(id_col)
           .agg(F.max("n_kgrams").cast("long").alias("n_kgrams"),
                F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
                F.sum(F.expr(f"(sel_key div {1 << 32}) * "
                             f"({(1 << 32) - 1} - sel_key % {1 << 32} + 1)"))
                .cast("long").alias("fp_digest"))
           .withColumn("n_windows",
                       F.greatest(F.col("n_kgrams") - F.lit(w - 1),
                                  F.lit(1)).cast("long"))
           .withColumn("density_ppm",
                       F.expr("n_fingerprints * 1000000 div n_windows")
                       .cast("long")))
    return (df.select(id_col).distinct()
            .join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_kgrams", F.lit(0)).cast("long")
                    .alias("n_kgrams"),
                    F.coalesce("n_windows", F.lit(0)).cast("long")
                    .alias("n_windows"),
                    F.coalesce("n_fingerprints", F.lit(0)).cast("long")
                    .alias("n_fingerprints"),
                    F.coalesce("density_ppm", F.lit(0)).cast("long")
                    .alias("density_ppm"),
                    F.coalesce("fp_digest", F.lit(0)).cast("long")
                    .alias("fp_digest")))


def vocab_growth(df: DataFrame, n_docs: int, n_bins: int = 10,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Heaps-law vocabulary growth curve (E199) — the corpus-sizing
    readout: V(n) grows ~K·n^β (β < 1), so the marginal value of
    more same-source data falls with scale, and the curve's flatting
    is the "this source is mined out" signal (the vocabulary-level
    complement to E173's trigram novelty, which scores DOCUMENTS;
    this bins the CORPUS).  Accession order = ``id_col``; the corpus
    is cut into ``n_bins`` equal id ranges and each bin reports its
    token volume, NEW vocabulary types (first-occurrence credit —
    the E173 trick: a type's credit goes to min(doc_id), so the type
    dim is never joined back), and the running totals with the
    cumulative type/token ratio in floor ppm.

    Physical shape: one explode scan → two hash aggs (bin-keyed
    token counts; type-keyed firsts re-aggregated by first bin) —
    both uniform keys — then cumulative windows over the N_BINS-row
    dim (10 rows at ANY corpus size; the corpus never enters a
    window).  → (bin, n_docs, n_tokens, n_new_types, cum_tokens,
    cum_types, ttr_ppm).
    """
    from pyspark.sql import Window

    if n_bins < 1 or n_docs < 1:
        raise ValueError("need n_bins >= 1 and n_docs >= 1")
    bin_of = F.least(F.expr(f"({id_col} * {n_bins}) div {n_docs}"),
                     F.lit(n_bins - 1)).cast("int")
    toks = df.select(F.col(id_col), bin_of.alias("bin"),
                     F.explode(F.split(F.col(text_col), " "))
                     .alias("tok"))
    per_bin_tok = toks.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"))
    news = (toks.groupBy("tok").agg(F.min("bin").alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).cast("long")
                                .alias("n_new_types")))
    docs = df.select(bin_of.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = (Window.orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs.join(per_bin_tok, "bin", "left")
            .join(news, "bin", "left")
            .select("bin", "n_docs",
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_new_types", F.lit(0))
                    .alias("n_new_types"))
            .withColumn("cum_tokens",
                        F.sum("n_tokens").over(w).cast("long"))
            .withColumn("cum_types",
                        F.sum("n_new_types").over(w).cast("long"))
            .withColumn("ttr_ppm",
                        F.when(F.col("cum_tokens") > 0,
                               F.expr("cum_types * 1000000 "
                                      "div cum_tokens"))
                        .cast("long")))


def code_detect(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                flag_bp: int = 1500) -> DataFrame:
    """Code-vs-prose detection (E205) — the routing filter every
    pretraining pipeline runs before language-specific processing
    (code wants different tokenization, dedup grain, and quality
    gates than prose; mis-routed code poisons stopword/readability
    stats and vice versa).  Pure integer signal battery, all
    codegen'd regexp counts per 10k chars / lines:

    * ``sym_bp``     — C-family symbol density ``{}();=<>[]`` per
      char;
    * ``indent_bp``  — lines starting with 2+ spaces or a tab;
    * ``kw_hits``    — distinct-ish keyword occurrences (def, return,
      import, function, var, const, class, if(, for();
    * ``eol_semi_bp``— lines ending in ``;`` or ``{``.

    code_score_bp = sym_bp + indent_bp + eol_semi_bp + kw_hits·100,
    flagged at ``flag_bp``.  Thresholds are engineering defaults —
    the point is the exact, replayable signal set, not a trained
    model (E162 is the hashed classifier when one is available).

    One regexp projection, zero shuffles.
    → (doc_id, sym_bp, indent_bp, eol_semi_bp, kw_hits,
    code_score_bp, is_code).
    """
    t = F.col(text_col)
    n_chars = F.greatest(F.length(t), F.lit(1))
    lines = F.greatest(
        F.length(t) - F.length(F.regexp_replace(t, "\n", "")) + 1,
        F.lit(1))
    sym = F.length(t) - F.length(
        F.regexp_replace(t, r"[{}();=<>\[\]]", ""))
    indent = F.size(F.expr(
        rf"regexp_extract_all({text_col}, '(^|\\n)(  |\\t)', 0)"))
    eol_semi = F.size(F.expr(
        rf"regexp_extract_all({text_col}, '[;{{]($|\\n)', 0)"))
    kw = F.size(F.expr(
        rf"regexp_extract_all({text_col}, "
        rf"'\\b(def|return|import|function|var|const|class)\\b"
        rf"|if\\s*\\(|for\\s*\\(', 0)"))
    return (df.select(
        id_col,
        (sym * 10000).cast("long").alias("__s"), n_chars.alias("__nc"),
        ((indent * 10000).cast("long")).alias("__i"),
        lines.cast("long").alias("__ln"),
        (eol_semi * 10000).cast("long").alias("__e"),
        kw.cast("long").alias("kw_hits"))
        .select(
            id_col,
            F.expr("__s div __nc").cast("long").alias("sym_bp"),
            F.expr("__i div __ln").cast("long").alias("indent_bp"),
            F.expr("__e div __ln").cast("long").alias("eol_semi_bp"),
            "kw_hits")
        .withColumn("code_score_bp",
                    (F.col("sym_bp") + F.col("indent_bp")
                     + F.col("eol_semi_bp")
                     + F.col("kw_hits") * 100).cast("long"))
        .withColumn("is_code", F.col("code_score_bp") >= flag_bp))


def lexicon_filter(df: DataFrame, lexicon: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   flag_categories: tuple = ("blocked",),
                   flag_min_hits: int = 1) -> DataFrame:
    """Lexicon-based content filter (E210) — the UT1/blocklist-style
    safety pass, built the way it survives a 10^5-term lexicon: the
    document tokenizes ONCE and joins the (term, category) dim
    (broadcast; a union-of-10^5-alternatives regex is where the
    regex tier dies), counting hits per category.  Token match is
    exact on the lowercased alnum-stripped token — the lexicon is
    expected in the same normal form (terms that don't survive
    normalization can never match; dedupe the dim upstream).

    Per doc: total tokens, per-category hit counts as a sorted
    ``cat:n`` summary string (schema stays fixed however many
    categories the lexicon carries), total hits in flagged
    categories, and the flag verdict.

    → (doc_id, n_tokens, n_hits, hits_by_cat, flagged).

    Scale shape: one explode scan → one broadcast hash join → one
    doc agg.  The corpus never shuffles on anything but doc_id.
    """
    toks = (df.select(F.col(id_col),
                      # explicit class, not \s (see bitext_candidates)
                      F.explode(F.split(F.lower(F.col(text_col)),
                                        "[ \\t\\n\\r\\f]+"))
                      .alias("__raw"))
            .select(id_col,
                    F.regexp_replace("__raw", "[^a-z0-9]", "")
                    .alias("tok")))
    lex = (lexicon.select(F.col("term").alias("tok"), "category")
           .distinct())
    hits = (toks.join(F.broadcast(lex), "tok")
            .groupBy(id_col, "category")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))
    per_doc = (hits.groupBy(id_col)
               .agg(F.expr("array_join(transform(array_sort("
                           "collect_list(struct(category, n))), "
                           "r -> concat(r.category, ':', r.n)), ',')")
                    .alias("hits_by_cat"),
                    F.sum(F.when(F.col("category")
                                 .isin(*flag_categories), F.col("n"))
                          .otherwise(F.lit(0))).cast("long")
                    .alias("n_flag_hits"),
                    F.sum("n").cast("long").alias("n_hits")))
    totals = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"))
    return (df.select(id_col).distinct()
            .join(totals, id_col, "left")
            .join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.coalesce("hits_by_cat", F.lit(""))
                    .alias("hits_by_cat"),
                    (F.coalesce("n_flag_hits", F.lit(0))
                     >= flag_min_hits).alias("flagged")))


def bitext_candidates(docs: DataFrame, edges: DataFrame,
                      min_ratio_ppm: int = 500_000,
                      tau_ppm: int = 300_000,
                      id_col: str = "doc_id", lang_col: str = "lang",
                      len_col: str = "n_chars", text_col: str = "text",
                      src: str = "src_doc_id",
                      dst: str = "tgt_doc_id") -> DataFrame:
    """Bitext candidate mining from the link graph (E220) — the
    parallel-corpus harvesting step of a multilingual training
    pipeline: LINKED document pairs whose languages differ are the
    classic translation-pair prior (the "click the flag icon" edge),
    scored by the two cheap signals that survive at 10^10 docs —
    length-ratio compatibility (translations have similar lengths;
    Gale-Church's core observation) and exact shared-token overlap
    (numbers, names and codes survive translation).  Mutual links
    (a⇄b) are flagged — the strongest prior of all.

    Definitions, exact end-to-end: pairs are the UNORDERED distinct
    cross-language linked pairs (canonical a < b; self-loops out);
    ``len_ratio_ppm = 10⁶·min(len) div max(len)`` (0 when the longer
    side is empty), pairs below ``min_ratio_ppm`` drop;
    ``jaccard_ppm`` is the floor-ppm Jaccard of the DISTINCT
    lowercased alnum-stripped token sets (the :func:`lexicon_filter`
    normal form); ``is_candidate = jaccard ≥ tau_ppm``.

    Scale shape: candidates are EDGE-bounded (never a doc×doc
    product); token sets explode ONLY for documents that survive the
    cheap filters (semi-join prune before the explode); the overlap
    join runs on uniform (doc, token) keys.  One corpus scan for
    metadata, one pruned scan for tokens.

    → ``(doc_a, doc_b, lang_a, lang_b, mutual, len_ratio_ppm,
    jaccard_ppm, is_candidate)``.

    Reference analog: none (single-language crawler); engine
    extension (SURVEY §2.10 E220).
    """
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("t"))
         .filter(F.col("s") != F.col("t")))
    dirs = (e.select(F.least("s", "t").alias("a"),
                     F.greatest("s", "t").alias("b"),
                     (F.col("s") < F.col("t")).alias("fwd"))
            .groupBy("a", "b")
            .agg(F.max("fwd").alias("has_f"),
                 F.max(~F.col("fwd")).alias("has_r")))
    meta = docs.select(F.col(id_col).cast("long").alias("id"),
                       F.col(lang_col).alias("lg"),
                       F.col(len_col).cast("long").alias("ln"))
    cand = (dirs
            .join(meta.select(F.col("id").alias("a"),
                              F.col("lg").alias("lang_a"),
                              F.col("ln").alias("len_a")), "a")
            .join(meta.select(F.col("id").alias("b"),
                              F.col("lg").alias("lang_b"),
                              F.col("ln").alias("len_b")), "b")
            .filter(F.col("lang_a") != F.col("lang_b"))
            .withColumn("len_ratio_ppm", F.expr(
                "CASE WHEN greatest(len_a, len_b) = 0 THEN 0 "
                "ELSE least(len_a, len_b) * 1000000 div "
                "greatest(len_a, len_b) END").cast("long"))
            .filter(F.col("len_ratio_ppm") >= min_ratio_ppm)
            .localCheckpoint())
    ids = (cand.select(F.col("a").alias("id"))
           .unionByName(cand.select(F.col("b").alias("id")))
           .distinct())
    toks = (docs.select(F.col(id_col).cast("long").alias("id"),
                        F.col(text_col).alias("__t"))
            .join(ids, "id", "left_semi")
            .select("id", F.explode(
                        # explicit class, not \s: Java \s includes
                        # vertical tab (\x0B), RE2's does not -- the
                        # shared [ \t\n\r\f]+ tokenizes identically
                        # in both engines (ADVICE r4)
                        F.split(F.lower("__t"), "[ \\t\\n\\r\\f]+"))
                    .alias("__raw"))
            .select("id", F.regexp_replace("__raw", "[^a-z0-9]", "")
                    .alias("tok"))
            .filter(F.col("tok") != "").distinct())
    sizes = toks.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("nt"))
    inter = (cand.select("a", "b")
             .join(toks.select(F.col("id").alias("a"), "tok"), "a")
             .join(toks.select(F.col("id").alias("b"), "tok"),
                   ["b", "tok"])
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("ni")))
    out = (cand
           .join(sizes.select(F.col("id").alias("a"),
                              F.col("nt").alias("na")), "a", "left")
           .join(sizes.select(F.col("id").alias("b"),
                              F.col("nt").alias("nb")), "b", "left")
           .join(inter, ["a", "b"], "left")
           .select(F.col("a").alias("doc_a"),
                   F.col("b").alias("doc_b"),
                   "lang_a", "lang_b",
                   (F.col("has_f") & F.col("has_r")).alias("mutual"),
                   "len_ratio_ppm",
                   F.expr("CASE WHEN coalesce(na, 0) + coalesce(nb, 0)"
                          " - coalesce(ni, 0) = 0 THEN 0 ELSE "
                          "coalesce(ni, 0) * 1000000 div "
                          "(coalesce(na, 0) + coalesce(nb, 0) - "
                          "coalesce(ni, 0)) END").cast("long")
                   .alias("jaccard_ppm")))
    return out.withColumn("is_candidate",
                          F.col("jaccard_ppm") >= tau_ppm)


def zipf_head(docs: DataFrame, text_col: str = "text",
              k: int = 50) -> DataFrame:
    """Zipf head audit (E234): the top-``k`` tokens (lexicon_filter
    normal form — lower, explicit ``[ \\t\\n\\r\\f]+`` whitespace
    class, strip non-alnum) with rank, frequency, corpus share, and
    the Zipf constant f·r/N in floor ppm.  Flat C across ranks ≈
    Zipf-compliant natural text; a C cliff at low ranks is the
    boilerplate/template signature (the same headers on every page) —
    the cheap corpus-level screen beside the per-doc repetition
    scores.  Exact integers only (no logs, no floats).

    → ``(tok, rank, freq, share_ppm, zipf_c_ppm)``, ≤ k rows.

    Scale shape: one explode scan + one uniform token agg, then a
    global orderBy+LIMIT k (per-partition LocalLimit heads, never a
    full vocab sort on one task); the rank window runs on the bounded
    k-row head only.

    Reference analog: none — engine extension (SURVEY §2.10 E234).
    """
    from pyspark.sql import Window

    toks = (docs.select(F.explode(
                F.split(F.lower(text_col), "[ \\t\\n\\r\\f]+"))
                .alias("__raw"))
            .select(F.regexp_replace("__raw", "[^a-z0-9]", "")
                    .alias("tok"))
            .filter(F.col("tok") != ""))
    freq = (toks.groupBy("tok")
            .agg(F.count(F.lit(1)).cast("long").alias("freq")))
    tot = freq.agg(F.sum("freq").cast("long").alias("n"))
    top = freq.orderBy(F.desc("freq"), "tok").limit(k)
    w = Window.orderBy(F.desc("freq"), "tok")
    return (top.withColumn("rank",
                           F.row_number().over(w).cast("long"))
            .crossJoin(F.broadcast(tot))
            .select("tok", "rank", "freq",
                    F.expr("freq * 1000000 div n").cast("long")
                    .alias("share_ppm"),
                    F.expr("freq * rank * 1000000 div n").cast("long")
                    .alias("zipf_c_ppm")))


# The classic UTF-8-read-as-Windows-1252 damage signatures, DERIVED
# (not pasted -- several contain C1-range characters no editor shows):
# each intended character, encoded to UTF-8 and mis-decoded as
# cp1252, yields the digraph a damaged document actually carries
# (e -> 'A~(c)'-style pairs, smart punctuation -> 'a EUR ...' runs,
# NBSP -> the 'A ' pair).  Shared verbatim by both engines -- the
# oracle SQL is generated from this same table, so matching is pure
# literal string arithmetic with no regex dialect in play.
MOJIBAKE_SOURCE = ("\u00e9", "\u00e8", "\u00e4", "\u00f6",
                   "\u00fc", "\u00f1", "\u00e7", "\u2019",
                   "\u201c", "\u2013", "\u00a0")
MOJIBAKE_DIGRAPHS = tuple(
    c.encode("utf-8").decode("cp1252") for c in MOJIBAKE_SOURCE)
REPLACEMENT_CHAR = "\ufffd"


def _lit_count_sql(text_col: str, s: str) -> str:
    """occurrences of literal s in text_col as pure string
    arithmetic: (len(t) - len(replace(t, s, ''))) / len(s).
    DuckDB-dialect helper (consumed only by the oracle generator):
    DuckDB standard single-quoted strings treat backslash literally,
    so doubling it here would miscount -- only the single quote is
    escaped, and backslash-bearing signatures are rejected outright
    rather than silently double-escaped."""
    if "\\" in s:
        raise ValueError("backslash-bearing literal would be "
                         "miscounted by the DuckDB oracle dialect")
    lit = s.replace("'", "''")
    return (f"(length({text_col}) - length(replace({text_col}, "
            f"'{lit}', ''))) // {len(s)}")


def mojibake_audit(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Encoding-damage audit (E223) -- the mojibake detector a
    curation pipeline runs before language ID and tokenization
    (double-encoded UTF-8 shreds both): per document the count of
    U+FFFD replacement characters (a decoder already gave up) and of
    the classic UTF-8-read-as-cp1252 signatures (the
    :data:`MOJIBAKE_DIGRAPHS` table, shared verbatim with the
    oracle), plus the verdict.

    Determinism discipline: matching is LITERAL -- occurrences
    counted as ``(len(t) - len(replace(t, s, ''))) div len(s)``,
    pure string arithmetic identical in any engine; regex character
    classes over non-ASCII are exactly where Java-regex and RE2
    dialects diverge, so none are used.

    -> ``(doc_id, n_replacement, n_digraphs, damaged)``.

    Scale shape: ONE codegen'd projection -- no shuffle, no join, no
    Python; a 10^10-doc table pays exactly its scan.

    Reference analog: ToValidUTF8 sanitizes silently
    (linkstorage.go UTF-8 scrub; canon.py:298-309 twin); this audit
    COUNTS what sanitizing would destroy; engine extension (SURVEY
    2.10 E223).
    """
    def cnt(s: str):
        lit = s.replace("\\", "\\\\").replace("'", "\\'")
        return F.expr(f"(length({text_col}) - length(replace("
                      f"{text_col}, '{lit}', ''))) div {len(s)}")

    n_rep = cnt(REPLACEMENT_CHAR).cast("long")
    n_dig = None
    for d in MOJIBAKE_DIGRAPHS:
        term = cnt(d)
        n_dig = term if n_dig is None else (n_dig + term)
    return docs.select(
        F.col(id_col), n_rep.alias("n_replacement"),
        n_dig.cast("long").alias("n_digraphs")).withColumn(
        "damaged",
        (F.col("n_replacement") + F.col("n_digraphs")) > 0)
