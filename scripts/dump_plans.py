"""Dump the formatted physical plan of EVERY driver-contract query to
BENCH/plans/<name>.txt and audit the whole set for scale anti-patterns.

Run:  python scripts/dump_plans.py [--sf DIR]

The audit is the mechanical version of the per-round "anti-pattern
sweep": for each query's final plan it records any occurrence of

* ``CartesianProduct``            — all-pairs; never acceptable
* ``BroadcastNestedLoopJoin``     — unbounded probe; allowlisted only
                                    where a tiny literal side is proven
* ``Exchange SinglePartition``    — one-task convergence; allowlisted
                                    only for 1-row global aggregates
* Python stages (``ArrowEvalPython`` / ``BatchEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``) — allowlisted only for
  operators whose semantics genuinely need Python (media decode, PQ
  distance tables, signature bit-votes)

Exit code is non-zero when a pattern appears OUTSIDE its allowlist, so
the sweep can gate a round.  The allowlists are documented inline —
every entry names WHY the shape is safe at 10^10 rows.

Note: building a query's DataFrame may run driver-side preparation
(codebook training on a capped sample, iterative graph rounds); this
script therefore runs at sf0.001 by default — the PLAN shapes are
scale-invariant, only the data volume changes.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (query, pattern) pairs that are DELIBERATE, with the scale argument.
ALLOW: dict[tuple[str, str], str] = {
    # brute-force ANN baseline: the query side is 5 literal rows,
    # broadcast; the scan side streams once.  This is the recall
    # yardstick the approximate tiers are certified against, not a
    # scale path (ann_lsh/ivf/pq/ivfpq are).
    ("ann_cosine_topk", "BroadcastNestedLoopJoin"):
        "5-row broadcast query side; deliberate exact baseline",
    # embed_near_dup exact tier inside the contract query joins the
    # tiny (≤5-row) sampled probe set the same way.
    ("embed_semdedup", "BroadcastNestedLoopJoin"):
        "centroid dim is k rows (k=8), broadcast by construction",
    # 1-row global aggregates: a single output row must land on one
    # task; input to the final exchange is the per-partition partials
    # (bytes), not the relation.
    ("graph_counts", "Exchange SinglePartition"):
        "1-row COUNT aggregate; partial aggs upstream",
    ("corpus_pack_sequences", "Exchange SinglePartition"):
        "global running prefix-sum boundary: per-partition totals "
        "(1 row each) only; the row stream itself is range-partitioned",
    # Cross joins whose build side is a 1-row aggregate (IdentityBroad-
    # castMode over a single count/total row) — constant-size build at
    # any input scale:
    ("graph_counts", "BroadcastNestedLoopJoin"):
        "count(pages) x count(links): both sides 1-row HashAggregates",
    ("text_search_topk", "BroadcastNestedLoopJoin"):
        "1-row corpus-stats dim (N docs) joined onto the tf scan",
    ("text_bm25_topk", "BroadcastNestedLoopJoin"):
        "1-row corpus-stats dim (N/T/df) joined onto the tf+dl scan",
    ("text_keyphrases", "BroadcastNestedLoopJoin"):
        "1-row doc-count dim crossed onto the bigram tf rows",
    ("graph_modularity", "BroadcastNestedLoopJoin"):
        "1-row m_edges aggregate crossed onto the per-community rows",
    ("graph_conductance", "BroadcastNestedLoopJoin"):
        "the same 1-row 2m dim crossed onto the per-community rows "
        "(shares E86's aggregate shapes)",
    ("graph_conductance", "Exchange SinglePartition"):
        "the same 1-row m_edges aggregate; partial counts upstream",
    ("corpus_importance", "BroadcastNestedLoopJoin"):
        "two 1-row bucket-total dims (raw/target gram counts)",
    ("corpus_zonemap_audit", "BroadcastNestedLoopJoin"):
        "file-stats dim x predicate dim (dozens of rows each); the "
        "fact rows are aggregated to per-file min/max before the cross",
    ("corpus_zonemap_audit", "Exchange SinglePartition"):
        "1-row exact-selectivity totals; partial aggs upstream",
    ("crawl_slot_assign", "Exchange SinglePartition"):
        "global snake rank runs over the per-host WEIGHT DIM (one "
        "row per host, post-aggregation), never the fetch stream",
    ("embed_cluster_eval", "BroadcastNestedLoopJoin"):
        "four 1-row stat dims (index/purity/row-sums/col-sums over "
        "the k x labels contingency) crossed together",
    ("embed_cluster_eval", "Exchange SinglePartition"):
        "the same 1-row contingency folds; the k x labels dim is "
        "bounded by construction",
    ("graph_degree_mixing", "Exchange SinglePartition"):
        "cumulative window over the DEGREE-CLASS dim (bounded by "
        "max degree), never the vertex or edge stream",
    ("graph_motifs", "BroadcastNestedLoopJoin"):
        "three 1-row census aggregates (degree fold, triangle sum, "
        "4-cycle sum) crossed together",
    ("graph_motifs", "Exchange SinglePartition"):
        "the same 1-row global sums; partials upstream",
    ("graph_diameter", "BroadcastNestedLoopJoin"):
        "the 1-row (diameter_lb, n_reached) summary dim broadcast "
        "onto the bounded per-level histogram",
    ("graph_diameter", "Exchange SinglePartition"):
        "the same 1-row global max/count aggregate; partials "
        "upstream",
    ("dedup_mix_shift", "BroadcastNestedLoopJoin"):
        "two 1-row corpus-total dims (before/after) broadcast onto "
        "the |sources| fold",
    ("dedup_mix_shift", "Exchange SinglePartition"):
        "the same 1-row totals; partials upstream",
    ("docs_mm_pack_sweep", "Exchange SinglePartition"):
        "four 1-row per-budget corpus totals (union of global "
        "aggregates); partials upstream",
    ("tpch_q11", "BroadcastNestedLoopJoin"):
        "1-row (total, n_parts) scalar dim crossed onto the per-part "
        "value fold",
    ("tpch_q11", "Exchange SinglePartition"):
        "the same 1-row global total; partial sums upstream",
    ("tpch_q14", "Exchange SinglePartition"):
        "Q14 IS a 1-row report (promo share); partial conditional "
        "sums upstream",
    ("tpch_q15", "Exchange SinglePartition"):
        "ties-kept max via rank over the ALREADY-AGGREGATED supplier "
        "dim (|suppliers| rows), never the lineitem stream",
    ("tpch_q17", "Exchange SinglePartition"):
        "Q17 IS a 1-row report (small-quantity revenue); partial "
        "sums upstream",
    ("tpch_q19", "Exchange SinglePartition"):
        "Q19 IS a 1-row report (three-basket revenue); partial sums "
        "upstream",
    ("tpch_q22", "BroadcastNestedLoopJoin"):
        "1-row positive-balance average crossed onto the customer "
        "dim filter",
    ("tpch_q22", "Exchange SinglePartition"):
        "the same 1-row average; partial sums upstream",
    ("tpch_q8", "Exchange SinglePartition"):
        "1-row-per-year conditional totals; partial sums upstream",
    ("crawl_fairness_index", "Exchange SinglePartition"):
        "two 1-row Jain-index aggregates (host dim, 4-row shard dim) "
        "unioned; partials upstream",
    ("crawl_seen_sizing", "BroadcastNestedLoopJoin"):
        "1-row distinct-count scalar crossed with the 3-row fpp "
        "literal dim",
    ("crawl_seen_sizing", "Exchange SinglePartition"):
        "the same 1-row global distinct count; partials upstream",
    ("events_new_users", "Exchange SinglePartition"):
        "cumulative window over the DAY DIM (bounded by |days|), "
        "never the event stream (the degree-mixing discipline)",
    ("embed_binary_hamming", "BroadcastNestedLoopJoin"):
        "5-row broadcast query-code side (the ann_cosine_topk "
        "baseline shape); at scale the code column becomes a "
        "high-bit bucket key and the probe prunes to a Hamming ball",
    ("embed_reciprocal_nn", "BroadcastNestedLoopJoin"):
        "deliberate exact all-pairs tier (the certification baseline "
        "for the bucketed-LSH mutual-NN path, the embed_near_dup "
        "pattern); the rank<=k cut makes the mutual join O(N*k)",
    ("graph_degree_gini", "BroadcastNestedLoopJoin"):
        "two 1-row totals (|V|, Σc) crossed to derive the zero-"
        "degree class",
    ("graph_degree_gini", "Exchange SinglePartition"):
        "cumulative window + final fold over the DEGREE-CLASS dim "
        "(bounded by max degree) and 1-row aggregates; never the "
        "vertex or edge stream (the degree-mixing discipline)",
    ("graph_edge_cut", "BroadcastNestedLoopJoin"):
        "1-row edge total crossed onto the n_shards^2-bounded matrix",
    ("graph_edge_cut", "Exchange SinglePartition"):
        "the same 1-row total; partial counts upstream",
    ("docs_span_transitions", "BroadcastNestedLoopJoin"):
        "1-row transition total crossed onto the 4-row matrix",
    ("docs_span_transitions", "Exchange SinglePartition"):
        "the same 1-row total; partial counts upstream",
    ("embed_label_margin", "BroadcastNestedLoopJoin"):
        "the centroid dim is |labels| rows (10), an aggregation "
        "output broadcast onto one corpus scan",
    ("embed_sq8_recall", "BroadcastNestedLoopJoin"):
        "5-row broadcast query sides for the two exact rankings "
        "(fp32 and reconstructed) - the deliberate ann_cosine_topk "
        "evaluation shape, twice",
    ("embed_pca", "BroadcastNestedLoopJoin"):
        "the 1-row Sum(dot^2) variance dim broadcast back onto the "
        "per-vector projection stream",
    ("embed_pca", "Exchange SinglePartition"):
        "the same 1-row global variance aggregate; partial sums "
        "upstream",
    ("events_markov_stationary", "BroadcastNestedLoopJoin"):
        "the 1-row corpus-total dim broadcast onto the |types| fold",
    ("events_markov_stationary", "Exchange SinglePartition"):
        "1-row total + the pi0 row_number over the |types| dim "
        "(bounded by construction)",
    ("events_active_users", "BroadcastNestedLoopJoin"):
        "the 1-row max-day clip dim broadcast onto the offset "
        "expansion",
    ("events_active_users", "Exchange SinglePartition"):
        "the same 1-row max(day) aggregate; partials upstream",
    ("events_dispersion", "BroadcastNestedLoopJoin"):
        "the 1-row global hour-count dim broadcast onto the "
        "|types|-row fold",
    ("events_dispersion", "Exchange SinglePartition"):
        "the same 1-row distinct-hours aggregate; partials upstream",
    ("events_seasonal_index", "BroadcastNestedLoopJoin"):
        "the |types| x 24-hour densify grid: both sides are bounded "
        "aggregation outputs (types dim x a 24-row literal)",
    ("events_rfm", "BroadcastNestedLoopJoin"):
        "three 1-row quintile-cutoff dims (exact_quantiles histogram "
        "folds) crossed back onto the user dim",
    ("events_rfm", "Exchange SinglePartition"):
        "exact_quantiles' cumulative window over the VALUE-RANGE-"
        "bounded metric histograms (days/counts/cents bins), never "
        "the user or event stream",
    ("events_outages", "Exchange SinglePartition"):
        "lag window over the distinct ACTIVE-BUCKET dim — bounded by "
        "timespan/grain, never event count (the stream collapses to "
        "buckets in a uniform-key agg first)",
    ("crawl_reach_curve", "BroadcastNestedLoopJoin"):
        "1-row corpus-total dim crossed onto the <=64-row depth dim",
    ("crawl_reach_curve", "Exchange SinglePartition"):
        "cumulative window + total over the <=64-row depth dim "
        "(bounded by max_depth at any corpus size)",
    ("events_abtest", "Exchange SinglePartition"):
        "the 1-row 2x2 cell fold (a/b/c/d sums; per-user partials "
        "combine map-side after the key agg)",
    ("graph_robustness", "BroadcastNestedLoopJoin"):
        "per-scenario 1-row combines: component stats x node count x "
        "edge count (constant-size builds); subgraph induction is "
        "broadcast anti-joins on the k-row removal dim",
    ("graph_robustness", "Exchange SinglePartition"):
        "the same per-scenario 1-row aggregates; partials upstream",
    ("crawl_join_plan", "BroadcastNestedLoopJoin"):
        "1-row stats/median/hot-key dims crossed together per "
        "profiled key (constant-size builds)",
    ("crawl_join_plan", "Exchange SinglePartition"):
        "cumulative window over the frequency-histogram dim (bounded "
        "by the freq VALUE RANGE, never key count) + 1-row folds",
    ("corpus_heaps", "Exchange SinglePartition"):
        "cumulative windows over the N_BINS dim (10 rows at ANY "
        "corpus size); the token stream hash-aggregates to bins "
        "map-side before the window",
    ("orders_fk_audit", "BroadcastNestedLoopJoin"):
        "per-edge 1-row combines: child-count x orphan-count x "
        "parent-stats aggregates (constant-size builds); the orphan "
        "check itself is a hash left-anti join on the key",
    ("orders_fk_audit", "Exchange SinglePartition"):
        "the same per-edge 1-row aggregates; partials upstream",
    ("ann_recall_audit", "BroadcastNestedLoopJoin"):
        "the evaluation deliberately RERUNS the exact baseline "
        "(ann_cosine_topk's allowlisted 5-row broadcast query side) "
        "to compare the IVF tier against it; the 3-row ks dim "
        "crosses onto 5-query rank rows",
    ("embed_matryoshka", "BroadcastNestedLoopJoin"):
        "5-row sampled query side broadcast against the corpus scan "
        "- same deliberate exact-baseline shape as ann_cosine_topk",
    ("events_decay_score", "BroadcastNestedLoopJoin"):
        "1-row max-hour anchor dim (IdentityBroadcastMode) crossed "
        "onto the event scan",
    ("events_decay_score", "Exchange SinglePartition"):
        "the same 1-row max(hr) global aggregate",
    ("graph_gap_audit", "Exchange SinglePartition"):
        "1-row gamma-bit totals per layout (count+sum partials "
        "upstream); output is 2 rows",
    ("text_rrf_topk", "BroadcastNestedLoopJoin"):
        "1-row corpus-stats dims inside the nested tf-idf/BM25 "
        "rankings (their own allowlisted shape)",
    ("text_rrf_topk", "Exchange SinglePartition"):
        "fuse rank over the <=40-row union of two top-20 lists",
    ("text_vocab_drift", "BroadcastNestedLoopJoin"):
        "two 1-row token-total dims (slice a / slice b) crossed "
        "onto the per-token chi rows",
    ("text_vocab_drift", "Exchange SinglePartition"):
        "the same 1-row totals aggregates",
    ("corpus_packing_sweep", "Exchange SinglePartition"):
        "per-budget 1-row corpus totals (partials upstream) plus "
        "pack_sequences' documented global-window small path",
    ("corpus_packing_sweep", "python"):
        "pack_sequences' 10^10-safe prefix-sum path (mapInPandas "
        "running sum after range partition) — deliberate scale path",
    ("corpus_pps_sample", "python"):
        "the same pack_sequences prefix-sum mapInPandas stage the "
        "sampler rides (E169 docstring)",
    ("corpus_pps_sample", "BroadcastNestedLoopJoin"):
        "1-row total-weight dim crossed onto the cumulative rows",
    ("corpus_pps_sample", "Exchange SinglePartition"):
        "the same 1-row sum(weight) global aggregate",
    ("crawl_wfq_order", "python"):
        "ordered_seq's range-partitioned dense-rank path (mapInPandas "
        "assign stage) — the no-single-reducer global numbering",
    ("crawl_connection_plan", "python"):
        "inherits the WFQ chain's ordered_seq assign stage",
    ("graph_opic", "BroadcastNestedLoopJoin"):
        "1-row dangling-mass (virtual page) aggregate crossed back "
        "onto the vertex state each round — the OPIC D div n share",
    ("graph_opic", "Exchange SinglePartition"):
        "the same 1-row dangling-cash aggregate (partials upstream)",
    ("text_hashed_classifier", "BroadcastNestedLoopJoin"):
        "weight-dim SYNTHESIS: 256-bucket dim x the labels literal "
        "(|L| rows) — bounded by B*L by construction; the corpus "
        "join itself is a BroadcastHashJoin on the bucket key",
    ("text_retrieval_eval", "BroadcastNestedLoopJoin"):
        "1-row corpus-stats dims (N/T/df) crossed onto the tf scans "
        "— the allowlisted text_bm25_topk shape, once per query term",
    ("text_retrieval_eval", "Exchange SinglePartition"):
        "the same 1-row corpus-stats aggregates (count/sum partials "
        "upstream), once per query term",
    ("crawl_drain_plan", "Exchange SinglePartition"):
        "cumulative windows over the MAKESPAN-sized wave dim "
        "(<=100 rows however large the frontier)",
    ("crawl_shard_skew", "BroadcastNestedLoopJoin"):
        "1-row totals dim crossed onto the n_shards-row audit rows",
    ("crawl_shard_skew", "Exchange SinglePartition"):
        "1-row SUM(n_rows) totals aggregate; partials upstream",
    ("dedup_blocking_quality", "BroadcastNestedLoopJoin"):
        "three 1-row metric dims (base/truth/found) crossed together",
    ("dedup_blocking_quality", "Exchange SinglePartition"):
        "three 1-row aggregates (closed-form block algebra, truth "
        "count, found count); partials upstream",
    ("graph_assortativity", "Exchange SinglePartition"):
        "1-row moment fold (n/Sx/Sy/Sxy/Sxx/Syy partials upstream)",
    ("events_division", "BroadcastNestedLoopJoin"):
        "required = keys x the 7-row broadcast divisor dim — the "
        "textbook double-negation division plan; divisor is bounded "
        "by definition (a FOR-ALL set), facts join hash-only",
    ("events_ams_f2", "BroadcastNestedLoopJoin"):
        "1-row sketch-median dim crossed onto the 1-row exact dim",
    ("events_ams_f2", "Exchange SinglePartition"):
        "k-row counter dim re-aggregations and two 1-row folds; the "
        "per-estimator partial sums combine map-side before them",
    ("orders_benford", "BroadcastNestedLoopJoin"):
        "1-row total-count dim crossed onto the 9-digit dim",
    ("orders_benford", "Exchange SinglePartition"):
        "1-row total aggregate over the 9-digit dim",
    ("events_gini", "Exchange SinglePartition"):
        "cumulative window over the weight-VALUE histogram (bounded "
        "by the value range, never key count) + the 1-row final fold",
    ("corpus_skyline", "Exchange SinglePartition"):
        "running max over the x-grain dim ordered desc — bounded by "
        "the VALUE RANGE of the objective (token counts), never by "
        "row count; facts hash-agg to the dim map-side first",
    ("corpus_bigram_lm", "BroadcastNestedLoopJoin"):
        "1-row total-token dim (N) crossed onto the scored bigrams",
    ("corpus_bigram_lm", "Exchange SinglePartition"):
        "1-row total-token aggregate; partial sums upstream",
    ("corpus_kneser_ney", "BroadcastNestedLoopJoin"):
        "1-row bigram-type-total dim (T) crossed onto the scored "
        "bigrams — same shape as corpus_bigram_lm's N dim",
    ("corpus_kneser_ney", "Exchange SinglePartition"):
        "the same 1-row type-count aggregate; partial counts upstream",
    ("corpus_perplexity", "BroadcastNestedLoopJoin"):
        "1-row model-total and 1-row doc-count dims crossed onto "
        "bounded dims (≤4096-bucket model, ≤10^6-bin histogram)",
    ("corpus_perplexity", "Exchange SinglePartition"):
        "desc-cumulative tercile window over the score-bin histogram "
        "— ≤10^6 rows at ANY corpus size (bound = ppb value range / "
        "bin width, not row count); the corpus never sees it",
    ("sketch_kmv_overlap", "BroadcastNestedLoopJoin"):
        "G x G pair dim: both sides are per-GROUP aggregate outputs "
        "(one row per order priority — bounded by group-key "
        "cardinality, never by input rows); every corpus-sized "
        "stage upstream is a hash agg + WindowGroupLimit k-cut",
    ("corpus_lang_mix", "BroadcastNestedLoopJoin"):
        "1-row n_max dim crossed onto the languages-sized counts dim "
        "(not the corpus scan — that side is a broadcast hash join)",
    ("events_disorder", "python"):
        "deliberate scale path: per-key O(n log n) Fenwick inversion "
        "count in ONE applyInPandas pass over the bounded user group "
        "— the JVM alternative is the quadratic per-key pair join "
        "the ORACLE deliberately pays (E191 docstring)",
    ("crawl_bloom_fpp", "BroadcastNestedLoopJoin"):
        "per-config 1-row combines: probe-flag fold x n_bits_set x "
        "n_keys (all 1-row aggregates; the bit-set probe join itself "
        "is a BroadcastHashJoin on the <=m-row bit dim)",
    ("crawl_bloom_fpp", "Exchange SinglePartition"):
        "the same 1-row audit aggregates (count/sum partials "
        "upstream), once per (m, k) config",
    # 1-row global aggregates (the final exchange carries one partial
    # row PER UPSTREAM PARTITION — bytes at any input scale), found
    # when the formatted-plan SinglePartition detection was fixed:
    ("corpus_importance", "Exchange SinglePartition"):
        "two 1-row bucket-total aggregates (raw/target gram counts)",
    ("corpus_lang_mix", "Exchange SinglePartition"):
        "1-row n_max aggregate over the languages-sized counts dim",
    ("events_funnel", "Exchange SinglePartition"):
        "1-row funnel-stage-totals aggregate (count+sum partials)",
    ("graph_modularity", "Exchange SinglePartition"):
        "1-row m_edges aggregate; partial counts upstream",
    ("events_stream_join_audit", "Exchange SinglePartition"):
        "running-max/lag/occupancy-cumsum windows over the TRIGGER-"
        "BATCH dim (one row per arrival hour — bounded by elapsed "
        "time, never by volume; facts batch-agg map-side before it)",
    ("events_stream_join_audit", "BroadcastNestedLoopJoin"):
        "eviction-batch range join: row retention thresholds probe "
        "the wm step function — a broadcast of the time-bounded "
        "trigger-batch dim, never a fact-x-fact product",
    ("events_watermark_audit", "Exchange SinglePartition"):
        "running-max window over the TRIGGER-BATCH dim (one row per "
        "arrival hour — bounded by elapsed time, never by event "
        "volume; facts are batch-agg'd map-side before it)",
    ("text_bm25_topk", "Exchange SinglePartition"):
        "1-row corpus-stats aggregate (N/T/df partials)",
    ("text_keyphrases", "Exchange SinglePartition"):
        "1-row doc-count aggregate",
    ("text_search_topk", "Exchange SinglePartition"):
        "1-row corpus-stats aggregate",
    ("events_rollup", "Exchange SinglePartition"):
        "grand-total grain re-aggregates the day-grain dim (≤days "
        "rows); the fact stream shuffles once at the finest grain",
    # Python stages where Python is the point:
    ("media_features", "python"): "binary codec feature extraction",
    ("media_decode", "python"): "P6/WAV decode is bytes-in-Python",
    ("media_phash", "python"): "P6 parse + 8x8 average-hash is "
                               "bytes-in-Python; pairing is JVM",
    ("media_frames", "python"): "VID1 container parse + frame slice "
                                "+ per-frame aHash are bytes-in-Python",
    ("media_resize", "python"): "P6 parse + nearest-neighbor resample "
                                "is bytes-in-Python; md5 is JVM",
    ("media_aphash", "python"): "WAV PCM parse + energy-envelope hash "
                                "is bytes-in-Python; pairing is JVM",
    ("media_vad", "python"): "WAV synth + PCM frame-energy decode are "
                             "bytes-in-Python; activity flags and "
                             "segment runs are a JVM fold",
    ("dedup_minhash", "python"): "bit-vote/banding tail on hashed ints",
    ("dedup_minhash_incremental", "python"): "same minhash tail",
    ("dedup_simhash", "python"): "64-bit bit-vote tail (hashing is JVM)",
    ("ann_lsh_topk", "python"): "Arrow-batched signature projection",
    ("ann_pq_topk", "python"): "ADC lookup over m-byte codes",
    ("ann_ivfpq_topk", "python"): "ADC lookup over m-byte codes",
    ("ann_ivfpq_index_topk", "python"): "ADC lookup over m-byte codes",
    ("embed_semdedup", "python"): "centroid-assign dot products",
    ("embed_near_dup_pairs", "python"): "bucketed cosine verify",
    ("ann_cosine_topk", "python"): "vectorized cosine over array cols",
    ("ann_ivf_topk", "python"): "vectorized cosine over array cols",
    ("crawl_canonicalize", "python"): "two-tier URL canon: Arrow tier "
        "for the non-trivial tail only (JVM tier handles the bulk)",
    ("crawl_frontier_wave", "python"): "FIFO ordinal assignment: the "
        "10^10-safe range-partition + per-partition-offset MapInPandas "
        "path (frontier.py; the global-window fast path only below "
        "small_hint)",
    ("crawl_wave_cap", "python"): "take_global boundary partition: "
        "MapInPandas streams the head of ONE partition; whole "
        "partitions below the cut bypass Python entirely",
    ("crawl_robots_eval", "python"): "robots rule evaluation is an "
        "Arrow-batched broadcast UDF by design (U3; regex matching "
        "on compiled per-host rules)",
    ("corpus_pack_sequences", "python"): "distributed weighted prefix "
        "sum: per-partition offsets via MapInPandas over range-"
        "partitioned token counts (the exclusive-scan primitive)",
    ("tpch_q6", "Exchange SinglePartition"):
        "1-row global revenue sum; partial aggs upstream",
    ("corpus_profile", "Exchange SinglePartition"):
        "the whole profile is ONE aggregate row (all columns' stats "
        "at once); partial aggs upstream, the exchanged state is one "
        "row",
    ("corpus_zipf", "BroadcastNestedLoopJoin"):
        "1-row corpus-total dim (N tokens) crossed onto the top-50 "
        "head",
    ("corpus_zipf", "Exchange SinglePartition"):
        "rank window + TakeOrdered run over the LIMIT-50 head only; "
        "the vocab agg upstream stays hash-partitioned",
    ("events_autocorr", "BroadcastNestedLoopJoin"):
        "1-row hour-grid bounds dim crossed with the |types| dim to "
        "densify the calendar-sized series; the event stream itself "
        "only passes one keyed agg",
    ("events_autocorr", "Exchange SinglePartition"):
        "the same 1-row min/max hour-bounds aggregate; partials "
        "upstream",
    ("graph_spectral", "Exchange SinglePartition"):
        "per-round 1-row Rayleigh and max-normalizer aggregates over "
        "the host dim; partial aggs upstream",
    ("text_filter_agreement", "Exchange SinglePartition"):
        "the whole kappa is ONE aggregate row (2x2 contingency); "
        "partial aggs upstream",
    ("corpus_filter_funnel", "Exchange SinglePartition"):
        "retention lag window runs over the 4-row STAGE dim "
        "(post-aggregation), never the corpus",
    ("embed_triplets", "BroadcastNestedLoopJoin"):
        "anchors are the sampled mining-batch dim (vec_id % 97), "
        "broadcast by construction - the ann_cosine_topk shape",
    ("media_audio_dup", "python"):
        "WAV synthesis + container decode are the deliberate Python "
        "stages (media_vad discipline); fingerprint bits, digest, "
        "and dup grouping are JVM folds/aggs",
    ("events_count_min", "BroadcastNestedLoopJoin"):
        "1-row N-total dim crossed onto the |keys| estimate dim",
    ("events_count_min", "Exchange SinglePartition"):
        "top-k rank window over the |keys| dim post-aggregation "
        "(and the 1-row total); the event stream pays one keyed agg",
    ("embed_mips_bias", "BroadcastNestedLoopJoin"):
        "5-row broadcast probe side - the deliberate ann_cosine_topk "
        "exact shape for both rankings",
    ("embed_jl_audit", "BroadcastNestedLoopJoin"):
        "two SAMPLED vector dims (vec_id % 31 and % 37) crossed for "
        "the audit pairs; the corpus itself pays one projection scan",
    ("orders_basket_rules", "BroadcastNestedLoopJoin"):
        "1-row n_orders total dim crossed onto the bounded |brands|^2 "
        "rule dim",
    ("orders_basket_rules", "Exchange SinglePartition"):
        "the same 1-row distinct-order count; partial aggs upstream",
    ("orders_pareto", "BroadcastNestedLoopJoin"):
        "1-row (n_custs, r_total) dim crossed onto the revenue-value "
        "histogram",
    ("orders_pareto", "Exchange SinglePartition"):
        "cumulative windows over the revenue-VALUE histogram and the "
        "<=10-row decile dim (the events_gini discipline), never the "
        "customer stream",
    ("events_conversion_lag", "Exchange SinglePartition"):
        "single-group quantile fold: the cumulative window runs over "
        "the bounded lag-VALUE histogram (E74), not the user stream",
    ("events_chi2_hour", "BroadcastNestedLoopJoin"):
        "|types| x 24-hour marginal dims crossed for the dense "
        "contingency grid, plus the 1-row N total",
    ("events_chi2_hour", "Exchange SinglePartition"):
        "the same 1-row N aggregate; partials upstream",
    ("crawl_shard_rebalance", "BroadcastNestedLoopJoin"):
        "1-row total and 1-row least-loaded-shard dims crossed onto "
        "the bounded host/shard dims",
    ("crawl_shard_rebalance", "Exchange SinglePartition"):
        "the LIMIT-1 least-loaded pick and the 1-row total over the "
        "4-row shard dim; the page stream pays one host agg",
}

PY_MARKERS = ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
              "FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas")


def audit(name: str, plan: str) -> list[str]:
    hits = []
    # formatted plans render the partitioning as an "Arguments:
    # SinglePartition" detail line under the Exchange node (the
    # inline "Exchange SinglePartition" form only appears in simple
    # mode) — match both, or the one-task-convergence gate is a no-op
    pats = {"CartesianProduct": r"CartesianProduct",
            "BroadcastNestedLoopJoin": r"BroadcastNestedLoopJoin",
            "Exchange SinglePartition":
                r"Exchange SinglePartition|Arguments: SinglePartition"}
    for pat, rx in pats.items():
        if re.search(rx, plan) and (name, pat) not in ALLOW:
            hits.append(pat)
    if any(m in plan for m in PY_MARKERS) and (name, "python") not in ALLOW:
        hits.append("python-stage")
    return hits


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from web_graph_spark.plans import physical_plan
    from web_graph_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out or os.path.join(repo, "BENCH", "plans")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app="plan-sweep", cores=8, shuffle_partitions=8)
    queries = entry.queries()
    names = args.only or sorted(queries)
    report: dict[str, dict] = {}
    bad = 0
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            plan = physical_plan(df)
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            report[name] = {"error": str(exc)[:200]}
            bad += 1
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            continue
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        hits = audit(name, plan)
        report[name] = {"hits": hits}
        if hits:
            bad += 1
            print(f"FLAG  {name}: {hits}", file=sys.stderr)
        else:
            print(f"ok    {name}")
    spark.stop()

    audit_path = os.path.join(repo, "BENCH", "plan_audit.json")
    flagged = {k: v for k, v in report.items()
               if v.get("hits") or v.get("error")}
    n_queries = len(names)
    if args.only and os.path.exists(audit_path):
        # partial sweep: merge into the existing full audit rather
        # than clobbering it down to the --only subset
        with open(audit_path) as fh:
            prev = json.load(fh)
        merged = {k: v for k, v in prev.get("flagged", {}).items()
                  if k not in report}
        merged.update(flagged)
        flagged = merged
        n_queries = max(prev.get("n_queries", 0), n_queries)
    with open(audit_path, "w") as fh:
        json.dump({"sf": args.sf, "n_queries": n_queries,
                   "flagged": flagged,
                   "allowlist": {f"{q}::{p}": why
                                 for (q, p), why in ALLOW.items()}},
                  fh, indent=1, sort_keys=True)
    print(f"\n{len(names) - bad}/{len(names)} clean; "
          f"audit → BENCH/plan_audit.json")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
