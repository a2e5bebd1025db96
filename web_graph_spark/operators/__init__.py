"""Crawl-loop operators (SURVEY.md §2), each Spark-first:

frontier    deterministic dense sequence assignment (no global window)
extract     span-document link extraction (S5) via posexplode + UDF
politeness  per-host budget scheduling (O4) via window group-limit
dedupe      seen-set membership: anti-join + bloom/cuckoo pre-filters
robots      broadcast robots.txt prefix rules, vectorized evaluation
recrawl     freshness re-visit scheduling from observed change rates,
            crawl snapshot diff (added/removed/changed)
backoff     adaptive per-host budgets from observed fetch outcomes
sitemap     Sitemap: directive + sitemaps.org <loc> ingestion
graph_algos CC, PageRank, HITS, triangles, BFS depths, label-prop
"""
