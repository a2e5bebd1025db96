"""web_graph_spark — a PySpark-native crawl/analytics engine.

A from-scratch rebuild (NOT a port) of the query and data-processing
capabilities of the reference crawler (jamesjarvis/web-graph, a Go +
PostgreSQL system at /root/reference), re-expressed Spark-first:

* DataFrame/SQL plans optimized by Catalyst + AQE (joins, pruning,
  skew handling are declared, not hand-scheduled);
* vectorized pandas/Arrow UDFs only where built-in functions cannot
  express the semantics (URL parsing, per-partition cuckoo filters);
* a driver-side wave loop (Structured-Streaming-style batch
  iteration) over parquet/Iceberg-layout tables with per-wave
  checkpoints, frontier lineage, and metrics.

Package map:
  canon        URL canonicalization + page identity (the keystone)
  oracle       pure-Python reference-crawl simulator (test oracle)
  fixtures     deterministic synthetic web generator (FIXTURES.md)
  webgen       derives a deterministic web graph from the sf testdata
  storage      parquet-backed table catalog w/ snapshot manifests
  crawler      the crawl wave loop (frontier -> fetch -> extract -> sink)
  operators/   extraction, dedupe (bloom/cuckoo/anti-join), politeness
  functions/   text analysis, near-dup dedup, similarity search, media
  streaming/   Structured Streaming ingestion of crawl events
  plans        physical-plan assertions (broadcast, pushdown) for tests
"""

__version__ = "0.1.0"
