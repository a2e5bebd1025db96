"""Link extraction from interleaved span documents (operator S5).

Replaces the reference's goquery ``a[href]`` walk
(/root/reference/pkg/linkprocessor/linkprocessor.go:128-168) over the
span-document shape (BASELINE.json input_hint): link-bearing spans in
``offset`` order are the anchors; ``media_ref`` is the href as found
(absolute, relative, or malformed), ``text`` the anchor text.

Spark-first: ``posexplode`` preserves array order (the document order
invariant O2), the href resolution + admission runs in ONE vectorized
pandas UDF (canonicalize_resolve_udf), everything else stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon import canonicalize_resolve_udf


def extract_links(fetched: DataFrame, id_col: str = "page_id",
                  base_col: str = "url", spans_col: str = "spans",
                  carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """fetched: one row per expandable page with its spans array.

    Returns one row per admissible extracted link:
    (<id_col>, <carry_cols...>, link_index, anchor_text, canon struct).
    Malformed hrefs are dropped (linkqueue.go:55-60); inadmissible
    targets are dropped (ScrapeDaTing at linkprocessor.go:155).
    """
    keep = [id_col, base_col, *carry_cols]
    links = (
        fetched.select(*keep, F.posexplode(spans_col).alias("link_index", "span"))
        .filter(F.col("span.kind") == "link")
        .select(*keep,
                F.col("link_index"),
                F.col("span.text").alias("anchor_text"),
                F.col("span.media_ref").alias("href"))
    )
    canon = canonicalize_resolve_udf()
    links = links.withColumn("canon", canon(F.col("href"), F.col(base_col)))
    return links.filter(
        F.col("canon.page_id").isNotNull() & F.col("canon.admissible"))
