"""Main-content extraction (boilerplate removal) for crawled HTML.

jusText-shaped (Pomikálek 2011, "Removing boilerplate and duplicate
content from web corpora"), the content-extraction stage every web-scale
LLM corpus pipeline runs between fetch and dedup/quality filtering:

1. **Segmentation** happens in the HTML kernel (`core/htmlx.blocks`):
   block-level tag boundaries -> (block_id, text, n_chars, n_link_chars),
   driven through Spark as an Arrow-batched pandas UDF like the other
   parse paths (UDF only because HTML parsing is genuinely not
   expressible in Catalyst).
2. **Classification is pure Catalyst** over the block table — the part
   that runs at 10^10-block scale. Context-free pass: link density
   (n_link_chars/n_chars) > max_link_density -> bad; long + stopword-rich
   -> good; tiny -> short; else near-good. Context-sensitive pass
   (jusText's neighbor vote) is two window functions over (doc, block
   order): near-good needs ONE decided neighbor good, short needs BOTH;
   missing neighbors default bad. One doc_id shuffle total, reused by
   both window directions; every density/threshold comparison is a
   ratio of integers, so the labels are engine-exact.
3. **Extraction** reassembles the good blocks in order (one
   map-side-combinable aggregate).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# pinned minimal stopword list (classification input, not linguistics)
STOPWORDS = ("the", "of", "and", "a", "to", "in", "is", "it")

_BLOCK_SCHEMA = (
    "doc_id long, block_id long, text string, n_chars long, n_link_chars long"
)


def block_stats(
    docs: DataFrame, html_col: str = "body", id_col: str = "doc_id"
) -> DataFrame:
    """HTML -> per-block rows via the htmlx kernel (Arrow-batched)."""
    import pandas as pd

    cols = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(html_col).alias("__html")
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from see_spark.core import htmlx

        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["__html"]):
                for bid, text, n_chars, n_link in htmlx.blocks(html or ""):
                    rows.append((doc_id, bid, text, n_chars, n_link))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "block_id", "text", "n_chars", "n_link_chars"],
            )

    return cols.mapInPandas(run, schema=_BLOCK_SCHEMA)


def classify_blocks(
    blocks: DataFrame,
    max_link_density: float = 0.4,
    length_low: int = 5,
    length_high: int = 20,
    stopword_density: float = 0.3,
) -> DataFrame:
    """Label each block good/bad. Input: (doc_id, block_id, text, n_chars,
    n_link_chars); word/stopword counts derive from the text in Catalyst.
    Appends n_words, n_stopwords, ctx_label (context-free), label
    (final)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    b = blocks.withColumn("n_words", F.size(toks).cast("long")).withColumn(
        "n_stopwords",
        F.size(
            F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS))
        ).cast("long"),
    )
    link_density = F.when(
        F.col("n_chars") > 0,
        F.col("n_link_chars").cast("double") / F.col("n_chars").cast("double"),
    ).otherwise(F.lit(1.0))
    stop_density = F.when(
        F.col("n_words") > 0,
        F.col("n_stopwords").cast("double") / F.col("n_words").cast("double"),
    ).otherwise(F.lit(0.0))
    b = b.withColumn(
        "ctx_label",
        F.when(link_density > max_link_density, "bad")
        .when(
            (F.col("n_words") >= length_high) & (stop_density >= stopword_density),
            "good",
        )
        .when(F.col("n_words") < length_low, "short")
        .otherwise("neargood"),
    )
    decided = F.when(F.col("ctx_label").isin("good", "bad"), F.col("ctx_label"))
    w = Window.partitionBy("doc_id").orderBy("block_id")
    prev = F.last(decided, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = F.first(decided, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    prev_good = F.coalesce(prev, F.lit("bad")) == "good"
    next_good = F.coalesce(nxt, F.lit("bad")) == "good"
    return b.withColumn(
        "label",
        F.when(F.col("ctx_label").isin("good", "bad"), F.col("ctx_label"))
        .when(
            F.col("ctx_label") == "neargood",
            F.when(prev_good | next_good, "good").otherwise("bad"),
        )
        .otherwise(F.when(prev_good & next_good, "good").otherwise("bad")),
    )


def extract_content(
    docs: DataFrame, html_col: str = "body", id_col: str = "doc_id", **thresholds
) -> DataFrame:
    """HTML -> (doc_id, content, n_good_blocks, n_blocks): the good blocks
    joined with '\\n' in document order — the de-boilerplated text a
    training pipeline feeds to dedup/quality stages."""
    labeled = classify_blocks(block_stats(docs, html_col, id_col), **thresholds)
    return labeled.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("label") == "good",
                            F.struct("block_id", "text"),
                        )
                    )
                ),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("content"),
        F.sum((F.col("label") == "good").cast("long")).alias("n_good_blocks"),
        F.count("*").cast("long").alias("n_blocks"),
    )
