"""Stream-stream interval join: click-to-impression attribution.

The one Structured Streaming building block the other modules don't
cover: joining TWO unbounded streams. The canonical web-serving shape is
attribution — a click event joins the impression (view) that preceded it
within an attribution window. Spark's stream-stream inner join requires
(1) watermarks on both sides, so state for rows that can no longer match
is evicted, and (2) a time-range join condition, so the planner can
bound how long each side's rows are retained (docs: Structured Streaming
programming guide, stream-stream joins — public API).

State bound: each impression is retained for exactly the attribution
window past the watermark; each click only until the watermark passes it.
At 10^9 events/day this is the difference between a join that runs
forever and one whose state is O(window × rate).

Batch equivalence: the same join expression on static frames is a plain
inner join — the stream==batch pytest pins it (identical output rows on
a drained stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_attribution(
    impressions: DataFrame,
    clicks: DataFrame,
    window_s: int = 600,
    imp_watermark: str = "20 minutes",
    click_watermark: str = "10 minutes",
) -> DataFrame:
    """Attribute each click to every impression by the same user within
    the preceding ``window_s`` seconds (inclusive bounds; a click at the
    impression instant attributes). Works identically on streaming and
    static frames — watermarks are applied only when the input is a
    stream (``isStreaming``), so the batch oracle path shares this exact
    function.

    Inputs: impressions (user_id, ts, imp_id), clicks (user_id, ts,
    click_id). Returns (user_id, imp_id, click_id, imp_ts, click_ts,
    lag_s) — lag_s integer seconds from impression to click.
    """
    imp = impressions
    clk = clicks
    if imp.isStreaming:
        imp = imp.withWatermark("ts", imp_watermark)
    if clk.isStreaming:
        clk = clk.withWatermark("ts", click_watermark)
    imp = imp.select(
        F.col("user_id").alias("i_user"),
        F.col("ts").alias("imp_ts"),
        "imp_id",
    )
    clk = clk.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        "click_id",
    )
    joined = imp.join(
        clk,
        (F.col("i_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (
            F.col("click_ts")
            <= F.col("imp_ts") + F.expr(f"INTERVAL {int(window_s)} SECONDS")
        ),
        "inner",
    )
    return joined.select(
        F.col("i_user").alias("user_id"),
        "imp_id",
        "click_id",
        "imp_ts",
        "click_ts",
        (
            (F.unix_micros("click_ts") - F.unix_micros("imp_ts"))
            / F.lit(1_000_000)
        ).cast("long").alias("lag_s"),
    )
