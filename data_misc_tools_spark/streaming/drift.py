"""Streaming drift monitor: windowed bin censuses against FIXED
reference-quantile edges, plus the batch post-step that turns the
streamed censuses into per-window PSI terms.

Deployment story: `operators.profile.reference_edges` computes the
edges ONCE at reference-build time (a versioned, bounded artifact);
the stream bins each event against that literal list — a map-side
expression, so the only streaming state is the windowed count
aggregate. PSI itself (the cross-bin formula) runs as a batch query
over the sink table, where all of a window's bins are visible —
per-window terms equal `profile.psi_report` on the same slice exactly
(pinned in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drift_bins_stream(
    events: DataFrame,
    edges: list,
    value_col: str = "x",
    ts_col: str = "ts",
    window_duration: str = "1 day",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Windowed bin-census stream: one (window_start, bin, n) row per
    closed event-time window — append mode, so a window emits exactly
    once when the watermark passes it (availableNow replay closes
    every window except the last, the zscore_stream caveat). Binning
    is the same Σ(x > edge) expression psi_report uses, over the
    FIXED edge list — no per-batch recompute, no extra state.
    """
    if not edges:
        raise ValueError("need at least one bin edge")
    b = F.lit(0).cast("long")
    for e in edges:
        b = b + (F.col(value_col) > F.lit(int(e))).cast("long")
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            b.alias("bin"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"), "bin", "n")
    )


def psi_from_bin_counts(
    cur_counts: DataFrame,
    ref_counts: DataFrame,
    n_bins: int,
) -> DataFrame:
    """Batch post-step over the streamed sink: per (window_start,
    bin), the Laplace-smoothed PSI term vs the reference censuses —
    the EXACT integer form of `profile.psi_report` (cross-multiplied
    D·L with per-quantity e6 logs, half-up), so for any single window
    the terms match a batch psi_report of that slice bit-for-bit.

    ``cur_counts``: (window_start, bin, n) — the drift_bins_stream
    sink. ``ref_counts``: (bin, n) — the reference binned against the
    SAME edges. ``n_bins`` must be len(edges)+1 (psi_report's B).

    Bins absent on one side within a window still contribute (the
    full-join + smoothing semantics); bins absent on BOTH sides
    contribute nothing — identical to psi_report, which also never
    sees an empty-on-both-sides bin.
    """
    # rename the grid keys: the grid and the live counts both descend
    # from cur_counts, and a full join on shared lineage trips the
    # conflicting-attributes resolver
    wins = (
        cur_counts.select("window_start").distinct()
        .select(F.col("window_start").alias("ws"))
    )
    ref_n = ref_counts.selectExpr("bin AS rbin", "n AS ref_n")
    cur_n = cur_counts.selectExpr("window_start", "bin", "n AS cur_n")
    grid = (
        wins.crossJoin(F.broadcast(ref_n))
        .join(
            cur_n,
            (F.col("ws") == F.col("window_start"))
            & (F.col("rbin") == F.col("bin")),
            "full",
        )
        .select(
            F.coalesce("ws", "window_start").alias("window_start"),
            F.coalesce("rbin", "bin").alias("bin"),
            F.coalesce("ref_n", F.lit(0).cast("long")).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0).cast("long")).alias("cur_n"),
        )
    )
    tot = (
        grid.groupBy("window_start")
        .agg(F.sum("cur_n").cast("long").alias("nc"))
        .crossJoin(
            F.broadcast(
                ref_counts.agg(F.sum("n").cast("long").alias("nr"))
            )
        )
    )
    e6ln = (
        lambda e: F.round(F.log(e.cast("double")) * 1e6).cast("long")
    )  # noqa: E731
    b = int(n_bins)
    j = grid.join(F.broadcast(tot), "window_start")
    # decimal-first smoothed products, mirroring batch psi_report:
    # the BIGINT multiply wraps at ~3e9-row slices.
    a_num = (F.col("ref_n") + 1).cast("decimal(38,0)") * (F.col("nc") + b)
    b_num = (F.col("cur_n") + 1).cast("decimal(38,0)") * (F.col("nr") + b)
    return j.select(
        "window_start", "bin", "ref_n", "cur_n",
        F.expr("(2 * 1000000 * ref_n + nr) div (2 * nr)")
        .cast("long")
        .alias("ref_share_e6"),
        F.expr("(2 * 1000000 * cur_n + nc) div (2 * nc)")
        .cast("long")
        .alias("cur_share_e6"),
        (
            (a_num - b_num).cast("decimal(38,0)")
            * (e6ln(a_num) - e6ln(b_num))
        ).alias("__num"),
        ((F.col("nr") + b).cast("decimal(38,0)") * (F.col("nc") + b)).alias(
            "__den"
        ),
    ).selectExpr(
        "window_start", "bin", "ref_n", "cur_n",
        "ref_share_e6", "cur_share_e6",
        "cast((2 * __num + __den) div (2 * __den) as long) AS term_e6",
    ).orderBy("window_start", "bin")
