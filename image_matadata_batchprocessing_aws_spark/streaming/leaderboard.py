"""Streaming Bradley-Terry leaderboard.

The live twin of the staged ``eval_bradley_terry`` batch query
(queries/r09_queue.py): pairwise preference outcomes (RLHF duels,
A/B taste tests, model-arena votes) folded into a per-pair integer win
matrix over an unbounded stream, with the two-unrolled-MM-iteration
Bradley-Terry readout closing over that matrix at any moment.

The sufficient statistics are per-(i, j) integer counts (wins of i,
games) with i < j normalized: counts are associative/commutative, so
each micro-batch folds into the carried pair table and the readout
after any stream prefix equals the batch scores over the same duels —
the ``streaming/cmh.py`` contract, tested the same way (stream ==
batch plus kill-and-restart-from-checkpoint).

Replay idempotency is structural — the ``streaming/srm.py`` /
``streaming/engagement.py`` recipe: each epoch writes merged state to
its own ``batch_id=<epoch>`` parquet partition with overwrite, and
state reads take the LATEST partition strictly before the current
epoch, so re-running an epoch after a crash reproduces identical
state.

Scale notes: state is one row per active PAIR — bounded by the
model-roster squared (leaderboards have tens of entrants, not
billions), NOT by vote traffic; the per-epoch merge is one keyed sum
on the (i, j) pair.  The MM readout runs entirely on the pair table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.streaming.sampling import (
    _read_latest_state,
)


def pair_wins(duels: DataFrame) -> DataFrame:
    """The state grain: (i, j, w, g) with i < j — wins of i over j and
    games played, from rows carrying ``pi``, ``pj`` (competitor ids,
    any orderable type) and ``i_wins`` (1 if ``pi`` won).  Works
    identically on a batch frame and a micro-batch."""
    norm = duels.select(
        F.least("pi", "pj").alias("i"),
        F.greatest("pi", "pj").alias("j"),
        F.when(
            F.col("pi") < F.col("pj"), F.col("i_wins")
        ).otherwise(1 - F.col("i_wins")).alias("w_first"),
    )
    return norm.groupBy("i", "j").agg(
        F.sum("w_first").alias("w"), F.count(F.lit(1)).alias("g")
    )


def bt_scores(pairs: DataFrame) -> DataFrame:
    """Close the leaderboard from the pair state: two unrolled
    minorization-maximization iterations from the uniform init — the
    EXACT ``eval_bradley_terry`` closing arithmetic (same symmetric
    edge list, same groupBy shapes), so the readout over merged stream
    state is bit-identical to the batch query fed the same duels."""
    sym = pairs.select(
        F.col("i").alias("m"), F.col("j").alias("o"), F.col("w").alias("wn"),
        F.col("g").alias("gn"),
    ).unionByName(
        pairs.select(
            F.col("j").alias("m"),
            F.col("i").alias("o"),
            (F.col("g") - F.col("w")).alias("wn"),
            F.col("g").alias("gn"),
        )
    )
    it1 = sym.groupBy("m").agg(
        F.sum("wn").alias("wins"), F.sum("gn").alias("games")
    ).select("m", "wins", "games", (2.0 * F.col("wins") / F.col("games")).alias("w1"))
    e1 = it1.select("m", F.col("w1").alias("w1m"), "wins", "games")
    e2 = it1.select(F.col("m").alias("o"), F.col("w1").alias("w1o"))
    it2 = (
        sym.join(e1, "m")
        .join(e2, "o")
        .groupBy("m", "wins", "games")
        .agg(F.sum(F.col("gn") / (F.col("w1m") + F.col("w1o"))).alias("__den"))
        .select("m", "wins", "games", (F.col("wins") / F.col("__den")).alias("w2"))
    )
    norm = it2.crossJoin(F.broadcast(it2.agg(F.sum("w2").alias("z"))))
    return norm.select(
        F.col("m").alias("competitor"),
        F.col("wins").cast("long").alias("wins"),
        F.col("games").cast("long").alias("games"),
        F.round(F.col("w2") / F.col("z"), 6).alias("bt_score"),
    ).orderBy("competitor")


def start_leaderboard_sink(
    duels: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    query_name: str = "bt_leaderboard",
):
    """Maintain the exact per-pair win matrix under
    ``{state_dir}/batch_id=<epoch>``; ``bt_scores`` over the latest
    partition is always the live leaderboard of every duel seen."""

    def apply(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        delta = pair_wins(df)
        prev = _read_latest_state(spark, state_dir, epoch_id, delta)
        merged = (
            prev.unionByName(delta)
            .groupBy("i", "j")
            .agg(F.sum("w").alias("w"), F.sum("g").alias("g"))
        )
        merged.write.mode("overwrite").parquet(f"{state_dir}/batch_id={epoch_id}")

    return (
        duels.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
