"""Unit tests for greedy MMR selection (``operators/mmr.py``)."""

from __future__ import annotations

from image_matadata_batchprocessing_aws_spark.operators.mmr import MMR_Q, mmr_select


def _q(vec):
    return [round(x * MMR_Q) for x in vec]


def test_mmr_skips_near_duplicate_of_first_pick(spark):
    # ids 1 and 2 are near-identical and most relevant; id 3 is
    # orthogonal to them with relevance 0.6.  Pure relevance picks
    # (1, 2); at lambda 0.7 the round-2 scores are
    # 7*0.98 - 3*0.98 = 3.92 for the near-dup vs 7*0.6 - 0 = 4.2 for
    # the orthogonal doc, so MMR must pick (1, 3).
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.98, 0.19, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    picks = mmr_select(df, "vec_id", "embedding", _q([1.0, 0.0, 0.6]), k=2)
    assert [p["id"] for p in picks] == [1, 3]


def test_mmr_round1_is_pure_relevance_with_id_tiebreak(spark):
    rows = [(1, [0.5, 0.5]), (2, [0.5, 0.5]), (3, [0.1, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    picks = mmr_select(df, "vec_id", "embedding", _q([1.0, 1.0]), k=1)
    assert picks[0]["id"] == 1  # tie between 1 and 2 breaks on id
    assert picks[0]["rank"] == 1


def test_mmr_score_is_integer_identity(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    picks = mmr_select(df, "vec_id", "embedding", _q([1.0, 0.0]), k=2)
    # rel(1) = 1e6 exactly -> score10 = 7e6; round 2: rel(2)=0,
    # sim(2,1)=0 -> score10 = 0
    assert picks[0]["score10"] == 7 * 10**6
    assert picks[1] == {"rank": 2, "id": 2, "score10": 0}
