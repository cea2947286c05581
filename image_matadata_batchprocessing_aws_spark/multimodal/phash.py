"""Perceptual-hash (dHash) image near-duplicate detection.

The LLM-curation counterpart of the text near-dup stack
(``operators/dedup.py``) for the image modality: a 64-bit
difference hash per image (gray -> exact-area 8x9 downsample ->
left<right comparisons), then Hamming-distance grouping via banded
LSH — never an all-pairs scan.

Pipeline shape (all house rules):

- ``image_dhash`` — Arrow ``mapInPandas``: real byte-level decode
  (``multimodal/codecs.py``), channel-mean gray, exact area-weighted
  downsample (the fractional-coverage equivalent of OpenCV INTER_AREA,
  so block means are closed forms for divisible fixture dims), 8x8
  comparison bits packed row-major into two non-negative 32-bit halves
  (``hash_hi`` = rows 0-3, ``hash_lo`` = rows 4-7) — BIGINT-safe in
  both engines, no unsigned-64 sign pitfalls.  Per-row
  ``hash_error`` isolation.
- ``dhash_near_pairs`` — banded candidate join: each half splits into
  3 bands (11+11+10 bits) = 6 bands total; by pigeonhole any pair
  within Hamming distance t <= 5 shares at least one exact band, so
  recall at the default t=4 is GUARANTEED, not probabilistic.
  Candidates verify with ``bit_count(hi_a ^ hi_b) + bit_count(lo_a ^
  lo_b) <= t`` — pure JVM expressions.
- ``dhash_groups`` — one-hop min-neighbor grouping (fixture families
  are designed as cliques; for open-world data feed the pairs to
  ``operators/graph.connected_components`` instead).

Scale notes: hashing is map-side, zero shuffle; the band join shuffles
(band_id, band_val) keys only — 6 rows of a few bytes per image, never
pixels; verification touches candidate pairs only.  Skewed bands (e.g.
monochrome corpora collapsing to one hash) are the same hazard as any
LSH bucket join — cap bucket width upstream or salt, as
``operators/dedup.py`` documents for MinHash bands.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DHASH_SCHEMA = "file_name string, hash_hi long, hash_lo long, hash_error string"

#: 6 bands over 64 bits: (half, shift, width) — 11+11+10 per 32-bit half.
_BANDS = [
    ("hash_hi", 21, 11),
    ("hash_hi", 10, 11),
    ("hash_hi", 0, 10),
    ("hash_lo", 21, 11),
    ("hash_lo", 10, 11),
    ("hash_lo", 0, 10),
]


def area_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact area-weighted downsample (INTER_AREA semantics): output
    cell (r, c) is the mean of the input region it covers, with
    fractional rows/cols weighted by coverage.  For divisible dims this
    reduces to exact block means — the property the oracle fixtures
    exploit."""
    h, w = gray.shape

    def weights(n_in: int, n_out: int) -> np.ndarray:
        # m[j, i] = fraction of output cell j covered by input cell i
        m = np.zeros((n_out, n_in))
        step = n_in / n_out
        for j in range(n_out):
            lo, hi = j * step, (j + 1) * step
            i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
            for i in range(i0, min(i1, n_in)):
                m[j, i] = min(hi, i + 1) - max(lo, i)
        return m / step

    return weights(h, out_h) @ gray @ weights(w, out_w).T


def dhash64(img: np.ndarray) -> tuple[int, int]:
    """dHash of an HxWx3 uint8 image: channel-mean gray, 8x9 area
    downsample, bit (r, c) = block[r, c] < block[r, c+1], packed
    row-major MSB-first; returns (rows 0-3, rows 4-7) as two
    non-negative 32-bit ints."""
    gray = img.astype(np.float64).mean(axis=2)
    blocks = area_resize(gray, 8, 9)
    bits = (blocks[:, :-1] < blocks[:, 1:]).astype(np.uint64)  # 8x8
    powers = np.uint64(1) << np.arange(31, -1, -1, dtype=np.uint64)
    hi = int((bits[:4].reshape(-1) * powers).sum())
    lo = int((bits[4:].reshape(-1) * powers).sum())
    return hi, lo


def image_dhash(
    entries: DataFrame, content_col: str = "content", name_col: str = "entry_name"
) -> DataFrame:
    """The distributed hashing stage: real decode + dHash per row with
    error isolation (house style, mirrors ``decode_images``)."""
    from image_matadata_batchprocessing_aws_spark.multimodal.images import _real_decode

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, content in zip(pdf[name_col], pdf[content_col]):
                try:
                    hi, lo = dhash64(_real_decode(name, bytes(content)))
                    rows.append((name, hi, lo, None))
                except Exception as exc:  # noqa: BLE001 — per-file isolation
                    rows.append((name, None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=["file_name", "hash_hi", "hash_lo", "hash_error"]
            )

    return entries.mapInPandas(hash_batch, DHASH_SCHEMA)


def dhash_near_pairs(
    hashed: DataFrame, id_col: str = "doc_id", max_hamming: int = 4
) -> DataFrame:
    """Hamming-near pairs (a < b) via the 6-band LSH join.  Recall is
    exact for ``max_hamming <= 5`` (pigeonhole over 6 bands); above
    that raise the band count instead of accepting misses."""
    if max_hamming > 5:
        raise ValueError("6 bands guarantee recall only to Hamming distance 5")
    h = hashed.select(id_col, "hash_hi", "hash_lo").where(
        F.col("hash_hi").isNotNull()
    )
    bands = None
    for band_id, (col, shift, width) in enumerate(_BANDS):
        b = h.select(
            F.col(id_col),
            F.lit(band_id).alias("band_id"),
            F.shiftright(F.col(col), shift).bitwiseAND(
                F.lit((1 << width) - 1)
            ).alias("band_val"),
        )
        bands = b if bands is None else bands.unionByName(b)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    ha = h.select(
        F.col(id_col).alias("id_a"),
        F.col("hash_hi").alias("hi_a"),
        F.col("hash_lo").alias("lo_a"),
    )
    hb = h.select(
        F.col(id_col).alias("id_b"),
        F.col("hash_hi").alias("hi_b"),
        F.col("hash_lo").alias("lo_b"),
    )
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
            + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dhash_groups(
    hashed: DataFrame, id_col: str = "doc_id", max_hamming: int = 4
) -> DataFrame:
    """One-hop near-dup grouping: group_id = min over direct Hamming
    neighbors (incl. self).  Exact when near-dup sets are cliques (the
    common case for threshold-t perceptual hashing); for chained
    near-dups run ``connected_components`` on ``dhash_near_pairs``."""
    from image_matadata_batchprocessing_aws_spark.operators.caching import (
        track_persist,
    )

    # The hash frame is (id, two longs) — tiny — but its lineage holds
    # the DECODE MapInPandas stage, and it is referenced by the band
    # self-join (twice), the self-neighbor base, and the size join:
    # without a persist Catalyst re-expands the decode per branch
    # (observed: 118 MapInPandas nodes in the composed curation plan —
    # at 100 TB that is decoding the corpus 100+ times).  Persist the
    # slim frame once; release is the session's query boundary
    # (release_persisted), same lifecycle as the MinHash shingle table.
    hashed = track_persist(hashed.select(id_col, "hash_hi", "hash_lo"))
    pairs = dhash_near_pairs(hashed, id_col, max_hamming)
    sym = pairs.select(
        F.col("id_a").alias(id_col), F.col("id_b").alias("nbr")
    ).unionByName(pairs.select(F.col("id_b").alias(id_col), F.col("id_a").alias("nbr")))
    base = hashed.where(F.col("hash_hi").isNotNull()).select(
        id_col, F.col(id_col).alias("nbr")
    )
    grouped = track_persist(
        base.unionByName(sym)
        .groupBy(id_col)
        .agg(F.min("nbr").alias("group_id"))
    )
    sizes = grouped.groupBy("group_id").agg(F.count("*").alias("group_size"))
    return grouped.join(sizes, "group_id").select(id_col, "group_id", "group_size")
