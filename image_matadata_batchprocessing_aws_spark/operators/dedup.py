"""Deduplication operators (Stage 5 / north star).

Exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup — each expressed as DataFrame compositions
(no Python in the hot path; hashes are md5-derived so DuckDB oracles
can mirror them bit-for-bit).

Scale design:

- exact dedup: one shuffle on the 60-bit content hash (not the text).
- shingle/Jaccard and MinHash-LSH candidate generation follow the
  classic explode -> bucket-join pattern: posting lists are bounded by
  shingle rarity, the join key is a small hash, and verification runs
  only on candidate pairs (never all-pairs).
- SimHash pairs use banded blocking on hash chunks, same idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from image_matadata_batchprocessing_aws_spark.functions import md5_int64
from image_matadata_batchprocessing_aws_spark.operators.text import tokens


def content_hash(col: Column | str, normalize: bool = True) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.lower(F.trim(c))
    return F.md5(c)


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content, with the
    canonical (min) id and the duplicate count."""
    return (
        df.withColumn("text_hash", content_hash(text_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_dups"))
    )


def exact_dedup_keep_first(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rows surviving exact dedup (deterministic keep-min-id, via a
    semi-joinable group table — no window over the full data needed)."""
    keep = (
        df.withColumn("text_hash", content_hash(text_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM-side HOFs)."""
    toks = tokens(col)
    # guard: sequence(0, k) with k < 0 would descend (and element_at(0)
    # errors under ANSI mode), so short docs get an empty index array
    idx = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)).otherwise(
        F.array().cast("array<integer>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


def _exploded_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs by shared shingle, verified by exact Jaccard.

    Shuffle profile: explode (map-side), one shuffle on ``shingle``
    (posting-list join — skew-bounded because a shingle shared by k docs
    yields k(k-1)/2 pairs; rare shingles dominate by construction),
    one shuffle on the pair key for the intersection count.
    """
    ex = _exploded_shingles(df, text_col, id_col, n)
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("set_size"))
    a = ex.alias("a")
    b = ex.alias("b")
    pairs = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    jac = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 4
            ),
        )
    )
    return jac.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signature per doc: for seed j, min over shingles of
    md5_int64(j || '|' || shingle).  Docs with < n tokens get no signature
    (empty shingle set — they can't near-dup by shingles)."""
    ex = _exploded_shingles(df, text_col, id_col, n)
    seeded = ex.select(
        id_col,
        F.explode(
            F.array(*[F.lit(j) for j in range(num_hashes)])
        ).alias("seed"),
        "shingle",
    )
    hashed = seeded.withColumn(
        "h", md5_int64(F.concat_ws("|", F.col("seed"), F.col("shingle")))
    )
    return (
        hashed.groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("seed", "minhash"))).alias("sig_pairs"))
        .withColumn("signature", F.col("sig_pairs.minhash"))
        .drop("sig_pairs")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH banding over MinHash signatures -> candidate pairs -> exact
    Jaccard verification.  rows = bands implies num_hashes/bands hashes
    per band; the band key is a single md5 over the band's slice, so the
    bucket join shuffles small keys only."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    band_entries = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at(F.col("signature"), bi * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # Verify ONLY candidate docs: restrict the shingle posting lists to ids
    # that appear in some candidate pair before the quadratic-ish
    # intersection join — at scale the candidate set is tiny relative to
    # the corpus, so this is the difference between O(candidates) and
    # O(all co-shingled pairs) verification work.
    cand_ids = (
        cands.select(F.col("id_a").alias(id_col))
        .union(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    ex = _exploded_shingles(df.join(cand_ids, id_col, "left_semi"), text_col, id_col, n)
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("set_size"))
    ea, eb = ex.alias("ea"), ex.alias("eb")
    inter = (
        ea.join(eb, F.col("ea.shingle") == F.col("eb.shingle"))
        .where(F.col(f"ea.{id_col}") < F.col(f"eb.{id_col}"))
        .groupBy(
            F.col(f"ea.{id_col}").alias("id_a"), F.col(f"eb.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    return (
        cands.join(inter, ["id_a", "id_b"])
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-doc SimHash over distinct tokens: bit j is 1 iff the count of
    token-hashes with bit j set is >= half the token count (md5-derived
    token hashes — portable)."""
    ex = df.select(
        id_col, F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", md5_int64("tok"))
    bit_cols = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = ex.groupBy(id_col).agg(F.count("*").alias("n_toks"), *bit_cols)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"b{j}") * 2 >= F.col("n_toks"), F.lit(1)).otherwise(F.lit(0))
        term = bit.cast("long") * F.lit(1 << j)
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 3,
    band_bits: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on bit-bands
    (a pair within hamming d <= bands-1 shares at least one exact band)."""
    s = simhash(df, text_col, id_col, bits)
    n_bands = bits // band_bits
    bands = s.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), bi * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("band_val"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.band_val").alias("band_val"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band")) & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
