from image_matadata_batchprocessing_aws_spark.operators.cleaning import (
    drop_columns,
    cast_columns,
    trim_columns,
    replace_sentinel,
    fill_constants,
    epoch_ms_to_timestamp,
    add_date_parts,
)
from image_matadata_batchprocessing_aws_spark.operators.impute import ffill, bfill, ffill_bfill
from image_matadata_batchprocessing_aws_spark.operators.encode import label_encode
from image_matadata_batchprocessing_aws_spark.operators.scale import zscore_scale, minmax_scale
from image_matadata_batchprocessing_aws_spark.operators.audit import null_audit, total_nulls, expect_no_nulls
from image_matadata_batchprocessing_aws_spark.operators.batching import add_batch_id, write_size_split_csv
from image_matadata_batchprocessing_aws_spark.operators.cleanup import (
    cleanup_after_commit,
    write_parquet_then_cleanup,
)
from image_matadata_batchprocessing_aws_spark.operators.maintenance import (
    compact_parquet,
    merge_upsert,
    write_partitioned,
)
from image_matadata_batchprocessing_aws_spark.operators.dedup import (
    exact_dedup_keep_first,
    incremental_dedup_report,
    minhash_lsh_pairs,
)
from image_matadata_batchprocessing_aws_spark.operators.sampling import (
    hash_sample,
    quota_sample,
    split_assign,
    weighted_sample,
    token_budget_select,
)
from image_matadata_batchprocessing_aws_spark.operators.sketches import (
    bloom_build,
    bloom_capacity,
    bloom_hit,
    cms_build,
    cms_estimate,
)
from image_matadata_batchprocessing_aws_spark.operators.graph import (
    connected_components,
    pagerank_scaled,
)
from image_matadata_batchprocessing_aws_spark.operators.pq import (
    pq_adc_topk,
    pq_codebook,
    pq_encode,
)
from image_matadata_batchprocessing_aws_spark.operators.text import (
    charlm_score,
    tfidf_keywords,
)

__all__ = [
    "bloom_build",
    "bloom_capacity",
    "bloom_hit",
    "cms_build",
    "cms_estimate",
    "connected_components",
    "pagerank_scaled",
    "pq_adc_topk",
    "pq_codebook",
    "pq_encode",
    "split_assign",
    "exact_dedup_keep_first",
    "incremental_dedup_report",
    "minhash_lsh_pairs",
    "hash_sample",
    "quota_sample",
    "weighted_sample",
    "token_budget_select",
    "charlm_score",
    "tfidf_keywords",
    "cleanup_after_commit",
    "write_parquet_then_cleanup",
    "compact_parquet",
    "merge_upsert",
    "write_partitioned",
    "drop_columns",
    "cast_columns",
    "trim_columns",
    "replace_sentinel",
    "fill_constants",
    "epoch_ms_to_timestamp",
    "add_date_parts",
    "ffill",
    "bfill",
    "ffill_bfill",
    "label_encode",
    "zscore_scale",
    "minmax_scale",
    "null_audit",
    "total_nulls",
    "expect_no_nulls",
    "add_batch_id",
    "write_size_split_csv",
]
