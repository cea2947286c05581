from image_matadata_batchprocessing_aws_spark.multimodal.images import (
    scan_zip_entries,
    decode_images,
    image_metadata_join,
    write_image_batches,
)

__all__ = [
    "scan_zip_entries",
    "decode_images",
    "image_metadata_join",
    "write_image_batches",
]
