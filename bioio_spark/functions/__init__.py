from bioio_spark.functions import dedup, hashing, similarity, text  # noqa: F401
