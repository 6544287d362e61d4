from bioio_spark.sources.array_like import ArrayLikeReader, ImageDataset

__all__ = ["ArrayLikeReader", "ImageDataset"]
