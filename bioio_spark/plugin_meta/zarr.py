"""OME-Zarr reader metadata (entry point bioio-spark-zarr)."""


class ReaderMetadata:
    @staticmethod
    def get_supported_extensions():
        return [".zarr", ".ome.zarr"]

    @staticmethod
    def get_reader():
        from bioio_spark.sources.zarr_image import ZarrImageReader

        return ZarrImageReader
