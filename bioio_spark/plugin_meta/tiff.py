"""OME-TIFF reader metadata (entry point bioio-spark-tiff)."""


class ReaderMetadata:
    @staticmethod
    def get_supported_extensions():
        return [".ome.tiff", ".ome.tif", ".tiles.ome.tif", ".tiff",
                ".tif"]

    @staticmethod
    def get_reader():
        from bioio_spark.sources.tiff_image import TiffImageReader

        return TiffImageReader
