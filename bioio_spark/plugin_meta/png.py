"""PNG reader metadata (entry point bioio-spark-png)."""


class ReaderMetadata:
    @staticmethod
    def get_supported_extensions():
        return [".png"]

    @staticmethod
    def get_reader():
        from bioio_spark.sources.png_image import PngImageReader

        return PngImageReader
