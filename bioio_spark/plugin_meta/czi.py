"""CZI reader metadata (entry point bioio-spark-czi)."""


class ReaderMetadata:
    @staticmethod
    def get_supported_extensions():
        return [".czi"]

    @staticmethod
    def get_reader():
        from bioio_spark.sources.czi_image import CziImageReader

        return CziImageReader
