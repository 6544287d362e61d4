"""Entry-point metadata shims for the in-repo readers.

The core distribution advertises its built-in readers through the
``bioio_spark.readers`` entry-point group (pyproject.toml), mirroring
the reference's ecosystem mechanism (ref bioio/plugins.py:230-300 reads
``bioio.readers``). Each module here exposes a ``ReaderMetadata`` with
``get_supported_extensions()`` / ``get_reader()`` — the contract
``plugins.discover_plugins`` resolves entry points against.
"""
