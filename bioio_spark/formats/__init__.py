"""Concrete file-format codecs (pure Python — no external image libraries).

The reference delegates format decode/encode to plugin packages
(ref bioio/plugins.py:167-326, writers/__init__.py:10-15); this package holds
the engine's built-in baseline codecs, starting with an uncompressed
grayscale baseline-TIFF / OME-TIFF implementation.
"""
