"""Shim for legacy editable installs (`pip install -e . --no-use-pep517`):
the container ships setuptools but not `wheel`, so the PEP 660 editable
path (which shells out to bdist_wheel) is unavailable offline. All
metadata lives in pyproject.toml (PEP 621); setuptools >= 61 reads it."""
from setuptools import setup

setup()
