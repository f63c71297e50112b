"""Storage: Parquet persistence with reference-compatible schemas.

Mirrors the reference's `storage` feature (reference: storage/mod.rs,
storage/parquet.rs).  Artifacts written by arrowspace-rs load here and
vice versa: identical column names, types and Snappy compression.
"""

from .errors import StorageError  # noqa: F401
from . import parquet  # noqa: F401
