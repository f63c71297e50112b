"""Native (C++) fast paths.

The reference implements its entire runtime in native Rust; here the
device compute path is XLA-compiled and the remaining host-side hot loop —
the order-dependent incremental clustering scan — gets a C++
implementation (built as a shared library, loaded via ctypes).

If the shared library has not been built, callers fall back to the NumPy
implementation transparently.
"""

from __future__ import annotations

from .clustering_native import native_incremental_clustering  # noqa: F401
