"""Function library: pure kernels + Arrow-vectorized Spark wrappers."""

from . import kernels  # noqa: F401
