"""Device compute kernels: exact u64-in-u32 arithmetic, digit matmuls, NTT."""
from . import u64, modmat, ntt  # noqa: F401
