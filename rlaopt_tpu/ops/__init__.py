"""Low-level compute kernels (Pallas / XLA): FWHT, kernel-Gram matvecs."""

from .fwht import fwht, fwht_butterfly, hadamard_matrix, next_pow2  # noqa: F401

__all__ = ["fwht", "fwht_butterfly", "hadamard_matrix", "next_pow2"]
