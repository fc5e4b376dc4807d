"""Naive reference kernel oracles (mirrors the reference's test strategy:
scalar formulas, no golden files — tests/kernels/utils.py:4-60)."""

import numpy as np


def _scaled_diff(x, y, ls):
    return (x - y) / ls


def rbf_kernel(x, y, ls):
    d = _scaled_diff(x, y, ls)
    return np.exp(-np.sum(d * d) / 2.0)


def laplace_kernel(x, y, ls):
    d = _scaled_diff(x, y, ls)
    return np.exp(-np.sum(np.abs(d)))


def matern12_kernel(x, y, ls):
    d = _scaled_diff(x, y, ls)
    r = np.sqrt(np.sum(d * d))
    return np.exp(-r)


def matern32_kernel(x, y, ls):
    d = _scaled_diff(x, y, ls)
    r = np.sqrt(np.sum(d * d))
    return (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)


def matern52_kernel(x, y, ls):
    d = _scaled_diff(x, y, ls)
    r = np.sqrt(np.sum(d * d))
    return (1 + np.sqrt(5) * r + 5.0 / 3.0 * r * r) * np.exp(-np.sqrt(5) * r)


KERNEL_ORACLES = {
    "rbf": rbf_kernel,
    "laplace": laplace_kernel,
    "matern12": matern12_kernel,
    "matern32": matern32_kernel,
    "matern52": matern52_kernel,
}


def compute_kernel_matrix(kind, X1, X2, lengthscale, const_scaling=1.0):
    """Dense kernel matrix via the scalar oracle, computed in float64."""
    k = KERNEL_ORACLES[kind]
    X1 = np.asarray(X1, dtype=np.float64)
    X2 = np.asarray(X2, dtype=np.float64)
    ls = np.asarray(lengthscale, dtype=np.float64)
    K = np.empty((X1.shape[0], X2.shape[0]))
    for i in range(X1.shape[0]):
        for j in range(X2.shape[0]):
            K[i, j] = k(X1[i], X2[j], ls)
    return const_scaling * K
