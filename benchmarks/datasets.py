"""Benchmark datasets.

HIGGS (UCI, 11M rows × 28 features) is the real dataset behind BASELINE
config 3. The loader downloads + checksums + caches it; in offline
environments it falls back to a synthetic surrogate with the same shape and
SAYS SO — every consumer reports which dataset was actually used.
"""

import gzip
import hashlib
import os
import urllib.request

import numpy as np


HIGGS_URL = (
    "https://archive.ics.uci.edu/ml/machine-learning-databases/00280/"
    "HIGGS.csv.gz"
)
# sha256 of HIGGS.csv.gz. This build environment has no egress, so the
# digest could not be pre-verified; trust-on-first-use: the first verified
# download records its digest next to the cache and later loads check
# against it. Pin a known digest here once one is available.
HIGGS_SHA256 = None
_CACHE_DIR = os.path.expanduser(
    os.environ.get("RLAOPT_TPU_DATA", "~/.cache/rlaopt_tpu")
)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _synthetic_higgs(n: int, seed: int = 0):
    """Shape-matched surrogate: 28 features, nonlinear binary-ish target."""
    rng = np.random.default_rng(seed)
    d = 28
    X = rng.standard_normal((n, d), dtype=np.float32)
    w = rng.standard_normal(d).astype(np.float32)
    y = np.tanh(X @ w) + 0.1 * rng.standard_normal(n).astype(np.float32)
    return X, y.astype(np.float32)


def load_higgs(n: int = 100_000, allow_synthetic: bool = True):
    """Load the first ``n`` HIGGS rows (standardized features, ±1 labels).

    Returns ``(X, y, source)`` with ``source`` one of ``"higgs-uci"``
    (real data: downloaded+checksummed or cache hit) or ``"synthetic"``
    (offline fallback — reported, never silent).
    """
    os.makedirs(_CACHE_DIR, exist_ok=True)
    cache = os.path.join(_CACHE_DIR, f"higgs_{n}.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        return data["X"], data["y"], str(data["source"])

    raw = os.path.join(_CACHE_DIR, "HIGGS.csv.gz")
    digest_file = raw + ".sha256"
    try:
        if not os.path.exists(raw):
            urllib.request.urlretrieve(HIGGS_URL, raw + ".part")
            os.replace(raw + ".part", raw)
        digest = _sha256(raw)
        expected = HIGGS_SHA256
        if expected is None and os.path.exists(digest_file):
            with open(digest_file) as f:
                expected = f.read().strip()
        if expected is not None and digest != expected:
            raise IOError(
                f"HIGGS.csv.gz checksum mismatch: {digest} != {expected}"
            )
        with open(digest_file, "w") as f:  # trust-on-first-use record
            f.write(digest)
        with gzip.open(raw, "rt") as f:
            arr = np.loadtxt(
                f, delimiter=",", dtype=np.float32, max_rows=n
            )
        y = (2.0 * arr[:, 0] - 1.0).astype(np.float32)  # {0,1} → ±1
        X = arr[:, 1:]
        X = (X - X.mean(0)) / (X.std(0) + 1e-8)  # standardize features
        source = "higgs-uci"
    except Exception as e:  # offline / bad download → loud fallback
        if not allow_synthetic:
            raise
        print(
            f"# HIGGS download unavailable ({type(e).__name__}: {e}); "
            "using the synthetic surrogate — results are labeled "
            'dataset="synthetic".'
        )
        X, y = _synthetic_higgs(n)
        source = "synthetic"

    np.savez_compressed(cache, X=X, y=y, source=source)
    return X, y, source
