"""Make the CPU-only reference build importable for parity tests.

The round harness builds the PyTorch reference into /tmp/refbuild
(`RLAOPT_CPU_ONLY=1 pip install --no-build-isolation --no-deps
--target /tmp/refbuild /root/reference`). If the package is not already
importable (e.g. installed site-wide), fall back to that location so the
fp64 iterate-parity suite runs instead of silently skipping.
"""

import importlib.util
import os
import sys

_REFBUILD = "/tmp/refbuild"

if (
    importlib.util.find_spec("rlaopt") is None
    and os.path.isdir(_REFBUILD)
    and _REFBUILD not in sys.path
):
    sys.path.append(_REFBUILD)
