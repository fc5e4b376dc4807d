"""Sketch factory (parity: ``rlaopt/sketches/factory.py:25-59``; adds SRHT)."""

from .enums import _SketchMode
from .base import Sketch
from .gauss import Gauss
from .ortho import Ortho
from .sparse_sign import Sparse
from .srht import SRHT


SKETCH_MODE_TO_CLASS = {
    _SketchMode.GAUSS: Gauss,
    _SketchMode.ORTHO: Ortho,
    _SketchMode.SPARSE: Sparse,
    _SketchMode.SRHT: SRHT,
}


__all__ = ["get_sketch"]


def get_sketch(
    name: str,
    mode: str,
    sketch_size: int,
    matrix_dim: int,
    dtype,
    key=None,
) -> Sketch:
    """Create a Sketch.

    Args:
        name: "gauss", "ortho", "sparse", or "srht".
        mode: "left" or "right".
        sketch_size: target dimension s.
        matrix_dim: original dimension d.
        dtype: element dtype.
        key: PRNG key / int seed / None (package-global chain).
    """
    sketch_name = _SketchMode._from_str(name, "name")
    sketch_class = SKETCH_MODE_TO_CLASS[sketch_name]
    return sketch_class(mode, sketch_size, matrix_dim, dtype, key)
