"""Matrix-free linear operators as JAX pytrees.

TPU-native re-design of the reference linop layer (``rlaopt/linops/base.py:11-111``,
``rlaopt/linops/simple.py:15-104``, ``rlaopt/linops/mixins.py:8-72``):

* Operators are **registered pytrees**: array payloads (``data``, ``scale``)
  are pytree children, the matvec/rmatvec functions and shape/dtype are static
  aux data. An operator can therefore be passed through ``jit`` / ``lax.scan``
  / ``shard_map`` boundaries like any array, with no recompilation when only
  its payload changes.
* There is no ``device`` argument: placement and distribution are sharding
  metadata on the payload arrays (see :mod:`rlaopt_tpu.linops.sharded`), not
  an operator attribute.
* Matmat is auto-derived from matvec via ``jax.vmap`` over columns
  (reference: ``torch.vmap``, ``linops/simple.py:32``).
* Scalar scaling is an operator payload (reference: ``ScaleMixin`` /
  ``_ScaledFunction``, ``linops/mixins.py``); nested scalings merge
  multiplicatively via ``__mul__``.
"""

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.checkers import _is_callable


__all__ = ["LinOp", "TwoSidedLinOp", "SymmetricLinOp", "aslinop"]


def _wrap_closure(fn: Callable) -> Callable:
    """Adapt a closure-style ``fn(x)`` to payload-style ``fn(data, x)``."""

    def wrapped(data, x):
        del data
        return fn(x)

    return wrapped


def _vmap_cols(fn: Callable) -> Callable:
    """Derive a matmat from a payload-style matvec by vmapping over columns."""
    return jax.vmap(fn, in_axes=(None, 1), out_axes=1)


class LinOp:
    """One-sided matrix-free operator: supports ``A @ x`` only.

    Args:
        shape: (n_rows, n_cols).
        matvec: either a closure ``f(x) -> y`` over captured arrays, or a pure
            function ``f(data, x) -> y`` when ``data`` is supplied.
        matmat: optional explicit matmat with the same convention; derived via
            ``jax.vmap`` of matvec if omitted.
        dtype: operator element dtype (used for shape/dtype bookkeeping, e.g.
            densification and sketch construction).
        data: optional pytree of array payloads threaded through jit.
        scale: scalar multiplier folded into every application.
    """

    # Which constructor kwargs this class forwards on structural rebuilds.
    _is_two_sided = False

    # Opt out of numpy's ufunc machinery so ``np_array @ op`` defers to
    # ``op.__rmatmul__`` instead of trying to coerce the operator to an
    # ndarray (matches the reference's x @ A usage surface,
    # rlaopt/sparse/sparse_tensor.py:114-126).
    __array_ufunc__ = None

    def __init__(
        self,
        shape: Tuple[int, int],
        matvec: Callable,
        matmat: Optional[Callable] = None,
        dtype: Any = jnp.float32,
        data: Any = None,
        scale: Any = 1.0,
    ):
        _is_callable(matvec, "matvec")
        if matmat is not None:
            _is_callable(matmat, "matmat")
        if len(shape) != 2:
            raise ValueError(f"shape must have length 2, got {shape}")

        self._shape = (int(shape[0]), int(shape[1]))
        self._dtype = jnp.dtype(dtype)

        if data is None:
            self._data = ()
            self._mv = _wrap_closure(matvec)
            self._mm = _wrap_closure(matmat) if matmat is not None else None
        else:
            self._data = data
            self._mv = matvec
            self._mm = matmat
        if self._mm is None:
            self._mm = _vmap_cols(self._mv)
        self._scale = scale

    # -- core dispatch -----------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        return self._shape

    @property
    def dtype(self):
        return self._dtype

    @property
    def data(self):
        return self._data

    @property
    def scale(self):
        return self._scale

    def _static_unit_scale(self) -> bool:
        return isinstance(self._scale, (int, float)) and self._scale == 1.0

    def _apply_scale(self, y):
        if self._static_unit_scale():
            return y
        return jnp.asarray(self._scale, dtype=y.dtype) * y

    def matvec(self, x: jax.Array) -> jax.Array:
        return self._apply_scale(self._mv(self._data, x))

    def matmat(self, X: jax.Array) -> jax.Array:
        return self._apply_scale(self._mm(self._data, X))

    def _check_matmul_shape(self, x, side_dim: int, name: str):
        if x.ndim not in (1, 2):
            raise ValueError(f"{name} must be 1D or 2D, got {x.ndim}D")

    def __matmul__(self, x):
        if isinstance(x, LinOp):
            return _compose(self, x)
        x = jnp.asarray(x)
        self._check_matmul_shape(x, 0, "x")
        if x.shape[0] != self._shape[1]:
            raise ValueError(
                f"dimension mismatch: operator is {self._shape}, "
                f"operand has leading dim {x.shape[0]}"
            )
        return self.matvec(x) if x.ndim == 1 else self.matmat(x)

    def __rmatmul__(self, x):
        raise TypeError(
            "x @ A requires a two-sided operator (TwoSidedLinOp/SymmetricLinOp)"
        )

    # -- scaling (ScaleMixin analog) ----------------------------------------
    def _with_scale(self, scale):
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        new._scale = scale
        return new

    def __mul__(self, c):
        if self._static_unit_scale() and isinstance(c, (int, float)):
            return self._with_scale(float(c))
        return self._with_scale(self._scale * c)

    __rmul__ = __mul__

    def __neg__(self):
        return self * (-1.0)

    def todense(self) -> jax.Array:
        """Densify via ``A @ I`` (matches ``preconditioners/newton.py:63``)."""
        return self.matmat(jnp.eye(self._shape[1], dtype=self._dtype))

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        children = (self._data, self._scale)
        aux = (self._shape, self._dtype, self._mv, self._mm)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj._shape, obj._dtype, obj._mv, obj._mm = aux
        obj._data, obj._scale = children
        return obj

    def __repr__(self):
        return f"{type(self).__name__}(shape={self._shape}, dtype={self._dtype})"


class TwoSidedLinOp(LinOp):
    """Operator with forward and adjoint: ``A @ x``, ``x @ A``, ``A.T``."""

    _is_two_sided = True

    def __init__(
        self,
        shape: Tuple[int, int],
        matvec: Callable,
        rmatvec: Callable,
        matmat: Optional[Callable] = None,
        rmatmat: Optional[Callable] = None,
        dtype: Any = jnp.float32,
        data: Any = None,
        scale: Any = 1.0,
    ):
        super().__init__(
            shape, matvec, matmat=matmat, dtype=dtype, data=data, scale=scale
        )
        _is_callable(rmatvec, "rmatvec")
        if rmatmat is not None:
            _is_callable(rmatmat, "rmatmat")
        if data is None:
            self._rmv = _wrap_closure(rmatvec)
            self._rmm = _wrap_closure(rmatmat) if rmatmat is not None else None
        else:
            self._rmv = rmatvec
            self._rmm = rmatmat
        if self._rmm is None:
            self._rmm = _vmap_cols(self._rmv)

    def rmatvec(self, x: jax.Array) -> jax.Array:
        return self._apply_scale(self._rmv(self._data, x))

    def rmatmat(self, X: jax.Array) -> jax.Array:
        return self._apply_scale(self._rmm(self._data, X))

    def __rmatmul__(self, x):
        x = jnp.asarray(x)
        self._check_matmul_shape(x, 0, "x")
        if x.ndim == 1:
            if x.shape[0] != self._shape[0]:
                raise ValueError(
                    f"dimension mismatch: operator is {self._shape}, "
                    f"left operand has dim {x.shape[0]}"
                )
            return self.rmatvec(x)
        if x.shape[1] != self._shape[0]:
            raise ValueError(
                f"dimension mismatch: operator is {self._shape}, "
                f"left operand has trailing dim {x.shape[1]}"
            )
        return self.rmatmat(x.T).T

    @property
    def T(self) -> "TwoSidedLinOp":
        """Transpose: swaps forward/adjoint; a metadata-only operation.

        (Reference rebuilds worker plumbing for this, ``linops/distributed.py:96-115``;
        under JAX it is free.)
        """
        new = object.__new__(TwoSidedLinOp)
        new._shape = (self._shape[1], self._shape[0])
        new._dtype = self._dtype
        new._data = self._data
        new._scale = self._scale
        new._mv, new._rmv = self._rmv, self._mv
        new._mm, new._rmm = self._rmm, self._mm
        return new

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        children = (self._data, self._scale)
        aux = (self._shape, self._dtype, self._mv, self._mm, self._rmv, self._rmm)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj._shape, obj._dtype, obj._mv, obj._mm, obj._rmv, obj._rmm) = aux
        obj._data, obj._scale = children
        return obj


class SymmetricLinOp(TwoSidedLinOp):
    """Square symmetric operator; ``.T`` returns self."""

    def __init__(
        self,
        shape: Tuple[int, int],
        matvec: Callable,
        matmat: Optional[Callable] = None,
        dtype: Any = jnp.float32,
        data: Any = None,
        scale: Any = 1.0,
    ):
        if shape[0] != shape[1]:
            raise ValueError(
                f"SymmetricLinOp requires a square shape, received {tuple(shape)}."
            )
        super().__init__(
            shape,
            matvec,
            rmatvec=matvec,
            matmat=matmat,
            rmatmat=matmat,
            dtype=dtype,
            data=data,
            scale=scale,
        )

    @property
    def T(self) -> "SymmetricLinOp":
        return self


def _compose(A: LinOp, B: LinOp) -> LinOp:
    """Operator composition ``(A @ B) x = A (B x)``."""
    if A.shape[1] != B.shape[0]:
        raise ValueError(f"cannot compose {A.shape} with {B.shape}")

    def mv(data, x):
        a, b = data
        return a @ (b @ x)

    def mm(data, X):
        a, b = data
        return a @ (b @ X)

    if A._is_two_sided and B._is_two_sided:

        def rmv(data, x):
            a, b = data
            return (x @ a) @ b

        return TwoSidedLinOp(
            (A.shape[0], B.shape[1]),
            mv,
            rmv,
            matmat=mm,
            dtype=A.dtype,
            data=(A, B),
        )
    return LinOp((A.shape[0], B.shape[1]), mv, matmat=mm, dtype=A.dtype, data=(A, B))


def aslinop(M) -> TwoSidedLinOp:
    """Wrap a dense matrix — or a sparse CSR/CSC tensor — as a two-sided
    operator.

    Dense applies run at HIGHEST matmul precision: on TPU the default f32
    matmul uses bf16 passes, which breaks PSD-ness assumptions downstream
    (preconditioner Cholesky factorizations NaN at bf16 accuracy). Sparse
    tensors dispatch to :func:`rlaopt_tpu.sparse.linop.sparse_aslinop`.
    """
    from ..sparse.sparse_tensor import _SparseTensor

    if isinstance(M, _SparseTensor):
        from ..sparse.linop import sparse_aslinop

        return sparse_aslinop(M)
    M = jnp.asarray(M)
    if M.ndim != 2:
        raise ValueError(f"expected a 2D matrix, got {M.ndim}D")

    def mv(data, x):
        return jnp.matmul(data, x, precision=jax.lax.Precision.HIGHEST)

    def rmv(data, x):
        return jnp.matmul(data.T, x, precision=jax.lax.Precision.HIGHEST)

    def mm(data, X):
        return jnp.matmul(data, X, precision=jax.lax.Precision.HIGHEST)

    def rmm(data, X):
        return jnp.matmul(data.T, X, precision=jax.lax.Precision.HIGHEST)

    return TwoSidedLinOp(
        M.shape, mv, rmv, matmat=mm, rmatmat=rmm, dtype=M.dtype, data=M
    )


for _cls in (LinOp, TwoSidedLinOp, SymmetricLinOp):
    jax.tree_util.register_pytree_node(
        _cls, _cls.tree_flatten, _cls.tree_unflatten
    )
