"""Mesh-sharded matrix-free operators.

TPU-native replacement for the reference's distributed linop runtime
(``rlaopt/linops/base.py:114-292``, ``rlaopt/linops/distributed.py:15-208``).
The reference spawns one worker process per device, ships tensors through
CPU-staged queues, and re-uses workers across transposes/oracles. Here an
operator is *data sharded over a 1-D mesh axis* plus a local compute
function; communication is XLA collectives inside ``shard_map``:

=====================  ==========================================  =============
reference semantics     this class                                  collective
=====================  ==========================================  =============
ROW matvec              local matvec on the row shard               none (output
 (broadcast x, concat)                                              stays sharded)
ROW rmatvec             local rmatvec on the row shard of y         psum
 (chunk rows, sum)
COLUMN matvec           local matvec on the column shard of x       psum
COLUMN rmatvec          local rmatvec, output column-sharded        none
transpose               flips mode — metadata only, no workers      —
=====================  ==========================================  =============

Ragged sizes are handled by zero-padding the sharded dim to a multiple of the
mesh size (padded rows multiply zeros / are sliced off).

Multi-host: ``axis`` may be a tuple of mesh axis names (e.g. ``("dcn", "i")``
on a 2-D multi-slice mesh from :func:`rlaopt_tpu.parallel.make_mesh_2d`); the
sharded dim is then split over all named axes and collectives reduce over the
tuple, so psum partial sums ride ICI within a slice and DCN across slices.
"""

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .base import TwoSidedLinOp
from .enums import _DistributionMode


__all__ = [
    "ShardedLinOp",
    "DistributedLinOp",
    "DistributedTwoSidedLinOp",
    "DistributedSymmetricLinOp",
]


def _spec_nd(axis: Optional[str], ndim: int, shard_leading: bool):
    if shard_leading:
        return P(axis, *([None] * (ndim - 1)))
    return P(*([None] * ndim))


class ShardedLinOp(TwoSidedLinOp):
    """Operator whose payload is sharded over one mesh axis.

    Args:
        shape: logical (n_rows, n_cols) — unpadded.
        matvec / rmatvec: payload-style local functions ``f(data_shard, x)``;
            in ROW mode matvec receives the row shard of the payload and the
            full operand, rmatvec receives the row shard of the operand.
        mesh: the 1-D device mesh.
        data: pytree of payload arrays.
        data_specs: matching pytree of ``PartitionSpec`` for the payload.
        mode: "row" or "column".
        axis: mesh axis name.
        padded_shape: physical (padded) shape if the sharded dim was padded.
        gather_idx: logical→physical index map along the sharded dim, for
            ragged per-device chunks whose padding is interleaved (each
            device's segment is real entries followed by zeros). ``None``
            means padding, if any, sits at the physical end (contiguous
            chunks), where a plain slice suffices.
    """

    def __init__(
        self,
        shape: Tuple[int, int],
        matvec: Callable,
        rmatvec: Callable,
        mesh: Mesh,
        data: Any,
        data_specs: Any,
        mode: str = "row",
        axis: str = "i",
        dtype: Any = jnp.float32,
        padded_shape: Optional[Tuple[int, int]] = None,
        scale: Any = 1.0,
        gather_idx: Optional[jax.Array] = None,
    ):
        super().__init__(
            shape,
            matvec,
            rmatvec,
            matmat=matvec,
            rmatmat=rmatvec,
            dtype=dtype,
            data=data,
            scale=scale,
        )
        self.mesh = mesh
        self.axis = axis
        self.mode = _DistributionMode._from_str(mode, "mode")
        self.data_specs = data_specs
        self.padded_shape = tuple(padded_shape or shape)
        self.gather_idx = gather_idx

    # -- helpers -------------------------------------------------------------
    def _pad_operand(self, x, target: int):
        if x.shape[0] == target:
            return x
        if self.gather_idx is not None:
            # Ragged chunks: real entries sit at gather_idx inside the padded
            # layout; scatter them there and leave zeros elsewhere.
            z = jnp.zeros((target,) + x.shape[1:], x.dtype)
            return z.at[self.gather_idx].set(x)
        pad = [(0, target - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    def _collect_sharded(self, out, logical_len: int):
        """Drop padding from a sharded-dim output (slice or ragged gather)."""
        if self.gather_idx is not None:
            return out[self.gather_idx]
        return out[:logical_len]

    def _shmap(self, fn, in_specs, out_specs):
        return jax.shard_map(
            fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    def _row_forward(self, local_fn, x):
        """Local compute on row shard, output row-sharded (concat)."""
        out = self._shmap(
            local_fn,
            in_specs=(self.data_specs, _spec_nd(None, x.ndim, False)),
            out_specs=_spec_nd(self.axis, x.ndim, True),
        )(self._data, x)
        if self.mode == _DistributionMode.ROW:
            return self._collect_sharded(out, self.shape[0])
        return out

    def _row_adjoint(self, local_fn, y, padded_len: int, out_len: int):
        """Operand sharded like rows, psum partials (sum-combine)."""
        y_p = self._pad_operand(y, padded_len)

        def local(d, yy):
            return lax.psum(local_fn(d, yy), self.axis)

        out = self._shmap(
            local,
            in_specs=(self.data_specs, _spec_nd(self.axis, y.ndim, True)),
            out_specs=_spec_nd(None, y.ndim, False),
        )(self._data, y_p)
        return out[:out_len]

    # -- dispatch ------------------------------------------------------------
    def matvec(self, x):
        return self._apply_scale(self._matvec_impl(x))

    def matmat(self, X):
        return self._apply_scale(self._matvec_impl(X))

    def rmatvec(self, x):
        return self._apply_scale(self._rmatvec_impl(x))

    def rmatmat(self, X):
        return self._apply_scale(self._rmatvec_impl(X))

    def _matvec_impl(self, x):
        if self.mode == _DistributionMode.ROW:
            return self._row_forward(self._mv, x)
        # COLUMN: x is chunked along the operator's column dim; partials sum.
        return self._row_adjoint(
            self._mv, x, self.padded_shape[1], self.shape[0]
        )

    def _rmatvec_impl(self, y):
        if self.mode == _DistributionMode.ROW:
            return self._row_adjoint(
                self._rmv, y, self.padded_shape[0], self.shape[1]
            )
        out = self._shmap(
            self._rmv,
            in_specs=(self.data_specs, _spec_nd(None, y.ndim, False)),
            out_specs=_spec_nd(self.axis, y.ndim, True),
        )(self._data, y)
        return self._collect_sharded(out, self.shape[1])

    @property
    def T(self) -> "ShardedLinOp":
        """Transpose: flips distribution mode (metadata only)."""
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        new._shape = (self._shape[1], self._shape[0])
        new.padded_shape = (self.padded_shape[1], self.padded_shape[0])
        new._mv, new._rmv = self._rmv, self._mv
        new._mm, new._rmm = self._rmm, self._mm
        new.mode = (
            _DistributionMode.COLUMN
            if self.mode == _DistributionMode.ROW
            else _DistributionMode.ROW
        )
        return new

    def _with_data(self, data) -> "ShardedLinOp":
        """Shallow copy with the payload replaced.

        Lets jitted solver loops pass the (possibly multi-host) payload as a
        jit ARGUMENT and rebind it to the operator inside the trace — closing
        over arrays that span non-addressable devices is illegal under
        ``jax.distributed``.
        """
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        new._data = data
        return new

    def shutdown(self):
        """No-op (API parity: the reference tears down worker processes)."""

    # Sharded operators are not registered pytrees: they hold a Mesh and are
    # intended to be closed over by jitted programs, not passed as operands.
    def tree_flatten(self):  # pragma: no cover
        raise NotImplementedError

    @classmethod
    def from_local_ops(
        cls,
        ops,
        mesh: Mesh,
        mode: str = "row",
        axis: str = "i",
    ) -> "ShardedLinOp":
        """Build a distributed operator from per-device local operators.

        Reference-style constructor (``DistributedLinOp(A=[ops...], ...)``,
        ``rlaopt/linops/distributed.py:15-94``): ``ops`` are same-structure
        payload-style LinOps (one per mesh device); their payload leaves are
        stacked along a new leading axis sharded over the mesh, and the first
        op's functions run on the local slice.

        Ragged chunks are accepted, matching the reference's ``torch.chunk``
        ergonomics (``rlaopt/linops/base.py:297-302``): the ops may differ in
        size along the sharded dim. Each payload leaf is zero-padded to the
        per-axis max before stacking, and outputs/operands are mapped through
        an internal gather index, so results match the unpadded concatenation
        exactly. The local ops' functions must map zero payload rows/columns
        to zero outputs (true of every payload-style linop in this package).
        """
        from ..parallel.distributed import axis_size

        ndev = axis_size(mesh, axis)
        if len(ops) != ndev:
            raise ValueError(
                f"need one local op per device ({ndev}), got {len(ops)}"
            )
        shard_dim = 0 if mode == "row" else 1
        other_dim = 1 - shard_dim
        other_sizes = {op.shape[other_dim] for op in ops}
        if len(other_sizes) != 1:
            raise ValueError(
                "local ops must agree along the non-sharded dim; "
                f"got sizes {sorted(other_sizes)}"
            )
        loc_sizes = [op.shape[shard_dim] for op in ops]
        loc_max = max(loc_sizes)
        ragged = len(set(loc_sizes)) != 1

        def stack_pad(*leaves):
            target = tuple(
                max(lf.shape[a] for lf in leaves)
                for a in range(leaves[0].ndim)
            )
            padded = [
                jnp.pad(lf, [(0, t - s) for s, t in zip(lf.shape, target)])
                for lf in leaves
            ]
            return jnp.stack(padded, axis=0)

        stacked = jax.tree_util.tree_map(
            stack_pad, *[op.data for op in ops]
        )
        nspec = jax.tree_util.tree_map(lambda _: P(axis), stacked)
        proto = ops[0]

        def mv(dd, x):
            local = jax.tree_util.tree_map(lambda l: l[0], dd)
            return proto._mv(local, x)

        has_rmv = getattr(proto, "_rmv", None) is not None

        def rmv(dd, x):
            if not has_rmv:
                raise TypeError("local ops have no rmatvec")
            local = jax.tree_util.tree_map(lambda l: l[0], dd)
            return proto._rmv(local, x)

        n_logical = sum(loc_sizes)
        if mode == "row":
            shape = (n_logical, ops[0].shape[1])
            padded_shape = (loc_max * ndev, ops[0].shape[1])
        else:
            shape = (ops[0].shape[0], n_logical)
            padded_shape = (ops[0].shape[0], loc_max * ndev)
        gather_idx = None
        if ragged:
            gather_idx = jnp.concatenate(
                [
                    dev * loc_max + jnp.arange(sz)
                    for dev, sz in enumerate(loc_sizes)
                ]
            )
        return cls(
            shape,
            mv,
            rmv,
            mesh,
            stacked,
            nspec,
            mode=mode,
            axis=axis,
            dtype=proto.dtype,
            padded_shape=padded_shape,
            gather_idx=gather_idx,
        )

    @classmethod
    def from_dense(
        cls,
        M: jax.Array,
        mesh: Mesh,
        mode: str = "row",
        axis: str = "i",
    ) -> "ShardedLinOp":
        """Shard a dense matrix over the mesh as a matrix-free operator."""
        from ..parallel.distributed import axis_size
        from ..parallel.mesh import pad_to_multiple

        ndev = axis_size(mesh, axis)
        shard_dim = 0 if mode == "row" else 1
        Mp, _ = pad_to_multiple(M, ndev, axis=shard_dim)
        if shard_dim == 1:
            spec = P(None, axis)
        else:
            spec = P(axis, None)
        Mp = jax.device_put(Mp, jax.sharding.NamedSharding(mesh, spec))

        def mv(d, x):
            return d @ x

        def rmv(d, y):
            return d.T @ y

        if mode == "row":
            # local shard is (n_loc, m): forward gets full x, adjoint row-shard
            return cls(
                M.shape, mv, rmv, mesh, Mp, P(axis, None),
                mode="row", axis=axis, dtype=M.dtype,
                padded_shape=(Mp.shape[0], M.shape[1]),
            )
        # column mode: local shard is (n, m_loc)
        return cls(
            M.shape, mv, rmv, mesh, Mp, P(None, axis),
            mode="column", axis=axis, dtype=M.dtype,
            padded_shape=(M.shape[0], Mp.shape[1]),
        )


# Reference-familiar aliases (the reference distinguishes one-sided,
# two-sided, and symmetric distributed operators; sharding metadata makes the
# distinction vestigial here).
DistributedLinOp = ShardedLinOp
DistributedTwoSidedLinOp = ShardedLinOp


class DistributedSymmetricLinOp(ShardedLinOp):
    """Square symmetric sharded operator; ``.T`` returns self."""

    @property
    def T(self):
        return self
