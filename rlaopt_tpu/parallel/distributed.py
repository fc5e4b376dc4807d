"""Multi-host / multi-slice execution support.

The reference's own direction for multi-node execution is a collective
backend (``torch.distributed`` + NCCL prototype,
``experiments/distributed_matvec_v4.py:30-46``); its shipped runtime is
single-host worker processes. The TPU-native equivalent is JAX's multi-process
runtime: one process per host/slice joined through a coordinator
(``jax.distributed.initialize``), a **2-D device mesh** with a slow DCN axis
across slices and a fast ICI axis within a slice, and GSPMD collectives that
ride the right fabric per axis.

Helpers here:

* :func:`initialize_multihost` — join the process group (TPU pods, GPU
  clusters, or multi-process CPU with Gloo collectives for testing).
* :func:`make_mesh_2d` — build the ("dcn", "i") mesh with each process's
  local devices contiguous along the ICI axis.
* :func:`run_multiprocess_dryrun` — spawn N CPU processes × M virtual
  devices each and drive a sharded solve across them (the multi-host analog
  of the reference's multi-device-without-a-cluster test strategy).
"""

import os
import socket
import subprocess
import sys
import warnings
from typing import Optional, Sequence

import jax
import numpy as np

from jax.sharding import Mesh


__all__ = [
    "initialize_multihost",
    "make_mesh_2d",
    "axis_size",
    "run_multiprocess_dryrun",
]


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
    cpu_collectives: Optional[str] = "gloo",
) -> None:
    """Join a multi-process JAX runtime.

    On TPU pods the arguments are auto-detected from the environment and may
    all be None. For multi-process CPU runs (testing the DCN code path
    without a pod), pass them explicitly; ``cpu_collectives`` selects the
    cross-process CPU collective implementation.
    """
    if cpu_collectives is not None:
        try:
            jax.config.update(
                "jax_cpu_collectives_implementation", cpu_collectives
            )
        except Exception:
            pass  # non-CPU backends, or older jax: the option is advisory
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except ValueError:
        if (
            coordinator_address is not None
            or num_processes is not None
            or process_id is not None
            or local_device_ids is not None
        ):
            raise  # ANY explicit multi-process argument: misconfiguration
        # All-None means "auto-detect" (TPU pods / managed clusters). On a
        # plain host there is nothing to detect and jax raises before any
        # global state is touched — degrade to single-process so the same
        # script runs on a laptop and on a pod.
        warnings.warn(
            "initialize_multihost(): no cluster environment detected; "
            "running single-process.",
            stacklevel=2,
        )
    except RuntimeError:
        if (
            coordinator_address is not None
            or num_processes is not None
            or process_id is not None
            or local_device_ids is not None
        ):
            raise  # joining a cluster after backend init is a real error
        # Auto-detect requested but the XLA backend is already initialized
        # (jax raises before touching distributed state). Stay
        # single-process, loudly: on a pod the user must call this before
        # any JAX computation to actually join the cluster.
        warnings.warn(
            "initialize_multihost(): XLA backend already initialized; "
            "running single-process. To join a multi-host cluster, call "
            "initialize_multihost() before any JAX computation.",
            stacklevel=2,
        )


def make_mesh_2d(
    n_dcn: Optional[int] = None,
    n_ici: Optional[int] = None,
    dcn_axis: str = "dcn",
    ici_axis: str = "i",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ("dcn", "i") mesh.

    Rows of the mesh are processes/slices (communication across them crosses
    the data-center network); columns are the devices within a slice (ICI).
    Defaults: one DCN row per process, all local devices per row. Works
    single-process too (e.g. 8 virtual CPU devices as a 2×4 mesh) so the 2-D
    code paths are testable without a cluster.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_dcn is None:
        n_dcn = max(jax.process_count(), 1)
    if n_ici is None:
        n_ici = len(devices) // n_dcn
    if n_dcn * n_ici != len(devices):
        devices = devices[: n_dcn * n_ici]
    if n_dcn * n_ici > len(devices):
        raise ValueError(
            f"mesh {n_dcn}x{n_ici} needs {n_dcn * n_ici} devices, "
            f"have {len(devices)}"
        )
    # Keep each process's devices contiguous along the ICI axis so intra-row
    # collectives stay on-host/on-slice.
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    grid = np.asarray(devices).reshape(n_dcn, n_ici)
    return Mesh(grid, (dcn_axis, ici_axis))


def axis_size(mesh: Mesh, axis) -> int:
    """Total device count along ``axis`` (a name or tuple of names)."""
    if isinstance(axis, (tuple, list)):
        size = 1
        for a in axis:
            size *= mesh.shape[a]
        return size
    return mesh.shape[axis]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_multiprocess_dryrun(
    n_procs: int = 2, n_local: int = 4, timeout: int = 600
) -> None:
    """Drive the full multi-host path: ``n_procs`` CPU processes × ``n_local``
    virtual devices, joined via ``jax.distributed`` with Gloo collectives,
    running a sharded Gram matvec + PCG step over a 2-D (dcn, ici) mesh.

    Raises on any process failure or numerical mismatch.
    """
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env["JAX_PLATFORMS"] = "cpu"
    # A parent process may have initialized a distributed runtime; children
    # must start their own.
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = []
    for pid in range(n_procs):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "rlaopt_tpu.parallel._multihost_dryrun",
                    str(pid),
                    str(n_procs),
                    str(port),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    failed = False
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            failed = True
        outputs.append(out)
        failed = failed or p.returncode != 0 or "MULTIHOST_OK" not in out
    if failed:
        raise RuntimeError(
            "multi-process dryrun failed:\n"
            + "\n---\n".join(o[-2000:] for o in outputs)
        )
