"""Device mesh + sharding layout for the segmentation workloads.

This replaces the reference's entire distributed runtime — HF
Accelerate / torch DDP / NCCL process groups launched per rank
(run_training.sh:66, train_unet.py:309-312,384-386) — with the
single-controller JAX model:

  * one ``Mesh`` with axes ``('data', 'spatial')``;
  * the global batch is sharded over ``data`` (data parallelism: the
    gradient all-reduce the reference gets from DDP becomes an XLA
    psum inserted automatically because the batch axis is sharded);
  * volumes can additionally be sharded over ``spatial`` along D:
    XLA's SPMD partitioner inserts halo exchanges for the 3x3x3 convs
    automatically. This is the conv-net equivalent of sequence
    parallelism and is the memory escape hatch for full 192^3 volumes
    (SURVEY.md section 2.10) — the reference has no model sharding at
    all.
  * parameters/optimizer state are replicated (at 5.6M params there is
    nothing to gain from sharding them).

Collectives ride ICI within a slice; for multi-host pods,
``jax.distributed.initialize()`` extends the same mesh over DCN with no
code changes here.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    n_data: int | None = None,
    n_spatial: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices.

    Default: all devices on the data axis. ``n_spatial > 1`` carves a
    spatial-sharding axis for splitting the volume's D dimension.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_spatial != 0:
            raise ValueError(f"{n} devices not divisible by n_spatial={n_spatial}")
        n_data = n // n_spatial
    if n_data * n_spatial > n:
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs {n_data * n_spatial} devices, have {n}"
        )
    grid = np.array(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding for a batch array: batch over data, volume D over spatial.

    Channel-first layout: images are (B, C, D, H, W) (D at axis 2),
    labels are (B, D, H, W) (D at axis 1).
    """
    if ndim >= 5:
        spec = P(DATA_AXIS, None, SPATIAL_AXIS)
    elif ndim >= 2:
        spec = P(DATA_AXIS, SPATIAL_AXIS)
    else:
        spec = P(DATA_AXIS)  # per-sample weight/mask vectors
    return NamedSharding(mesh, spec)


def eval_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding for small eval batches (batch 1, test_model.py style):
    replicate over data, still shard D over spatial."""
    if ndim >= 5:
        spec = P(None, None, SPATIAL_AXIS)
    else:
        spec = P(None, SPATIAL_AXIS)
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays):
    """device_put a batch (images, labels, ...) with the batch sharding."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, ndim=np.ndim(a))) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def replicate_state(mesh: Mesh, tree):
    """Replicate a pytree (TrainState) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


# ---- active-mesh context ----------------------------------------------
# The model consults this at TRACE time to decide whether its convs must
# run inside halo-exchange shard_map islands (ops/halo.py): a pallas_call
# cannot be auto-partitioned, so when the volume's D axis is sharded the
# conv dispatch needs to know the mesh. The trainer (and dryrun) set it
# once after building their mesh; tests use the context manager.

_ACTIVE_MESH: Mesh | None = None


def set_active_mesh(mesh: Mesh | None) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_spatial_mesh() -> Mesh | None:
    """The active mesh IF it has a non-trivial spatial axis, else None."""
    m = _ACTIVE_MESH
    if m is not None and m.shape.get(SPATIAL_AXIS, 1) > 1:
        return m
    return None


def active_mesh_devices() -> int:
    """Total devices in the active mesh (1 when none is set)."""
    m = _ACTIVE_MESH
    return 1 if m is None else m.size


def active_multi_mesh() -> Mesh | None:
    """The active mesh IF it spans more than one device (any axis),
    else None. Pallas custom calls cannot be auto-partitioned by XLA,
    so they must run inside a shard_map island on EVERY multi-device
    mesh — including data-parallel-only ones."""
    m = _ACTIVE_MESH
    if m is not None and m.size > 1:
        return m
    return None


class use_spatial_mesh:
    """Context manager: activate a mesh for model tracing (tests)."""

    def __init__(self, mesh: Mesh | None):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        return False
