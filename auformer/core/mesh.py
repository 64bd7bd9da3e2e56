"""Device-mesh runtime.

The reference is single-GPU with no collectives (SURVEY.md §2.2). The
TPU-native design scales by data parallelism over a named `jax.sharding.Mesh`
('data' axis rides ICI within a slice), with parameters replicated and the
batch dim sharded. The train step is written as a *global* program under
``jax.jit`` + GSPMD: BatchNorm batch statistics, loss means, and gradient
all-reduces become XLA collectives automatically because every reduction over
the batch axis is a global reduction — no NCCL-style code is translated.

A 'model' axis can be declared in ``mesh_shape`` for future tensor
parallelism; nothing at this model scale (~11–35M params) shards over it yet.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(spec: str, n_devices: int) -> dict[str, int]:
    """Parse "data:-1" or "data:4,model:2" into axis sizes; -1 = fill."""
    axes: dict[str, int] = {}
    fill_axis = None
    for part in spec.split(","):
        name, _, size = part.partition(":")
        size = int(size) if size else -1
        if size == -1:
            if fill_axis is not None:
                raise ValueError(f"multiple -1 axes in mesh spec {spec!r}")
            fill_axis = name.strip()
            axes[fill_axis] = -1
        else:
            axes[name.strip()] = size
    fixed = int(np.prod([s for s in axes.values() if s != -1])) if axes else 1
    if fill_axis is not None:
        if n_devices % max(fixed, 1) != 0:
            raise ValueError(f"{n_devices} devices not divisible by {fixed}")
        axes[fill_axis] = n_devices // max(fixed, 1)
    return axes


def make_mesh(spec: str = "data:-1", devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    axes = parse_mesh_shape(spec, len(devices))
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=names)


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data",
                  batch_dim: int = 0) -> NamedSharding:
    """Shard the batch dim (default: leading) over the data axis,
    replicate the rest. ``batch_dim=1`` is the stacked-batch layout of
    make_multi_train_step's (K, B, ...) leaves."""
    spec = (None,) * batch_dim + (axis,) + (None,) * (ndim - 1 - batch_dim)
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_dim: int = 0,
                replicate_keys: tuple[str, ...] = ()):
    """Place a host batch (pytree of np arrays) onto the mesh, batch-sharded.
    Non-numeric entries (e.g. video_id strings) pass through untouched.
    ``batch_dim=1`` places make_multi_train_step's stacked (K, B, ...)
    leaves with B sharded and K replicated. Top-level keys named in
    ``replicate_keys`` are replicated instead — entries whose leading axis
    is NOT the batch (the frame-dedup unique-frame pool ``frames``, whose
    (U, H, W, C) rows any device's clip_idx rows may reference).

    Multi-host: each process passes its PROCESS-LOCAL batch (global batch /
    process_count rows — train_lib.host_shard sizes the loaders) and the
    global array is assembled with make_array_from_process_local_data;
    device_put with a global NamedSharding would wrongly treat every
    host's local rows as the same global batch."""
    multiprocess = jax.process_count() > 1

    def put(x, replicate=False):
        arr = np.asarray(x)
        if arr.dtype.kind in ("U", "S", "O"):
            return x
        sh = (replicated_sharding(mesh) if replicate
              else data_sharding(mesh, arr.ndim, batch_dim=batch_dim)
              if arr.ndim >= 1 + batch_dim else replicated_sharding(mesh))
        if multiprocess and not replicate:
            return jax.make_array_from_process_local_data(sh, arr)
        return jax.device_put(x, sh)

    if replicate_keys and isinstance(batch, dict):
        return {k: put(v, replicate=k in replicate_keys)
                for k, v in batch.items()}
    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def maybe_init_distributed() -> bool:
    """Multi-host DCN init (SURVEY.md §2.2 table: jax.distributed over DCN;
    ICI handles the in-slice axis). Reads the standard JAX_COORDINATOR_*
    env configuration; no-op single-host otherwise."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False
