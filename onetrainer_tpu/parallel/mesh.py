"""Device mesh + sharding rules.

The reference is single-GPU and scales vertically (offloading/quant —
SURVEY.md §2.17). Here scaling is horizontal and declarative: a
("data", "fsdp") mesh; batches shard over both axes, parameters and
optimizer state shard over "fsdp" on their largest divisible axis
(ZeRO-3 style), XLA inserts the all-gathers/reduce-scatters over ICI.
This replaces the reference's LayerOffloadConductor entirely
(reference: modules/util/LayerOffloadConductor.py — deleted mechanism
class, see SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
SEQ_AXIS = "sp"


def create_mesh(devices=None, dp: int | None = None, fsdp: int | None = None,
                sp: int = 1) -> Mesh:
    """Create a ("data", "fsdp", "sp") mesh. Default: pure FSDP over all
    devices (dp=1, sp=1) — the right default for diffusion models that fit
    activations per-chip but want weight/optimizer sharding. sp > 1 adds
    Ulysses-style sequence parallelism for video DiTs (long token
    sequences shard over "sp" between blocks; attention reshards to
    head-parallel via XLA all-to-alls — see parallel/sp.py)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None and fsdp is None:
        dp, fsdp = 1, n // sp
    elif dp is None:
        dp = n // (fsdp * sp)
    elif fsdp is None:
        fsdp = n // (dp * sp)
    assert dp * fsdp * sp == n, f"mesh {dp}x{fsdp}x{sp} != {n} devices"
    device_array = np.asarray(devices).reshape(dp, fsdp, sp)
    return Mesh(device_array, (DATA_AXIS, FSDP_AXIS, SEQ_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over every mesh axis (each chip sees unique data)."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(shape: tuple[int, ...], fsdp_size: int,
               min_size_to_shard: int = 2 ** 16) -> P:
    """FSDP rule: shard the largest axis divisible by the fsdp size;
    replicate small tensors (sharding tiny tensors costs more in
    collective latency than it saves in HBM)."""
    if not shape or int(np.prod(shape)) < min_size_to_shard:
        return P()
    # prefer the largest divisible axis
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[axis] = FSDP_AXIS
            return P(*spec)
    return P()


def shard_params(params, mesh: Mesh, min_size_to_shard: int = 2 ** 16):
    """Place a param pytree on the mesh with FSDP sharding."""
    fsdp_size = mesh.shape[FSDP_AXIS]

    def place(leaf):
        leaf = jnp.asarray(leaf)
        spec = param_spec(leaf.shape, fsdp_size, min_size_to_shard)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params)


def param_shardings(params, mesh: Mesh, min_size_to_shard: int = 2 ** 16):
    """The NamedSharding pytree matching shard_params (for jit out_shardings)."""
    fsdp_size = mesh.shape[FSDP_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, param_spec(jnp.shape(leaf), fsdp_size, min_size_to_shard)),
        params)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh, batch-dim sharded.

    Multi-host: each process holds only its own slice of the global batch
    (the loader's `process_batch_slice` handles the split), and
    `jax.make_array_from_process_local_data` assembles the global array —
    no cross-host gather of input data ever happens. Single-host this is
    a plain device_put."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def process_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of the global batch for multi-host input loading
    (each process loads 1/process_count of every batch; sample order is
    deterministic via the crc32-seeded pipeline, so hosts agree on the
    epoch plan without communication)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
