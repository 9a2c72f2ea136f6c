"""Device mesh + sharding utilities — the TPU replacement for L8.

The reference scales with single-process ``nn.DataParallel`` scatter/gather
(``scripts/main.py:120``, ``train_trgb_segnet_conf.py:234``) and a vestigial
gloo DDP path (``scripts/main.py:103-123``). Here parallelism is declarative:
one ``jax.sharding.Mesh`` with a ``data`` axis (extensible with a ``model``
axis), batch arrays sharded over ``data``, parameters replicated, and XLA
inserts the gradient all-reduce over ICI when the loss is jit-compiled.

Multi-host: call :func:`maybe_initialize_distributed` first; the same mesh
spans all processes and cross-host collectives ride DCN automatically.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> None:
    """``jax.distributed.initialize`` iff launched under a multi-process env.

    Replaces ``dist.init_process_group(backend='gloo', init_method='tcp://…')``
    (scripts/main.py:105-107). Coordinator discovery: the TPU runtime
    environment, or the explicit ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` triple (the gloo-TCP-flag
    analog; also what the 2-process CPU tests use). Every trainer CLI
    calls this before touching devices — a no-op single-process, so the
    single-host path is unaffected.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr or jax.distributed.is_initialized():
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if nproc:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    else:
        jax.distributed.initialize()
    _rendezvous_collective()


def _rendezvous_collective() -> None:
    """Run one tiny cross-process collective immediately after joining.

    Two jobs: (a) fail fast on broken inter-host connectivity instead of
    minutes later mid-step; (b) establish the collective clique context
    while every process is at the same point. XLA's CPU/gloo rendezvous
    at the FIRST collective has a fixed 30 s key-value timeout with no
    knob, and without this the first collective happens after model
    compilation — whose duration differs across hosts (cold vs warm
    compile cache, host load) by more than that. Once the context exists
    it is reused by later programs: measured on 2 gloo processes, a
    45 s-skewed subsequent program succeeds after this warm-up and dies
    in rendezvous without it.
    """
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("heatnet_tpu:init")


def create_mesh(
    num_devices: int = -1,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ``(data, model)`` mesh.

    ``num_devices=-1`` uses every visible device. ``model_parallel`` splits
    off a model axis (not needed for reference parity — CNN channel counts are
    small — but first-class so larger backbones can shard).
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch arrays: leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for parameters/optimizer state: fully replicated."""
    return NamedSharding(mesh, P())


def _put_global(x, sharding: NamedSharding):
    """Place a host array under a (possibly multi-host) sharding.

    Single-process: plain ``device_put``. Multi-process: every process
    holds the identical GLOBAL array (trainer loaders are seed-
    deterministic, so each host materializes the same batch — the
    DataParallel-semantics choice; a per-host sampler would halve host
    decode work but change the random stream) and each process donates
    only the shards its local devices own via ``make_array_from_callback``.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) sharded over the data axis.

    The global batch size must divide the data-axis size — the analog of the
    reference's per-GPU batch split, minus the DataParallel batch-doubling
    hack (validation_bdd_mf.py:297-299), which static sharding makes moot.
    Works on multi-host meshes (see :func:`_put_global`).
    """
    sharding = data_sharding(mesh)

    def _put(x):
        return _put_global(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _put_global(x, sharding), tree)


def pad_batch_to(batch, global_batch: int):
    """Right-pad every array's leading dim to ``global_batch`` (repeat last).

    Eval sets have ragged final batches; static shapes keep one jit cache
    entry. Returns (padded_batch, valid_count).
    """
    import jax.numpy as jnp

    def _pad(x):
        n = x.shape[0]
        if n == global_batch:
            return x
        reps = jnp.repeat(x[-1:], global_batch - n, axis=0)
        return jnp.concatenate([x, reps], axis=0)

    first = jax.tree_util.tree_leaves(batch)[0]
    return jax.tree_util.tree_map(_pad, batch), first.shape[0]


def mesh_for_batch(batch_size: int, model_parallel: int = 1) -> Mesh:
    """Mesh whose data axis is the largest device count dividing the batch.

    CLI convenience: reference runs used global batches (4, 30) that need not
    match the chip count; the data axis must divide the batch for even
    sharding, so shrink the mesh rather than crash (remaining devices idle —
    prefer batch sizes that are multiples of the device count).
    """
    import warnings

    total = len(jax.devices())
    n = total // model_parallel
    while n > 1 and batch_size % n != 0:
        n -= 1
    used = max(n, 1) * model_parallel
    if used < total:
        warnings.warn(
            f"batch size {batch_size} uses only {used} of {total} devices "
            f"({total - used} idle) — pick a batch divisible by "
            f"{total // model_parallel} to use the whole slice",
            RuntimeWarning, stacklevel=2)
    return create_mesh(num_devices=used, model_parallel=model_parallel)


def shard_params_tp(mesh: Mesh, params, min_channels: int = 64):
    """Tensor-parallel placement: conv/dense kernels shard their OUTPUT
    channel (last) dim over the model axis; everything else replicates.

    The reference never tensor-parallelizes (nn.DataParallel only, SURVEY
    §2.6); this is the TPU-native extension for backbones whose channel
    counts warrant it. GSPMD inserts the all-gathers/reduce-scatters — the
    model code is unchanged. Kernels with fewer than ``min_channels``
    outputs (or not divisible by the axis size) stay replicated.
    """
    tp = mesh.shape[MODEL_AXIS]

    def _place(x):
        if (tp > 1 and hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[-1] >= min_channels and x.shape[-1] % tp == 0):
            spec = P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(_place, params)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the HEIGHT dim of NHWC images over the data axis.

    The CNN analog of sequence parallelism (SURVEY §2.6/§5: no attention in
    this family, so the spatial extent is the long axis): a single large
    frame is split across chips and GSPMD inserts the halo exchanges the
    3x3/7x7 convs need at shard boundaries. Useful for batch-1 latency on
    frames too large for one chip; numerically identical to unsharded
    execution (tests/test_mesh.py::test_spatial_sharding_matches_unsharded).
    """
    return NamedSharding(mesh, P(None, DATA_AXIS))
