"""Device mesh and sharding helpers.

The reference has no distributed training (SURVEY.md §2.5: single GPU,
``CUDA_VISIBLE_DEVICES="0"``). The TPU-native equivalent is SPMD data
parallelism over an ICI mesh: batches are sharded on a ``data`` axis,
parameters are replicated, and XLA inserts the gradient ``psum`` — no
hand-written collectives. A ``model`` axis is reserved so conv-channel
sharding can be added without re-plumbing.

Multi-host: call :func:`initialize_distributed` first (jax.distributed over
DCN); each host then feeds its local shard of the global batch via
``DataLoader(shard_index=process_index, num_shards=process_count)``.

Verified recipe (tests/test_multihost.py runs it as 2 real CPU processes):

    initialize_distributed("127.0.0.1:<port>", num_processes=N,
                           process_id=<rank>)          # every process
    mesh = make_mesh()              # global mesh over all processes' devices
    loader = DataLoader(ds, shard_index=jax.process_index(),
                        num_shards=jax.process_count())
    # cross-process reductions: multihost_utils.process_allgather, or psum
    # inside the pjit step — identical metrics to a single-process run.
"""
from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up over DCN; no-op for single-process runs.

    Must run before anything that initialises the XLA backend (jax.devices,
    any computation). With only ``coordinator`` given, the process count/rank
    come from the cluster environment (TPU pods auto-detect); pass
    ``num_processes`` + ``process_id`` explicitly for manual clusters
    (e.g. the CPU two-process test harness)."""
    if coordinator is None:
        return
    if jax.distributed.is_initialized():
        return  # already initialised
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(
                f"{len(devices)} devices do not divide over n_model="
                f"{n_model}; pass n_data explicitly to use a device subset")
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs more than the "
                         f"{len(devices)} available devices")
    try:
        # topology-aware placement: on a multi-chip slice a naive row-major
        # reshape can put model-axis neighbours on non-adjacent chips, so
        # TP/SP collectives cross extra ICI hops; mesh_utils maps the
        # logical grid onto the physical torus
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_device_mesh(
            (n_data, n_model), devices=devices[: n_data * n_model])
    except (ValueError, NotImplementedError, AssertionError,
            RuntimeError) as e:
        # RuntimeError included: topology discovery raises it on exactly
        # the odd backends/subsets this fallback exists for
        # device subsets/backends mesh_utils can't map; the row-major
        # fallback is correct but topology-blind — say so once, loudly
        # enough that divergent placement across jax.distributed
        # processes would be traceable
        warnings.warn(
            f"make_mesh: mesh_utils.create_device_mesh failed ({e!r}); "
            f"falling back to row-major device placement (correct, but "
            f"not topology-aware)", RuntimeWarning, stacklevel=2)
        grid = np.asarray(devices[: n_data * n_model]).reshape(n_data,
                                                               n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with the leading axis split over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over ``data`` AND image rows over ``model`` (NHWC dim 1).

    The conv-net analog of sequence parallelism (SURVEY.md §5.7): GSPMD
    partitions every conv spatially and inserts the halo exchanges
    (collective-permutes of the kernel-support rows) over ICI, so one big
    tile's activations spread across the model axis. Verified bit-close to
    the replicated forward through the full flagship model (pixel-shuffle
    heads included) in tests/test_tensor_parallel.py."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def tp_param_spec(x, n_model: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter array.

    Convolution kernels are Flax HWIO: the output-channel (last) dim is
    sharded over ``model``; 1-D biases/scales shard the same channel dim;
    2-D dense kernels shard the output features. Anything not divisible by
    the model-axis size stays replicated — GSPMD then inserts the
    all-gathers/reduce-scatters where a sharded output feeds the next
    contraction (the scaling-book "pick a mesh, annotate, let XLA insert
    collectives" recipe)."""
    if n_model <= 1:
        return P()
    if x.ndim >= 2 and x.shape[-1] % n_model == 0:
        return P(*([None] * (x.ndim - 1) + [MODEL_AXIS]))
    if x.ndim >= 2 and x.shape[-2] % n_model == 0:
        # output channels indivisible (e.g. B4's SE-reduce (1,1,672,28)):
        # shard the INPUT-channel dim instead — Megatron-style row
        # parallelism; GSPMD inserts the partial-sum all-reduce on the
        # conv/dense output. Without this the big squeeze-excite kernels
        # silently replicate at the shipped B4 shapes
        # (tests/test_flagship_multichip.py).
        return P(*([None] * (x.ndim - 2) + [MODEL_AXIS, None]))
    if x.ndim == 1 and x.shape[0] % n_model == 0:
        return P(MODEL_AXIS)
    return P()


def fsdp_param_spec(x, n_data: int) -> P:
    """Fully-sharded (ZeRO-3 style) PartitionSpec for one array.

    Parameters AND their optimizer moments shard their largest divisible
    dim over the ``data`` axis, so each chip holds 1/n of the model + Adam
    state; GSPMD inserts the all-gathers where full kernels are needed in
    the forward/backward and keeps the elementwise Adam update sharded.
    Conv kernels (HWIO) prefer the output-channel dim (contiguous lanes);
    1-D vectors shard dim 0; indivisible shapes stay replicated."""
    if n_data <= 1 or x.ndim == 0:
        return P()
    if x.ndim >= 2 and x.shape[-1] % n_data == 0:
        return P(*([None] * (x.ndim - 1) + [DATA_AXIS]))
    if x.shape[0] % n_data == 0:
        return P(*([DATA_AXIS] + [None] * (x.ndim - 1)))
    # neither end dim divides (e.g. B4's SE-reduce (1,1,672,28)): FSDP is
    # pure storage partitioning — ANY divisible dim keeps the kernel
    # 1/n-resident; pick the largest so shards stay balanced. Without this
    # the big squeeze-excite kernels silently fell back to full
    # replication at the shipped B4 shapes
    # (tests/test_flagship_multichip.py).
    divisible = [d for d in range(x.ndim) if x.shape[d] % n_data == 0]
    if divisible:
        d = max(divisible, key=lambda i: x.shape[i])
        return P(*[DATA_AXIS if i == d else None for i in range(x.ndim)])
    return P()


def shard_state_fsdp(tree, mesh: Mesh):
    """Place a train-state pytree fully sharded over the ``data`` axis.

    The reference is single-GPU (SURVEY.md §2.5); this is the TPU-native
    memory-scaling mode: with DP the whole 25 M-param state is replicated
    per chip, with FSDP each chip stores a 1/n shard of params + both Adam
    moments and XLA materialises full kernels only transiently (all-gather
    before use, reduce-scatter of the gradients) — the scaling-book ZeRO
    recipe, expressed purely as shardings. Numerics match the replicated
    DP step (tests/test_fsdp.py; asserted in the driver dryrun)."""
    n_data = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, fsdp_param_spec(x, n_data)))
        if hasattr(x, "ndim") else x, tree)


def shard_params_tp(params, mesh: Mesh):
    """Place a parameter pytree with conv/dense output channels sharded over
    the ``model`` axis (channel/tensor parallelism for the conv zoo).

    The reference is single-GPU (SURVEY.md §2.5); this is the TPU-native
    growth path: the 17-25 M-param CNNs fit one chip, but the same
    annotations let the frozen RRDBNet trunk's weights and activations split
    across ICI neighbours when a larger SR backbone is swapped in."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, tp_param_spec(x, n_model))), params)
