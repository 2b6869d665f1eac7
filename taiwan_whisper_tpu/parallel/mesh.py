"""Device mesh construction and logical-axis sharding.

TPU-native replacement for the reference's dormant T5X partitioner
(reference: training/flax/distil_whisper/partitioner.py:150-339,487-571).
Instead of T5X's `param_with_axes` machinery we keep a small table of
*logical axis* names and map them onto a `jax.sharding.Mesh` with axes
``("data", "model")``; activations/params are annotated with
`with_sharding_constraint` inside jit.

The same code paths run on a single chip (trivial 1x1 mesh), a real pod
slice, or a virtual CPU mesh for tests
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Logical axis -> mesh axis. This is the 2-D layout of the reference's
# `standard_logical_axis_rules` (partitioner.py:487-571): batch over data;
# vocab / mlp / heads / joined_kv over model; embed & length replicated.
LOGICAL_RULES = {
    "batch": DATA_AXIS,
    "vocab": MODEL_AXIS,
    "mlp": MODEL_AXIS,
    "heads": MODEL_AXIS,
    "joined_kv": MODEL_AXIS,
    "kv": None,
    "embed": None,
    "length": None,
    "num_mel": None,
    "layers": None,
    "cache_seq": None,
}

_local = threading.local()


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh.

    ``data=-1`` means "all remaining devices". On a real TPU slice JAX's
    device order already follows the physical torus, so a plain reshape keeps
    the ``model`` axis on adjacent chips (ICI); this replaces the reference's
    hand-rolled coordinate tiling (partitioner.py:150-307).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        model = 1
    if data < 0:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def get_active_mesh() -> Optional[Mesh]:
    return getattr(_local, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Activate a mesh for `shard()` constraints within the context.

    Also enters `jax.sharding.use_mesh` so that bare PartitionSpecs are legal
    inside jit bodies.
    """
    prev = getattr(_local, "mesh", None)
    _local.mesh = mesh
    try:
        if mesh is None:
            yield None
        else:
            with jax.sharding.set_mesh(mesh):
                yield mesh
    finally:
        _local.mesh = prev


def logical_to_spec(logical_axes: Sequence[Optional[str]]) -> P:
    """Map a tuple of logical axis names to a PartitionSpec via LOGICAL_RULES."""
    return P(*[LOGICAL_RULES.get(a) if a is not None else None for a in logical_axes])


def shard(x, *logical_axes):
    """Annotate ``x`` with a sharding constraint derived from logical axes.

    No-op when no mesh is active (single-device tests / eager use), exactly
    the graceful-degradation behavior of the reference's
    `pjit_with_cpu_fallback` (partitioner.py:92-110).
    """
    mesh = get_active_mesh()
    if mesh is None:
        return x
    spec = logical_to_spec(logical_axes)
    # Drop mesh axes that don't exist or are trivial on this mesh.
    cleaned = []
    for axis in spec:
        if axis is None or axis not in mesh.axis_names or mesh.shape[axis] == 1:
            cleaned.append(None)
        else:
            cleaned.append(axis)
    if all(a is None for a in cleaned):
        return x
    return jax.lax.with_sharding_constraint(x, P(*cleaned))


def named_sharding(mesh: Mesh, *logical_axes) -> NamedSharding:
    return NamedSharding(mesh, logical_to_spec(logical_axes))


def host_local_slice(
    n_items: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """The contiguous shard of ``n_items`` owned by this host (multi-host data
    loading; replaces the per-rank-file sharding of the reference's
    dataset/cool_dataset.py:216-225). ``process_index``/``process_count``
    override the jax runtime values (for tests / external launchers)."""
    pid = jax.process_index() if process_index is None else process_index
    nproc = jax.process_count() if process_count is None else process_count
    per = n_items // nproc
    extra = n_items % nproc
    start = pid * per + min(pid, extra)
    return slice(start, start + per + (1 if pid < extra else 0))
