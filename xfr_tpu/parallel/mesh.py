"""Device-mesh utilities: the TPU-native replacement for the reference's
GPU-id queue (reference: eval/generate_inpaintinggame_wb_saliency_maps_multigpu.py:121-231).

The reference scales by forking one Python process per GPU and sharding the
(subject, mask, image) job table through a multiprocessing queue.  Here a
``jax.sharding.Mesh`` plus NamedSharding annotations does the same job
in-process: batches (mask stacks, probe stacks, blend stacks) shard over the
'dp' axis, large classifier weights can shard over 'mp', and XLA inserts the
ICI collectives.  Multi-host runs partition the job table deterministically
by process index (xfr_tpu.parallel.distributed).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("dp", "mp"), devices=None):
    """Build a mesh over available devices.

    shape=None: all devices on the first axis (pure data parallel).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def auto_mesh(min_devices=2):
    """A pure-dp mesh over all visible devices when more than one exists,
    else None.  Production CLIs call this so a single process drives a
    whole slice (the reference needed one process per GPU,
    generate_..._multigpu.py:121-231)."""
    if len(jax.devices()) < min_devices:
        return None
    return make_mesh(None, ("dp", "mp"))


def mesh_key(mesh):
    """Stable identity for kernel-cache keys: axis layout + device ids.
    ``id(mesh)`` would only be unique while the cached closure pins the
    mesh alive — and a process that churns meshes (repeated ``use_mesh``
    in a notebook or a long service) would accumulate one cache entry
    per Mesh *object* instead of per mesh *shape*."""
    if mesh is None:
        return None
    return (tuple(mesh.shape.items()),
            tuple(d.id for d in mesh.devices.flat))


def data_sharding(mesh, axis="dp", rank=1):
    """NamedSharding that splits the leading dim over ``axis``."""
    spec = [None] * rank
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh, x, axis="dp"):
    """Place array ``x`` with its leading dim sharded over ``axis``.

    Pads the leading dim up to a multiple of the axis size (zeros) and
    returns (sharded_x, original_n).
    """
    x = np.asarray(x)
    n = x.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
    return jax.device_put(x, data_sharding(mesh, axis, x.ndim)), n


def replicate(mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def classifier_tp_shardings(mesh, params, classifier_pname, axis="mp"):
    """Shardings for a params dict with the classifier rows (classes dim)
    sharded over the tensor axis — the 65359-class fc2 of the STR-Janus
    ResNet is the one genuinely large matmul in the zoo."""
    shardings = {}
    for pname, p in params.items():
        sh = {}
        for k, v in p.items():
            if pname == classifier_pname and k == "w":
                sh[k] = NamedSharding(mesh, P(axis, None))
            elif pname == classifier_pname and k == "b":
                sh[k] = NamedSharding(mesh, P(axis))
            else:
                sh[k] = NamedSharding(mesh, P())
        shardings[pname] = sh
    return shardings
