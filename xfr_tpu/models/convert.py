"""Torch-checkpoint -> graph-IR parameter conversion.

The reference ships torch ``state_dict`` checkpoints (resnet.py:278,
lightcnn.py:300-303, resnet50_128.py:358-360).  Model builders in this
package name their parameters by the exact torch state_dict prefixes, so
conversion is mechanical: conv/linear map weight/bias -> w/b, batchnorm maps
weight/bias/running_mean/running_var -> gamma/beta/mean/var.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np_of(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def params_from_state_dict(param_shapes, state_dict, dtype=jnp.float32,
                           strict=True, runtime_init=()):
    """Build the params dict for a graph from a torch state_dict mapping.

    Args:
      param_shapes: GraphBuilder.param_shapes of the target graph.
      state_dict: mapping of torch parameter names to tensors/arrays.
      strict: verify shapes match the template.
      runtime_init: pnames the reference constructs at runtime rather
        than storing in the checkpoint (e.g. the external fc1 triplet
        classifier, whitebox.py:216-229) — when absent from the
        state_dict they are deterministically initialized instead of
        raising (and converted normally when a replica does carry them).
    """
    from xfr_tpu.models import common

    params = {}
    for pname, shapes in param_shapes.items():
        p = {}
        if "gamma" in shapes:  # batchnorm
            key_map = {"gamma": "weight", "beta": "bias",
                       "mean": "running_mean", "var": "running_var"}
        else:
            key_map = {"w": "weight", "b": "bias"}
        if pname in runtime_init and not all(
                f"{pname}.{key_map[k]}" in state_dict for k in shapes):
            params[pname] = common.init_params({pname: shapes},
                                               seed=0)[pname]
            continue
        for key in shapes:
            sd_key = f"{pname}.{key_map[key]}"
            if sd_key not in state_dict:
                raise KeyError(
                    f"checkpoint missing '{sd_key}' for param '{pname}'")
            arr = _np_of(state_dict[sd_key])
            if strict and tuple(arr.shape) != tuple(shapes[key]):
                raise ValueError(
                    f"shape mismatch for {sd_key}: checkpoint "
                    f"{arr.shape} vs template {shapes[key]}")
            p[key] = jnp.asarray(arr, dtype)
        params[pname] = p
    return params


def load_torch_checkpoint(path, strip_prefix=None, key="state_dict"):
    """torch.load a checkpoint file, optionally unwrapping a DataParallel
    'module.' prefix (reference: lightcnn.py:300-303)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and key in ckpt:
        ckpt = ckpt[key]
    if strip_prefix:
        ckpt = {(k[len(strip_prefix):] if k.startswith(strip_prefix) else k):
                v for k, v in ckpt.items()}
    return ckpt
