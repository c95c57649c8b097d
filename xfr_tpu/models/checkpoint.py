"""Native parameter checkpointing via Orbax.

The reference's persistence is torch.save/torch.load of state dicts
(reference: python/xfr/utils.py:494-499, models/resnet.py:278).  The
TPU-native equivalent stores the graph-IR params pytree with Orbax so
checkpoints are sharding-aware and resumable on any mesh; torch checkpoints
remain importable via xfr_tpu.models.convert.
"""

from __future__ import annotations

import os


def save_params(params, path):
    """Save a params pytree to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path, template=None):
    """Load a params pytree; ``template`` (matching abstract/real pytree)
    restores with correct dtypes/shardings when provided."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)
