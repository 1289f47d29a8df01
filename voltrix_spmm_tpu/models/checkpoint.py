"""Model checkpoint save/restore via orbax.

The reference has no computation-state checkpointing (SURVEY.md §5 —
its only persistent artifact is the JIT cache). For the training-capable
TPU framework, model/optimizer state checkpointing is provided through
orbax, the standard JAX checkpointing stack.
"""

from __future__ import annotations

import os


def save_checkpoint(path: str, state) -> str:
    """Save a pytree (params / (params, opt_state) / anything) to `path`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, like=None):
    """Restore a pytree saved by `save_checkpoint`. `like` (an example
    pytree with matching structure/shapes/dtypes) enables exact dtype
    restoration; without it, orbax restores as saved."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        import jax

        targets = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, targets)
    return ckptr.restore(path)
