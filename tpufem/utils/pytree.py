"""Identity-aux pytree registration for array-holding framework objects.

Large device arrays closed over by a jitted function become XLA program
constants; on the remote-execution TPU path constants are rematerialized
per call (measured ~600x slowdown on gathers). Registering the holder
classes as pytrees lets them be passed as *arguments* instead, so their
arrays are proper buffer parameters.

The aux_data is the original object itself: jit cache keys then compare
by object identity (stable for a long-lived Assembler), and unflatten
shallow-copies the object with the traced leaves swapped in.
"""

from __future__ import annotations

import copy
from typing import Sequence

import jax


def register_pytree_with_leaves(cls, leaf_fields: Sequence[str]) -> None:
    leaf_fields = tuple(leaf_fields)

    def flatten(obj):
        return tuple(getattr(obj, f) for f in leaf_fields), obj

    def unflatten(aux, leaves):
        obj = copy.copy(aux)
        for f, v in zip(leaf_fields, leaves):
            object.__setattr__(obj, f, v)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
