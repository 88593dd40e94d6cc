"""Single-file checkpoint codec (msgpack via flax.serialization).

Keeps the reference's checkpoint UX — one file per checkpoint with the
``last.ckpt`` / ``epoch={e}_{name}={val}.ckpt`` naming contract
(reference brever/training.py:407-454, 668-699) — without torch pickles.
Values are pytrees of arrays and scalars; jax arrays are materialized to
host numpy before writing.
"""

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    def leaf(x):
        if isinstance(x, jax.Array):
            return np.asarray(x)
        return x
    return jax.tree.map(leaf, tree)


def save_checkpoint(path, state):
    data = serialization.msgpack_serialize(_to_host(state))
    tmp = str(path) + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    import os
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, 'rb') as f:
        return serialization.msgpack_restore(f.read())
