"""Single-file checkpoint codec (msgpack via flax.serialization).

Keeps the reference's checkpoint UX — one file per checkpoint with the
``last.ckpt`` / ``epoch={e}_{name}={val}.ckpt`` naming contract
(reference brever/training.py:407-454, 668-699) — without torch pickles.
Values are pytrees of arrays and scalars; jax arrays are materialized to
host numpy before writing.

Device arrays are fetched with ONE device-to-host transfer per dtype
group, not one per leaf: a Conv-TasNet train state is ~1,150 leaves
(params + Adam moments), and on a remote/tunneled backend every
``np.asarray(leaf)`` is a full network round trip — measured minutes
per checkpoint save, every epoch. The leaves are raveled and
concatenated on device (one jitted executable per leaf-signature,
compiled once per process) and sliced back on the host.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

_PACK_CACHE = {}


def _pack_fn(n_leaves):
    fn = _PACK_CACHE.get(n_leaves)
    if fn is None:
        fn = jax.jit(lambda *xs: jnp.concatenate(
            [x.ravel() for x in xs]))
        _PACK_CACHE[n_leaves] = fn
    return fn


def _to_host(tree):
    leaves, treedef = jax.tree.flatten(tree)
    by_dtype = {}
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array):
            by_dtype.setdefault(np.dtype(x.dtype), []).append(i)
    out = list(leaves)
    for dt, idxs in by_dtype.items():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = np.asarray(leaves[i])
            continue
        flat = _pack_fn(len(idxs))(*[leaves[i] for i in idxs])
        host = np.asarray(flat)          # ONE d2h transfer
        offset = 0
        for i in idxs:
            n = max(int(np.prod(leaves[i].shape)), 1)
            out[i] = host[offset:offset + n].reshape(leaves[i].shape)
            offset += n
    return jax.tree.unflatten(treedef, out)


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
