"""Pack a pytree into ONE device byte buffer (and unpack on host).

Motivation: on the axon TPU platform every dispatch and every
device->host transfer pays high per-call latency through the tunnel
(BENCH_NOTES.md). A checkpoint snapshot of (params, opt_state) is ~40
leaves; copying and pulling them leaf-by-leaf costs ~40 round trips.
Packing bitcasts every leaf to uint8 and concatenates on device — one
dispatch to snapshot, one transfer to pull — and the host slices the
byte buffer back into numpy arrays (zero-copy views) for pickling.

The byte order matches XLA's bitcast-convert semantics (minor dimension
holds the bytes of each element least-significant first, i.e.
little-endian), which is also the numpy layout on this x86-64 host; a
round-trip test locks bitwise equality (tests/test_utils.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_packer(tree_example):
    """Build (pack, unpack) for pytrees shaped like ``tree_example``.

    ``pack`` is jitted: tree -> (nbytes,) uint8 device array, one dispatch,
    output is a fresh buffer (donation-safe snapshot of live state).
    ``unpack`` is host-side: np.uint8 buffer -> pytree of numpy arrays
    (views into the buffer) with the example's shapes/dtypes.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree_example)
    specs = [(np.shape(l), np.dtype(l.dtype)) for l in leaves]

    @jax.jit
    def pack(tree):
        ls = jax.tree_util.tree_leaves(tree)
        flat = []
        for x in ls:
            x = jnp.asarray(x)
            if x.dtype == jnp.bool_:
                x = x.astype(jnp.uint8)  # byte-compatible with np bool
            if x.dtype != jnp.uint8:
                x = jax.lax.bitcast_convert_type(x, jnp.uint8)
            flat.append(x.reshape(-1))
        return jnp.concatenate(flat) if len(flat) > 1 else flat[0]

    def unpack(buf):
        buf = np.asarray(buf)
        out, off = [], 0
        for shape, dtype in specs:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            nb = dtype.itemsize * n
            arr = np.frombuffer(buf, dtype, count=n, offset=off).reshape(shape)
            out.append(arr)
            off += nb
        assert off == buf.nbytes, (
            f"packed buffer size mismatch: {buf.nbytes} bytes vs spec {off}"
        )
        return jax.tree_util.tree_unflatten(treedef, out)

    return pack, unpack
