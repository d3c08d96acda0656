"""AOT compile-cache probe (VERDICT r3 #6): can a serialized compiled
executable skip the axon remote-compile tax in a fresh process?

The axon platform bypasses JAX's persistent compilation cache (the cache
dir stays empty — BENCH_NOTES round 1), so every process pays minutes of
cold compile. Two candidate escapes:

1. ``jax.export``: lower + compile once, ``serialize`` the Exported, write
   to disk; a fresh process ``deserialize``s and calls it. If the PJRT
   loaded-executable path works through the tunnel, the child skips XLA
   compilation entirely.
2. persistent cache re-check: write a compiled entry and see whether a
   second process hits it (documents the platform behavior either way).

Result (round 4, v5e): jax.export serializes STABLEHLO, not a compiled
executable — the child re-compiles at first call (deserialize 1.87 s vs
cold 1.94 s on the small graph: no win by construction). The actual
escape is ``jax.experimental.serialize_executable`` (PJRT
LoadedExecutable pickling), probed by ``parent_exec`` / ``child_exec``
below.

Usage:
    python scripts/aot_probe.py parent        # jax.export path
    python scripts/aot_probe.py parent_exec   # serialize_executable path
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
EXPORT_PATH = Path("/tmp/dbw_aot_probe.bin")


def _build():
    import jax
    import jax.numpy as jnp

    # a deliberately non-trivial graph: conv + matmul chain so compile
    # time is measurable (~seconds) without being minutes
    def fn(x, w):
        for _ in range(8):
            x = jnp.tanh(x @ w)
            x = jax.lax.conv_general_dilated(
                x[None, :, :, None], jnp.ones((3, 3, 1, 1), x.dtype),
                (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0, :, :, 0]
        return x.sum()

    x = jnp.ones((256, 256), jnp.float32)
    w = jnp.ones((256, 256), jnp.float32)
    return fn, (x, w)


def parent():
    import jax
    from jax import export

    fn, args = _build()
    t0 = time.perf_counter()
    exp = export.export(jax.jit(fn))(*args)
    data = exp.serialize()
    t_export = time.perf_counter() - t0
    EXPORT_PATH.write_bytes(data)

    # time the call in THIS process (compile already paid)
    t0 = time.perf_counter()
    out = exp.call(*args)
    jax.block_until_ready(out)
    t_parent_call = time.perf_counter() - t0

    # fresh process: deserialize + first call
    r = subprocess.run(
        [sys.executable, __file__, "child"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    print(r.stdout)
    if r.returncode != 0:
        print(r.stderr[-3000:])
    # control: fresh process compiling from scratch
    r2 = subprocess.run(
        [sys.executable, __file__, "cold"],
        capture_output=True, text=True, cwd=str(REPO),
    )
    print(r2.stdout)
    if r2.returncode != 0:
        print(r2.stderr[-3000:])
    print(json.dumps({
        "probe": "aot_export",
        "parent_export_s": round(t_export, 2),
        "parent_call_s": round(t_parent_call, 3),
    }))


def child():
    import jax
    from jax import export

    fn, args = _build()
    t0 = time.perf_counter()
    exp = export.deserialize(EXPORT_PATH.read_bytes())
    t_deser = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = exp.call(*args)
    jax.block_until_ready(out)
    t_first = time.perf_counter() - t0
    print(json.dumps({
        "probe": "child_deserialize",
        "deserialize_s": round(t_deser, 2),
        "first_call_s": round(t_first, 2),
    }))


def _build_big():
    """A graph whose cold compile is tens of seconds on the axon path, so
    the executable-reload delta is unambiguous."""
    import jax
    import jax.numpy as jnp

    def fn(x, w):
        # unrolled so XLA sees a large module (scan would dedup the work)
        outs = []
        for k in range(24):
            x = jnp.tanh(x @ w) + 0.01 * k
            x = jax.nn.softmax(x, axis=-1) @ w
            outs.append(x.sum())
        return jnp.stack(outs).sum()

    x = jnp.ones((512, 512), jnp.float32)
    w = jnp.ones((512, 512), jnp.float32)
    return fn, (x, w)


EXEC_PATH = Path("/tmp/dbw_aot_exec.pkl")


def parent_exec():
    import pickle

    import jax
    from jax.experimental import serialize_executable as se

    fn, args = _build_big()
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*args).compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    payload, in_tree, out_tree = se.serialize(compiled)
    EXEC_PATH.write_bytes(pickle.dumps(
        (payload, in_tree, out_tree)))
    t_ser = time.perf_counter() - t0
    print(json.dumps({
        "probe": "parent_serialize_executable",
        "compile_s": round(t_compile, 2),
        "serialize_s": round(t_ser, 2),
        "payload_mb": round(EXEC_PATH.stat().st_size / 1e6, 2),
    }))
    for mode in ("child_exec", "cold_big"):
        r = subprocess.run(
            [sys.executable, __file__, mode],
            capture_output=True, text=True, cwd=str(REPO),
        )
        print(r.stdout)
        if r.returncode != 0:
            print(r.stderr[-3000:])


def child_exec():
    import pickle

    import jax
    from jax.experimental import serialize_executable as se

    fn, args = _build_big()
    t0 = time.perf_counter()
    payload, in_tree, out_tree = pickle.loads(EXEC_PATH.read_bytes())
    loaded = se.deserialize_and_load(payload, in_tree, out_tree)
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = loaded(*args)  # Compiled.__call__; .call is internal API
    jax.block_until_ready(out)
    t_first = time.perf_counter() - t0
    print(json.dumps({
        "probe": "child_deserialize_executable",
        "load_s": round(t_load, 2),
        "first_call_s": round(t_first, 2),
    }))


def cold_big():
    import jax

    fn, args = _build_big()
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t_first = time.perf_counter() - t0
    print(json.dumps({
        "probe": "child_cold_compile_big",
        "first_call_s": round(t_first, 2),
    }))


def cold():
    import jax

    fn, args = _build()
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t_first = time.perf_counter() - t0
    print(json.dumps({
        "probe": "child_cold_compile",
        "first_call_s": round(t_first, 2),
    }))


if __name__ == "__main__":
    {"parent": parent, "child": child, "cold": cold,
     "parent_exec": parent_exec, "child_exec": child_exec,
     "cold_big": cold_big}[sys.argv[1]]()
