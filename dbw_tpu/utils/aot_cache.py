"""AOT compiled-executable cache: skip the axon remote-compile tax.

The axon TPU platform bypasses JAX's persistent compilation cache (the
cache dir stays empty — BENCH_NOTES round 1), so EVERY process pays the
full XLA compile through the tunnel: ~209 s for the bench step graph,
~19 min for the trainer's first scanned window (VERDICT r3 weak #3).

``jax.export`` doesn't help: it serializes StableHLO, which still
compiles at first call in the child (probed: deserialize 1.87 s vs cold
1.94 s on a small graph — no win by construction, scripts/aot_probe.py).
What DOES work on this platform is ``jax.experimental
.serialize_executable``: it pickles the PJRT *compiled* executable, and
``deserialize_and_load`` hands it straight back to the runtime — probed
round 4 on the v5e: child load 0.05 s, first call instant.

This module wraps that in a content-addressed on-disk cache:

- key = SHA256 of (jax/jaxlib version, platform, device kind, device
  count, XLA_FLAGS, the full lowered HLO text). The HLO text covers
  every shape, dtype, donation, constant and flag that affects codegen,
  so a stale hit is impossible by construction — any change to the
  traced program changes the key.
- value = the pickled (payload, in_tree, out_tree) triple from
  ``serialize_executable.serialize``.

``AotJit`` is the call-site wrapper: construct it like ``jax.jit`` and
call it; the first call per abstract-shape signature traces + lowers
(cheap, host-side), then either loads the cached executable (seconds)
or compiles + persists it (one-time). Every failure mode falls back to
the plain jitted path with a warning — the cache can only ever make a
run faster, never wrong or dead.

Numerical safety: the deserialized artifact IS the byte-identical
executable the compile produced — there is no re-lowering or flag drift
between a hit and the original compile.

Disabled on the CPU backend (compiles are fast there and tests sweep
many shapes) and via ``DBW_AOT=0``.

Trust boundary: entries are loaded with ``pickle.loads``, so anyone who
can write the cache directory can execute code in every later process
that reads it. The cache dir is created mode 0o700 and entries not owned
by the current uid are rejected; the remaining assumption — same-uid
processes are trusted — is the normal single-user dev-box model. Point
``cache_dir``/``DBW_AOT`` elsewhere (or off) on shared machines.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
from functools import partial
from pathlib import Path

import jax

DEFAULT_CACHE_DIR = Path(__file__).resolve().parents[2] / ".jax_cache" / "aot"


def _enabled() -> bool:
    flag = os.environ.get("DBW_AOT", "auto").lower()
    if flag in ("0", "false", "off"):
        return False
    if flag in ("1", "true", "on"):
        return True
    # auto: only where compiles are expensive and serialization is probed
    return jax.default_backend() in ("tpu", "axon")


def _env_key() -> str:
    import jaxlib

    dev = jax.devices()[0]
    return "|".join(
        [
            jax.__version__,
            getattr(jaxlib, "__version__", ""),
            dev.platform,
            getattr(dev, "device_kind", ""),
            str(jax.device_count()),
            os.environ.get("XLA_FLAGS", ""),
            os.environ.get("LIBTPU_INIT_ARGS", ""),
        ]
    )


def cached_compile(lowered, label: str = "fn", cache_dir=None):
    """Compile a ``jax.stages.Lowered``, going through the on-disk
    executable cache. Returns a ``jax.stages.Compiled``."""
    from jax.experimental import serialize_executable as se

    cache_dir = Path(cache_dir or DEFAULT_CACHE_DIR)
    digest = hashlib.sha256(
        (_env_key() + "\x00" + lowered.as_text()).encode()
    ).hexdigest()[:32]
    path = cache_dir / f"{label}-{digest}.aotexec"

    if path.exists():
        try:
            st = path.stat()
            if hasattr(os, "getuid") and st.st_uid != os.getuid():
                raise PermissionError(
                    f"cache entry owned by uid {st.st_uid}, not "
                    f"{os.getuid()} — refusing to unpickle")
            payload, in_tree, out_tree, dev_ids = pickle.loads(
                path.read_bytes())
            # the executable was compiled for a specific device set; loading
            # it onto the backend's FULL device list breaks when the process
            # exposes more devices than the program uses (e.g. the 8-device
            # virtual CPU test mesh running a 1-device program)
            by_id = {d.id: d for d in jax.devices()}
            compiled = se.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[by_id[i] for i in dev_ids])
            print(f"[aot_cache] {label}: loaded compiled executable "
                  f"({path.name}, {path.stat().st_size / 1e6:.1f} MB)")
            return compiled
        except Exception as e:  # stale/corrupt entry: recompile below
            print(f"[aot_cache] {label}: load failed ({type(e).__name__}: "
                  f"{e}); recompiling")

    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        dev_ids = [
            d.id for d in compiled._executable.xla_executable.local_devices()
        ]
        cache_dir.mkdir(parents=True, exist_ok=True, mode=0o700)
        # atomic publish: a concurrent process never reads a half-written
        # entry (tmp file on the same filesystem, then rename)
        fd, tmp = tempfile.mkstemp(dir=str(cache_dir), suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(pickle.dumps((payload, in_tree, out_tree, dev_ids)))
        os.replace(tmp, path)
        print(f"[aot_cache] {label}: compiled + cached "
              f"({path.name}, {path.stat().st_size / 1e6:.1f} MB)")
    except Exception as e:
        print(f"[aot_cache] {label}: serialize failed "
              f"({type(e).__name__}: {e}); executable not cached")
    return compiled


class AotJit:
    """``jax.jit`` with the executable cache behind it.

    >>> step = AotJit(fn, donate_argnums=(0, 1), label="train_step")
    >>> out = step(*args)          # first call: load-or-compile
    >>> out = step(*args)          # later calls: plain Compiled dispatch

    One cache entry per abstract-shape signature (a new signature lowers
    and load-or-compiles again, like jit's own signature cache). If the
    cache is disabled or anything in the AOT path fails, calls route
    through the ordinary jitted function.
    """

    def __init__(self, fn, label: str = "fn", cache_dir=None, **jit_kwargs):
        self._jit = jax.jit(fn, **jit_kwargs)
        self._label = label
        self._cache_dir = cache_dir
        self._compiled = {}
        self._broken = not _enabled()

    def _sig(self, args):
        # shape/dtype + SHARDING per leaf: a same-shaped array placed
        # differently must not hit another placement's Compiled (jit's own
        # signature cache keys on sharding too)
        leaves, treedef = jax.tree_util.tree_flatten(args)
        return (
            treedef,
            tuple(
                (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))),
                 str(getattr(x, "sharding", None)))
                for x in leaves
            ),
        )

    def __call__(self, *args):
        if self._broken:
            return self._jit(*args)
        sig = self._sig(args)
        fn = self._compiled.get(sig)
        if fn is None:
            try:
                lowered = self._jit.lower(*args)
                fn = cached_compile(
                    lowered, label=self._label, cache_dir=self._cache_dir
                )
            except Exception as e:
                print(f"[aot_cache] {self._label}: AOT path failed "
                      f"({type(e).__name__}: {e}); using plain jit")
                self._broken = True
                return self._jit(*args)
            self._compiled[sig] = fn
        try:
            return fn(*args)
        except Exception as e:
            # belt-and-braces: any dispatch-time incompatibility of a
            # cached executable (placement drift, donation mismatch)
            # routes to the always-correct jitted path instead of dying
            print(f"[aot_cache] {self._label}: compiled dispatch failed "
                  f"({type(e).__name__}: {e}); using plain jit")
            self._compiled.pop(sig, None)
            return self._jit(*args)


def aot_jit(fn=None, *, label="fn", cache_dir=None, **jit_kwargs):
    """Decorator form of :class:`AotJit`."""
    if fn is None:
        return partial(aot_jit, label=label, cache_dir=cache_dir,
                       **jit_kwargs)
    return AotJit(fn, label=label, cache_dir=cache_dir, **jit_kwargs)
