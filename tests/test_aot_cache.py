"""AOT executable cache (utils/aot_cache.py).

On the CPU backend the cache is disabled by default (`auto`), so these
tests force DBW_AOT=1 to exercise the real serialize/deserialize path —
jax.experimental.serialize_executable works on the CPU PJRT client too.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbw_tpu.utils.aot_cache import AotJit, aot_jit, cached_compile


@pytest.fixture()
def aot_on(tmp_path, monkeypatch):
    monkeypatch.setenv("DBW_AOT", "1")
    return tmp_path


def test_cached_compile_roundtrip(aot_on):
    def fn(x, y):
        return jnp.tanh(x @ y).sum()

    x = jnp.ones((8, 8)), jnp.ones((8, 8))
    lowered = jax.jit(fn).lower(*x)
    c1 = cached_compile(lowered, label="t", cache_dir=aot_on)
    files = list(aot_on.glob("t-*.aotexec"))
    assert len(files) == 1
    # second compile of the identical program must HIT (same single file)
    c2 = cached_compile(jax.jit(fn).lower(*x), label="t", cache_dir=aot_on)
    assert list(aot_on.glob("t-*.aotexec")) == files
    np.testing.assert_allclose(c1(*x), c2(*x))


def test_aot_jit_matches_plain_jit(aot_on):
    def fn(x):
        return jnp.sin(x) * 2.0

    x = jnp.linspace(0, 1, 16)
    wrapped = AotJit(fn, label="m", cache_dir=aot_on)
    np.testing.assert_allclose(wrapped(x), jax.jit(fn)(x), rtol=1e-6)
    # new signature -> new entry, both callable
    y = jnp.linspace(0, 1, 32)
    np.testing.assert_allclose(wrapped(y), jax.jit(fn)(y), rtol=1e-6)
    assert len(list(aot_on.glob("m-*.aotexec"))) == 2


def test_aot_jit_donation(aot_on):
    @aot_jit(donate_argnums=(0,), label="d", cache_dir=aot_on)
    def step(p, g):
        return p - 0.1 * g

    p = jnp.ones((64,))
    g = jnp.ones((64,))
    for _ in range(3):
        p = step(p, g)
    np.testing.assert_allclose(np.asarray(p), 1.0 - 0.3, rtol=1e-6)


def test_corrupt_entry_recompiles(aot_on):
    def fn(x):
        return x + 1

    x = jnp.ones((4,))
    cached_compile(jax.jit(fn).lower(x), label="c", cache_dir=aot_on)
    (path,) = aot_on.glob("c-*.aotexec")
    path.write_bytes(b"garbage")
    c = cached_compile(jax.jit(fn).lower(x), label="c", cache_dir=aot_on)
    np.testing.assert_allclose(np.asarray(c(x)), 2.0)


def test_disabled_on_cpu_auto(monkeypatch, tmp_path):
    monkeypatch.setenv("DBW_AOT", "auto")
    wrapped = AotJit(lambda x: x * 2, label="off", cache_dir=tmp_path)
    out = wrapped(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(out), 2.0)
    assert jax.default_backend() != "cpu" or not list(tmp_path.iterdir())
