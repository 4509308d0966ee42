"""Dejavu autotuner: tune-on-miss, persistence, fallbacks, cache lock."""

import json
import os

import jax
import jax.numpy as jnp
import pytest

from vllm_triton_backend_tpu.autotune.dejavu import (
    Autotuner,
    ConfigSpace,
    autotune,
    global_cache_lock,
)


@pytest.fixture()
def storage(tmp_path, monkeypatch):
    monkeypatch.setenv("VTB_DEJAVU_STORAGE", str(tmp_path))
    monkeypatch.delenv("VTB_DEJAVU_FORCE_FALLBACK", raising=False)
    return tmp_path


def _make_tuner(calls):
    space = ConfigSpace(
        space={"block": [8, 16, 32]},
        conditions=(lambda c: c["block"] <= 32,),
    )

    @autotune(
        config_space=space,
        key=["n"],
        name="toy_kernel",
        warmup=0,
        rep=1,
    )
    def launcher(x, *, n, block):
        calls.append(block)
        return jnp.sum(x[:block])

    return launcher


def test_tune_on_miss_then_cached(storage):
    calls = []
    tuner = _make_tuner(calls)
    x = jnp.arange(64, dtype=jnp.float32)
    tuner(x, n=64)
    assert set(calls) >= {8, 16, 32}  # all configs benchmarked
    n_after_tune = len(calls)
    tuner(x, n=64)  # cached: exactly one more call
    assert len(calls) == n_after_tune + 1


def test_persistence_across_instances(storage):
    calls = []
    tuner = _make_tuner(calls)
    x = jnp.arange(64, dtype=jnp.float32)
    tuner(x, n=64)
    db_path = tuner._db_path()
    assert os.path.exists(db_path)
    with open(db_path) as f:
        db = json.load(f)
    assert db["evaluated_configs"] == 3
    assert db["cache"]

    calls2 = []
    tuner2 = _make_tuner(calls2)
    tuner2(x, n=64)
    assert len(calls2) == 1  # loaded from disk, no re-tune


def test_informed_fallback_nearest_key(storage):
    calls = []
    tuner = _make_tuner(calls)
    x = jnp.arange(64, dtype=jnp.float32)
    tuner(x, n=64)
    best = tuner._mem[(64,)]
    # force-fallback: a near miss (n=70) must reuse n=64's config
    os.environ["VTB_DEJAVU_FORCE_FALLBACK"] = "1"
    try:
        cfg = tuner.lookup(n=70)
        assert cfg == best
    finally:
        del os.environ["VTB_DEJAVU_FORCE_FALLBACK"]


def test_static_fallback_heuristic(storage):
    space = ConfigSpace(space={"block": [8, 16]})
    tuner = Autotuner(
        lambda x, *, n, block: x * block,
        space,
        key=["n"],
        name="toy2",
        fallback_heuristic=lambda key: {"block": 8 if key[0] < 100 else 16},
    )
    assert tuner.lookup(n=50) == {"block": 8}
    assert tuner.lookup(n=500) == {"block": 16}


def test_cache_lock_freezes_tuning(storage):
    calls = []
    tuner = _make_tuner(calls)
    x = jnp.arange(64, dtype=jnp.float32)
    global_cache_lock.lock()
    try:
        tuner(x, n=64)
        assert len(calls) == 1  # fallback only, no sweep
    finally:
        global_cache_lock.unlock()


def test_no_tuning_under_trace(storage):
    calls = []
    tuner = _make_tuner(calls)

    @jax.jit
    def f(x):
        return tuner(x, n=64)

    f(jnp.arange(64, dtype=jnp.float32))
    # only the single traced call, no benchmarking sweep
    assert len(calls) == 1


def test_conditions_filter_configs():
    space = ConfigSpace(
        space={"a": [1, 2], "b": [10, 20]},
        conditions=(lambda c: c["a"] * c["b"] <= 20,),
    )
    cfgs = space.configs()
    assert {(c["a"], c["b"]) for c in cfgs} == {(1, 10), (1, 20), (2, 10)}


def test_random_search_order(storage):
    """use_random_search shuffles the sweep deterministically per key."""
    import jax.numpy as jnp

    space = ConfigSpace(space={"block": list(range(1, 33))})
    orders = []
    for _ in range(2):
        calls = []

        @autotune(
            config_space=space,
            key=["n"],
            name="toy_random",
            warmup=0,
            rep=1,
            use_random_search=True,
        )
        def launcher(x, *, n, block, _c=calls):
            _c.append(block)
            return jnp.sum(x[:block])

        import shutil

        shutil.rmtree(str(storage), ignore_errors=True)
        launcher(jnp.arange(64, dtype=jnp.float32), n=64)
        orders.append(calls[: len(space.configs())])

    assert sorted(orders[0]) == list(range(1, 33))  # full space still swept
    assert orders[0] != list(range(1, 33))  # ...but not declaration order
    assert orders[0] == orders[1]  # same key -> same seed -> reproducible
