"""Persistent Pallas-config autotuner (the triton-dejavu analog).

Semantics recreated from the reference's consumed API surface (SURVEY.md
§2.3; reference kernels/triton_unified_attention.py:205-266):

* ``@autotune(config_space=ConfigSpace({...}), key=[...])`` wraps a kernel
  *launcher* whose tunable knobs are keyword args (block shapes, super-block
  sizes, dimension semantics — the TPU analog of BLOCK_M/N/warps/stages).
* First call with a new key tuple benchmarks the config space (time-capped,
  ``search_max_t``), picks the fastest, and persists it to a JSON cache DB.
  Subsequent calls (any process) are pure lookups — zero overhead.
* Cache DB path layering mirrors the reference's storage scheme
  (dejavu_data/<dejavu-version>/<runtime>/<gpu>/<kernel>/cache.json —
  SURVEY.md §2.2 dejavu_data): here
  ``$VTB_DEJAVU_STORAGE/<tag>/jax_<ver>/<chip>/<kernel>/<space-hash>/cache.json``.
* Miss behavior when tuning is disabled (``VTB_DEJAVU_FORCE_FALLBACK=1``):
  ``informed_fallback`` picks the cached config of the *nearest* key
  (reference ``informed_fallback_next``, triton_unified_attention.py:82-91),
  else the static ``fallback_heuristic`` decision rule (reference
  ``fallback_heuristic_dt2``, :56-79).
* ``global_cache_lock`` freezes tuning during timed benchmark runs
  (reference benchmark.py:427-429).

Env contract (reference Dockerfile:256-264 family):
  VTB_DEJAVU_STORAGE, VTB_DEJAVU_FORCE_FALLBACK, VTB_DEJAVU_TAG,
  VTB_DEJAVU_DEBUG, VTB_PRINT_AUTOTUNING, VTB_USE_RANDOM_SEARCH
  (randomized search order, reference NGL_EXP_USE_RANDOM_SEARCH).
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import itertools
import json
import os
import random
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence


class CacheLock:
    """Freeze tuning while benchmarks time kernels (dejavu
    global_cache_lock analog)."""

    def __init__(self):
        self._locked = False
        self._mu = threading.Lock()

    def lock(self):
        with self._mu:
            self._locked = True

    def unlock(self):
        with self._mu:
            self._locked = False

    @property
    def is_locked(self) -> bool:
        return self._locked


global_cache_lock = CacheLock()


@dataclass(frozen=True)
class ConfigSpace:
    """Cartesian product of tunable knob values, with optional filters.

    ``conditions`` receive the candidate config dict and must all return
    True (the reference's kwarg_conditions, e.g. excluding known-bad
    configs — SURVEY.md §4 "known-bug guards").
    """

    space: dict[str, Sequence[Any]]
    conditions: tuple[Callable[[dict], bool], ...] = ()

    def configs(self) -> list[dict[str, Any]]:
        names = list(self.space)
        out = []
        for combo in itertools.product(*(self.space[n] for n in names)):
            cfg = dict(zip(names, combo))
            if all(c(cfg) for c in self.conditions):
                out.append(cfg)
        return out

    def space_hash(self) -> str:
        blob = json.dumps(
            {k: [repr(v) for v in vs] for k, vs in self.space.items()},
            sort_keys=True,
        )
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _chip_label() -> str:
    try:
        import jax

        d = jax.devices()[0]
        return f"{d.platform}_{getattr(d, 'device_kind', 'unknown')}".replace(
            " ", "_"
        )
    except Exception:
        return "unknown"


def _storage_root() -> str:
    return os.environ.get(
        "VTB_DEJAVU_STORAGE",
        os.path.join(os.path.expanduser("~"), ".cache", "vtb_dejavu"),
    )


def _debug(*a):
    if os.environ.get("VTB_DEJAVU_DEBUG"):
        print("[dejavu]", *a)


class BOChooser:
    """Model-based config selection: GP surrogate + expected improvement.

    The reference tunes with SMAC when ``use_bo=True``
    (triton_flash_attention.py:735-821, Dockerfile:135-150); this is the
    dependency-free analog.  Knob values are ordinal-encoded (index in
    the declared value list, normalized to [0,1]) — block sizes and DMA
    depths are monotone-ish in that encoding, which is all an RBF
    surrogate needs.  Picks: seeded random inits, then argmax-EI over
    the unevaluated candidates from a GP on log-times.  ``done`` turns
    True after ``patience`` consecutive non-improving picks, so a BO
    run usually stops well before exhausting a wide space."""

    def __init__(
        self,
        space: "ConfigSpace",
        configs: list[dict],
        seed: int,
        n_init: int = 3,
        patience: int = 5,
        length_scale: float = 0.35,
    ):
        import numpy as np

        self._np = np
        self.names = sorted(space.space)
        self.levels = {
            n: {repr(v): i for i, v in enumerate(space.space[n])}
            for n in self.names
        }
        self.configs = list(configs)
        self.X = np.array([self._encode(c) for c in self.configs])
        self.rng = random.Random(seed)
        order = list(range(len(self.configs)))
        self.rng.shuffle(order)
        self._init_queue = order[: min(n_init, len(order))]
        self.evaluated: dict[int, float] = {}  # idx -> log time
        self.failed: set[int] = set()
        self.patience = patience
        self._since_best = 0
        self._best = None
        self.ls = length_scale

    def _encode(self, cfg: dict):
        row = []
        for n in self.names:
            lv = self.levels[n]
            denom = max(len(lv) - 1, 1)
            row.append(lv.get(repr(cfg[n]), 0) / denom)
        return row

    @property
    def done(self) -> bool:
        remaining = (
            len(self.configs) - len(self.evaluated) - len(self.failed)
        )
        return remaining == 0 or self._since_best >= self.patience

    def next(self) -> int:
        """Index of the next config to evaluate."""
        np = self._np
        while self._init_queue:
            i = self._init_queue.pop(0)
            if i not in self.evaluated and i not in self.failed:
                return i
        cand = [
            i for i in range(len(self.configs))
            if i not in self.evaluated and i not in self.failed
        ]
        tried = sorted(self.evaluated)
        if len(tried) < 2:
            return self.rng.choice(cand)
        Xt = self.X[tried]
        y = np.array([self.evaluated[i] for i in tried])
        ymu, ysd = y.mean(), max(y.std(), 1e-9)
        yn = (y - ymu) / ysd
        d2 = ((Xt[:, None, :] - Xt[None, :, :]) ** 2).sum(-1)
        K = np.exp(-d2 / (2 * self.ls**2)) + 1e-4 * np.eye(len(tried))
        try:
            alpha = np.linalg.solve(K, yn)
            Kinv = np.linalg.inv(K)
        except np.linalg.LinAlgError:
            return self.rng.choice(cand)
        Xc = self.X[cand]
        d2c = ((Xc[:, None, :] - Xt[None, :, :]) ** 2).sum(-1)
        Ks = np.exp(-d2c / (2 * self.ls**2))
        mu = Ks @ alpha
        var = np.maximum(1.0 - np.einsum("ij,jk,ik->i", Ks, Kinv, Ks), 1e-12)
        s = np.sqrt(var)
        ybest = yn.min()
        z = (ybest - mu) / s
        # EI = s * (z * Phi(z) + phi(z)) without scipy
        phi = np.exp(-0.5 * z**2) / np.sqrt(2 * np.pi)
        Phi = 0.5 * (1 + _erf_vec(np, z / np.sqrt(2)))
        ei = s * (z * Phi + phi)
        return cand[int(np.argmax(ei))]

    def observe(self, idx: int, t: float | None) -> None:
        import math

        if t is None:  # invalid config (compile/VMEM failure)
            self.failed.add(idx)
            return
        self.evaluated[idx] = math.log(max(t, 1e-12))
        if self._best is None or t < self._best:
            self._best = t
            self._since_best = 0
        else:
            self._since_best += 1


def _erf_vec(np, x):
    """Vectorized erf (Abramowitz & Stegun 7.1.26, |err| < 1.5e-7)."""
    sign = np.sign(x)
    x = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * np.exp(-x * x))


class Autotuner:
    def __init__(
        self,
        fn: Callable,
        config_space: ConfigSpace,
        key: Sequence[str],
        *,
        name: str | None = None,
        search_max_t: float = 120.0,
        fallback_heuristic: Callable[[tuple], dict] | None = None,
        warmup: int = 2,
        rep: int = 10,
        use_random_search: bool | None = None,
        use_bo: bool | None = None,
        trace_pattern: str | None = None,
    ):
        self.fn = fn
        self.space = config_space
        self.key_names = list(key)
        self.name = name or fn.__name__
        self.search_max_t = search_max_t
        # randomized search order (reference NGL_EXP_USE_RANDOM_SEARCH,
        # triton_flash_attention.py:710-732): under a time cap, sampling
        # the space uniformly beats truncating it in declaration order.
        # Seeded by the key so reruns tune identically.
        if use_random_search is None:
            use_random_search = bool(
                os.environ.get("VTB_USE_RANDOM_SEARCH")
            )
        self.use_random_search = use_random_search
        # model-based search (reference use_bo=True + SMAC,
        # triton_flash_attention.py:735-821): GP-EI over the space.
        # None -> auto: on for spaces too big to sweep exhaustively.
        if use_bo is None and os.environ.get("VTB_USE_BO"):
            use_bo = os.environ["VTB_USE_BO"] != "0"
        self.use_bo = use_bo
        self.fallback_heuristic = fallback_heuristic
        self.warmup = warmup
        self.rep = rep
        # regex of device kernel names: when set (and a profiler trace is
        # available) configs are timed by MEASURED device kernel duration
        # from the xplane trace — wall-clock through a tunneled runtime
        # carries tens of ms of dispatch/fence latency per measurement,
        # drowning config differences of tens of us (the reference's
        # CUDA-graph timing fidelity concern, SURVEY.md §7 hard-part 5)
        self.trace_pattern = trace_pattern
        self._mem: dict[tuple, dict] = {}
        # configs rejected by the compiler (Mosaic/VMEM) per key — the
        # reference's kwarg_conditions/known-bug-guard role (SURVEY.md §4;
        # triton_flash_attention.py:744-751).  Persisted so a poisoned
        # point is never retried and fallbacks degrade past it.
        self._invalid: dict[tuple, set] = {}
        self._screen_done: set = set()  # keys whose fallback was screened
        self._db_loaded = False
        self._mu = threading.Lock()
        # hash the launcher's whole MODULE, not just the launcher: the
        # kernel body lives in sibling functions, and a body change with
        # an unchanged launcher silently reused stale tuned configs
        # (found round 3 — twice).  The reference keys on kernel code
        # hash for the same reason (SURVEY.md §2.2 dejavu_data scheme).
        try:
            mod = inspect.getmodule(fn)
            src = inspect.getsource(mod) if mod is not None else (
                inspect.getsource(fn)
            )
        except OSError:
            src = self.name
        self._code_hash = hashlib.sha256(src.encode()).hexdigest()[:16]
        functools.update_wrapper(self, fn)

    # ---------------- persistence ----------------

    def _db_subpath(self) -> str:
        tag = os.environ.get("VTB_DEJAVU_TAG", "default")
        import jax

        return os.path.join(
            tag,
            f"jax_{jax.__version__}",
            _chip_label(),
            f"{self.name}_{self._code_hash}",
            self.space.space_hash(),
            "cache.json",
        )

    def _db_path(self) -> str:
        return os.path.join(_storage_root(), self._db_subpath())

    def _shipped_db_path(self) -> str:
        """Tuning DBs committed with the package (the reference ships its
        dejavu_data in the wheel, setup.py:66-68; SURVEY.md §5.4)."""
        return os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "dejavu_data",
            self._db_subpath(),
        )

    def _load_db(self):
        if self._db_loaded:
            return
        self._db_loaded = True
        # shipped package data first, user storage second (user wins)
        for path in (self._shipped_db_path(), self._db_path()):
            if not os.path.exists(path):
                continue
            try:
                with open(path) as f:
                    db = json.load(f)
                for k, v in db.get("cache", {}).items():
                    self._mem[tuple(json.loads(k))] = v
                for k, cfgs in db.get("invalid", {}).items():
                    self._invalid.setdefault(
                        tuple(json.loads(k)), set()
                    ).update(cfgs)
                _debug(f"loaded {len(self._mem)} entries from {path}")
            except (OSError, json.JSONDecodeError) as e:
                _debug("db load failed:", e)

    def _save_db(self, timings: dict | None = None, bench_time: float = 0.0):
        path = self._db_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        prev = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    prev = json.load(f)
            except (OSError, json.JSONDecodeError):
                prev = {}
        db = {
            "signature": self.name,
            "code_hash": self._code_hash,
            "keys": self.key_names,
            "evaluated_configs": len(self.space.configs()),
            "total_bench_time_s": prev.get("total_bench_time_s", 0.0)
            + bench_time,
            "cache": {
                json.dumps(list(k)): v for k, v in self._mem.items()
            },
            "invalid": {
                json.dumps(list(k)): sorted(v)
                for k, v in self._invalid.items()
                if v
            },
            "timings": {**prev.get("timings", {}), **(timings or {})},
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(db, f, indent=1)
        os.replace(tmp, path)

    # ---------------- lookup / tune ----------------

    def _make_key(self, kwargs: dict) -> tuple:
        return tuple(kwargs[k] for k in self.key_names)

    def _nearest_key(self, key: tuple) -> tuple | None:
        """Informed fallback: cached key minimizing L1 distance over the
        numeric key elements (reference informed_fallback_next).

        Non-numeric elements (dtype strings) must match EXACTLY: configs
        are not transferable across dtypes — found round 3, where a
        batch-64 int8 lookup tie-broke onto a bfloat16-tuned config and
        ran the decode kernel 2.3x slower than the right one."""
        best, best_d = None, None
        for k in self._mem:
            if any(
                a != b
                for a, b in zip(k, key)
                if not (
                    isinstance(a, (int, float))
                    and isinstance(b, (int, float))
                )
            ):
                continue
            d = sum(
                abs(a - b)
                for a, b in zip(k, key)
                if isinstance(a, (int, float)) and isinstance(b, (int, float))
            )
            if best_d is None or d < best_d:
                best, best_d = k, d
        return best

    def _fallback_candidates(self, key: tuple):
        """Fallback configs in preference order (informed -> heuristic ->
        the full space) — consumed until one is not known-invalid."""
        if self._mem:
            near = self._nearest_key(key)
            if near is not None:
                _debug(f"informed fallback {key} -> {near}")
                yield dict(self._mem[near])
        if self.fallback_heuristic is not None:
            yield self.fallback_heuristic(key)
        configs = self.space.configs()
        mid = len(configs) // 2
        yield configs[mid]  # arbitrary-but-stable default
        for cfg in configs[:mid] + configs[mid + 1:]:
            yield cfg

    def _pick_fallback(
        self, key: tuple, args=(), kwargs=None, screen: bool = False
    ) -> dict:
        """First fallback candidate that is not a known-poisoned config.

        With ``screen`` (and concrete args on a compiled backend) each
        candidate is additionally AOT compile-checked before being
        accepted, so a Mosaic-rejected point degrades to the next-best
        config instead of crashing at serve time (VERDICT r2 #9; the
        reference's kwarg_conditions role)."""
        seen = set()
        last = None
        for cfg in self._fallback_candidates(key):
            cj = json.dumps(cfg, sort_keys=True)
            if cj in seen:
                continue
            seen.add(cj)
            last = cfg
            if cj in self._invalid.get(key, ()):
                print(
                    f"[dejavu {self.name}] skipping known-invalid config "
                    f"{cfg} for key={key}"
                )
                continue
            if screen and not self._compile_ok(cfg, args, kwargs or {}):
                self._mark_invalid(key, cj)
                print(
                    f"[dejavu {self.name}] config {cfg} fails to compile "
                    f"for key={key}; degrading to next-best"
                )
                continue
            return cfg
        return last if last is not None else {}

    def _mark_invalid(self, key: tuple, cfg_json: str) -> None:
        with self._mu:
            self._invalid.setdefault(key, set()).add(cfg_json)
            try:
                self._save_db()
            except OSError as e:
                _debug("invalid-config persist failed:", e)

    def _compile_ok(self, cfg: dict, args, kwargs) -> bool:
        """AOT-compile the launcher with this config on abstract avals —
        True when the backend accepts it (no execution, no data)."""
        import jax

        if jax.default_backend() == "cpu":
            return True  # interpret mode has no Mosaic constraints
        try:
            avals = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "shape") and hasattr(x, "dtype")
                else x,
                args,
            )
            jax.jit(
                functools.partial(self.fn, **kwargs, **cfg)
            ).lower(*avals).compile()
            return True
        except Exception as e:  # noqa: BLE001 — any compile failure
            _debug(f"compile screen failed for {cfg}:", type(e).__name__)
            return False

    def _bench_config(self, cfg: dict, args, kwargs) -> float:
        import jax
        import numpy as np

        def fence(r):
            # 1-element device-side slice fetch: synchronizes the
            # in-order dispatch stream without pulling full outputs over
            # a (possibly tunneled) runtime link
            leaf = jax.tree_util.tree_leaves(r)[0]
            if hasattr(leaf, "ravel"):
                np.asarray(jax.device_get(leaf.ravel()[:1]))

        r = None
        for _ in range(self.warmup):
            r = self.fn(*args, **kwargs, **cfg)
        if r is not None:
            fence(r)

        if self.trace_pattern and jax.default_backend() != "cpu":
            t = self._bench_config_traced(cfg, args, kwargs, fence)
            if t is not None:
                return t

        t0 = time.perf_counter()
        for _ in range(self.rep):
            r = self.fn(*args, **kwargs, **cfg)
        fence(r)
        return (time.perf_counter() - t0) / self.rep

    def _bench_config_traced(self, cfg, args, kwargs, fence):
        """Measured per-call device kernel time from an xplane trace
        (None when tracing/parsing is unavailable)."""
        import shutil
        import tempfile

        import jax

        d = tempfile.mkdtemp(prefix="vtb_dejavu_trace_")
        try:
            with jax.profiler.trace(d):
                r = None
                for _ in range(self.rep):
                    r = self.fn(*args, **kwargs, **cfg)
                fence(r)
            from vllm_triton_backend_tpu.utils.xplane import (
                matched_kernel_time,
            )

            kt = matched_kernel_time(d, self.trace_pattern)
            if kt is not None and kt.count:
                return kt.total_s / kt.count
        except Exception as e:
            _debug("traced bench failed:", type(e).__name__, e)
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return None

    def tune(self, *args, **kwargs) -> dict:
        """Benchmark the config space for this call's key; persist winner."""
        key = self._make_key(kwargs)
        t_start = time.perf_counter()
        timings = {}
        best_cfg, best_t = None, None
        configs = self.space.configs()
        seed = int(hashlib.sha256(repr(key).encode()).hexdigest()[:8], 16)
        use_bo = self.use_bo
        if use_bo is None:
            # auto: surrogate search once an exhaustive sweep is unlikely
            # to fit the time cap (>=32 points is past what kernels with
            # ~1s/eval cover comfortably); explicit random-search wins
            use_bo = len(configs) >= 32 and not self.use_random_search

        def bench_one(cfg) -> float | None:
            cj = json.dumps(cfg, sort_keys=True)
            if cj in self._invalid.get(key, ()):
                return None  # known-poisoned: never retried
            try:
                t = self._bench_config(cfg, args, kwargs)
            except Exception as e:  # invalid config (e.g. VMEM overflow)
                _debug(f"config {cfg} failed: {type(e).__name__}")
                self._invalid.setdefault(key, set()).add(cj)
                return None
            timings[json.dumps(cfg)] = t
            if os.environ.get("VTB_PRINT_AUTOTUNING"):
                print(f"[autotune {self.name}] {cfg} -> {t*1e3:.3f} ms")
            return t

        if use_bo and len(configs) > 3:
            chooser = BOChooser(self.space, configs, seed)
            while not chooser.done:
                if (
                    time.perf_counter() - t_start > self.search_max_t
                    and best_cfg
                ):
                    _debug("search time cap hit")
                    break
                i = chooser.next()
                t = bench_one(configs[i])
                chooser.observe(i, t)
                if t is not None and (best_t is None or t < best_t):
                    best_cfg, best_t = configs[i], t
        else:
            if self.use_random_search:
                random.Random(seed).shuffle(configs)
            for cfg in configs:
                if (
                    time.perf_counter() - t_start > self.search_max_t
                    and best_cfg
                ):
                    _debug("search time cap hit")
                    break
                t = bench_one(cfg)
                if t is not None and (best_t is None or t < best_t):
                    best_cfg, best_t = cfg, t
        if best_cfg is None:
            raise RuntimeError(f"no valid config for {self.name} key={key}")
        with self._mu:
            self._mem[key] = best_cfg
            self._save_db(timings, time.perf_counter() - t_start)
        if os.environ.get("VTB_PRINT_AUTOTUNING"):
            print(
                f"[autotune {self.name}] key={key} winner={best_cfg} "
                f"({best_t*1e3:.3f} ms)"
            )
        return best_cfg

    def lookup(self, **kwargs) -> dict:
        """Resolve the config for this call without running the kernel."""
        self._load_db()
        key = self._make_key(kwargs)
        cfg = self._mem.get(key)
        if cfg is not None:
            return dict(cfg)
        return self._pick_fallback(key)

    @staticmethod
    def _is_tracing(args, kwargs) -> bool:
        import jax

        return any(
            isinstance(leaf, jax.core.Tracer)
            for leaf in jax.tree_util.tree_leaves((args, kwargs))
        )

    def __call__(self, *args, **kwargs):
        self._load_db()
        key = self._make_key(kwargs)
        cfg = self._mem.get(key)
        if cfg is None:
            # Benchmarking needs concrete arrays: under a jit trace (the
            # engine's forward) resolve via fallback only — tuning happens
            # out-of-band (bench harness / tune script), mirroring the
            # reference's shipped pre-tuned DBs (SURVEY.md §5.4).
            # Interpret mode (CPU test runs): timings are interpreter
            # noise, and the per-config compile storm both slows the
            # suite and piles up CPU-JIT memory maps toward the
            # vm.max_map_count SIGSEGV (see tests/conftest.py) — use the
            # fallback heuristic unless a tuning test opts in via
            # VTB_TUNE_ON_CPU=1.
            from vllm_triton_backend_tpu.ops.pallas.common import (
                use_interpret,
            )

            tuning_allowed = (
                not global_cache_lock.is_locked
                and os.environ.get("VTB_DEJAVU_FORCE_FALLBACK", "0") != "1"
                and not self._is_tracing(args, kwargs)
                and (
                    not use_interpret()
                    or os.environ.get("VTB_TUNE_ON_CPU", "0") == "1"
                )
            )
            if tuning_allowed:
                cfg = self.tune(*args, **kwargs)
            else:
                # compile-screen the fallback once per (key, cfg): a
                # poisoned point degrades here instead of crashing the
                # enclosing step compile (VERDICT r2 #9)
                cfg = self._pick_fallback(
                    key, args, kwargs,
                    screen=(key not in self._screen_done),
                )
                self._screen_done.add(key)
        return self.fn(*args, **kwargs, **cfg)


def autotune(
    config_space: ConfigSpace,
    key: Sequence[str],
    **opts,
):
    """Decorator: ``@autotune(config_space=..., key=[...])`` over a launcher
    whose tunable knobs are trailing keyword args."""

    def deco(fn):
        return Autotuner(fn, config_space, key, **opts)

    return deco
