"""Multi-host (2-process) mesh test over loopback.

VERDICT r1 item 6 / SURVEY.md §5.8: single-process 8-device meshes are
necessary but not sufficient for the multi-host story.  Here TWO
processes x 4 virtual CPU devices each form one GLOBAL (data=4, model=2)
mesh via ``jax.distributed.initialize`` over loopback, run the
TP+DP-sharded engine forward, and cross-check determinism across hosts
— the ``model`` axis stays within each process's devices (the
ICI-not-DCN mesh discipline of parallel/multihost.py).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys

rank, port = int(sys.argv[1]), int(sys.argv[2])
sys.path.insert(0, sys.argv[3])

from vllm_triton_backend_tpu.parallel.multihost import (
    init_distributed,
    make_multihost_mesh,
)

init_distributed(f"localhost:{port}", 2, rank)

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from vllm_triton_backend_tpu.config import ModelConfig
from vllm_triton_backend_tpu.models.llama import (
    ForwardExtras, init_params, make_kv_caches,
)
from vllm_triton_backend_tpu.parallel import (
    make_sharded_forward, shard_caches, shard_params,
)

mesh = make_multihost_mesh(model=2)
assert mesh.shape == {"data": 4, "model": 2}
# model-axis pairs must be host-local (TP over ICI, DP over DCN)
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1

cfg = ModelConfig.tiny(dtype="float32", num_heads=4, num_kv_heads=2)
params = shard_params(init_params(cfg, jax.random.key(0)), mesh)
dp, block_size, nb_local = 4, 16, 4
kv = shard_caches(
    make_kv_caches(cfg, dp * nb_local, block_size, data_shards=dp), mesh
)

T, S, B = 8, 1, 4
rng = np.random.default_rng(0)
tok = rng.integers(0, cfg.vocab_size, size=(dp, T)).astype(np.int32)
pos = np.tile(np.arange(T, dtype=np.int32), (dp, 1))
qsl = np.tile(np.asarray([0, T], np.int32), (dp, 1))
sl = np.full((dp, S), T, np.int32)
tbl = np.tile(np.arange(B, dtype=np.int32).reshape(1, 1, B), (dp, 1, 1))
slots = np.tile(np.arange(T, dtype=np.int32), (dp, 1))

def put(x, spec):
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), x[rank * 2:(rank + 1) * 2]
    )

batch_spec = P("data")
args = [put(x, batch_spec) for x in (tok, pos)]
kv_args = [kv]
rest = [put(x, batch_spec) for x in (qsl, sl, tbl, slots)]

step = make_sharded_forward(
    cfg, mesh, ForwardExtras(max_query_len=8, max_seq_len=64)
)
logits, kv = step(params, args[0], args[1], kv, *rest)
jax.block_until_ready(logits)

# determinism across hosts: checksum of this host's addressable shards,
# gathered and compared
local = np.concatenate([
    np.asarray(s.data).ravel() for s in logits.addressable_shards
])
assert np.all(np.isfinite(local))
# each host sums its own data shards; the allgathered TOTAL must agree
from jax.experimental import multihost_utils
sums = np.asarray(
    multihost_utils.process_allgather(jnp.float32(local.sum()))
)
total = float(np.sort(sums).sum())
print(f"MULTIHOST_OK rank={rank} checksum={total:.4f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.update(
        PYTHONPATH="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_TRACEBACK_FILTERING="off",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), str(port), REPO],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-4000:]
    # both hosts computed the same replicated result
    sums = [
        line.split("checksum=")[1]
        for out in outs
        for line in out.splitlines()
        if "MULTIHOST_OK" in line
    ]
    assert len(sums) == 2 and sums[0] == sums[1]


ENGINE_WORKER = r"""
import json
import sys

rank, port = int(sys.argv[1]), int(sys.argv[2])
sys.path.insert(0, sys.argv[3])

from vllm_triton_backend_tpu.parallel.multihost import init_distributed

init_distributed(f"localhost:{port}", 2, rank)

import jax

assert jax.process_count() == 2 and jax.device_count() == 8

from vllm_triton_backend_tpu.config import (
    CacheConfig, EngineConfig, ModelConfig, ParallelConfig,
    SchedulerConfig,
)
from vllm_triton_backend_tpu.models.llama import init_params
from vllm_triton_backend_tpu.runtime.engine import LLMEngine
from vllm_triton_backend_tpu.runtime.sampler import SamplingParams

cfg = EngineConfig(
    model=ModelConfig.tiny(
        dtype="float32", num_heads=4, num_kv_heads=2
    ),
    cache=CacheConfig(block_size=16, num_blocks=64),
    scheduler=SchedulerConfig(
        max_num_seqs=2, max_num_batched_tokens=32, max_model_len=64,
        token_buckets=(8, 16, 32),
    ),
    parallel=ParallelConfig(tensor_parallel=2, data_parallel=4),
)
params = init_params(cfg.model, jax.random.key(0))
engine = LLMEngine(cfg, params=params, multistep=4)
assert engine.multihost

# SPMD contract: every process adds the SAME requests in the SAME order
import numpy as np
rng = np.random.default_rng(3)
for i, n in enumerate((9, 17, 5, 12, 7, 21)):
    engine.add_request(
        rng.integers(0, cfg.model.vocab_size, size=n).tolist(),
        SamplingParams(max_tokens=12),
        req_id=f"r{i}",
    )
out = {}
steps = 0
while engine.has_unfinished():
    for o in engine.step():
        out[o.req_id] = o.output_token_ids
    steps += 1
    assert steps < 300
print("ENGINE_MULTIHOST " + json.dumps(out), flush=True)
"""


def test_two_process_engine_serving(tmp_path):
    """VERDICT r4 #2: the ENGINE LOOP (add_request -> step -> sampled
    commit) serves requests across two processes on a (data=4, model=2)
    mesh, token-exact vs the single-process engine."""
    import json

    worker = tmp_path / "engine_worker.py"
    worker.write_text(ENGINE_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.update(
        PYTHONPATH="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_TRACEBACK_FILTERING="off",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), str(port), REPO],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("engine multihost worker timed out")
        outs.append(out)
    results = []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-6000:]}"
        line = [
            ln for ln in out.splitlines() if "ENGINE_MULTIHOST" in ln
        ]
        assert line, out[-4000:]
        results.append(json.loads(line[0].split("ENGINE_MULTIHOST ")[1]))
    # both hosts advanced the same SPMD engine state
    assert results[0] == results[1]

    # token-exact vs the single-process dp=4 x tp=2 engine (same global
    # mesh computation in one process over the 8 virtual devices)
    import numpy as np

    from vllm_triton_backend_tpu.config import (
        CacheConfig, EngineConfig, ModelConfig, ParallelConfig,
        SchedulerConfig,
    )
    from vllm_triton_backend_tpu.models.llama import init_params
    from vllm_triton_backend_tpu.runtime.engine import LLMEngine
    from vllm_triton_backend_tpu.runtime.sampler import SamplingParams
    import jax

    cfg = EngineConfig(
        model=ModelConfig.tiny(
            dtype="float32", num_heads=4, num_kv_heads=2
        ),
        cache=CacheConfig(block_size=16, num_blocks=64),
        scheduler=SchedulerConfig(
            max_num_seqs=2, max_num_batched_tokens=32, max_model_len=64,
            token_buckets=(8, 16, 32),
        ),
        parallel=ParallelConfig(tensor_parallel=2, data_parallel=4),
    )
    params = init_params(cfg.model, jax.random.key(0))
    engine = LLMEngine(cfg, params=params, multistep=4)
    rng = np.random.default_rng(3)
    for i, n in enumerate((9, 17, 5, 12, 7, 21)):
        engine.add_request(
            rng.integers(0, cfg.model.vocab_size, size=n).tolist(),
            SamplingParams(max_tokens=12),
            req_id=f"r{i}",
        )
    ref = {}
    steps = 0
    while engine.has_unfinished():
        for o in engine.step():
            ref[o.req_id] = o.output_token_ids
        steps += 1
        assert steps < 300
    assert results[0] == ref, (
        f"multihost engine diverged from single-process:\n"
        f"mh={results[0]}\nsp={ref}"
    )
