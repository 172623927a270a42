"""REAL multi-process jax.distributed test (SURVEY.md §4; VERDICT r1 next
#4): spawns 2 OS processes, each with 4 virtual CPU devices, joins them
into one 8-device process group, and runs the controller-broadcast
generation loop across the global (dp=2, tp=4) mesh. Asserts every process
generates identical tokens AND that they match the single-process engine's
output for the same prompt/weights."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")

PROMPT = [5, 17, 100, 42, 7]
MAX_NEW = 6


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Greedy tokens from the plain single-process path, same seed-0
    weights the workers construct."""
    import jax
    import jax.numpy as jnp

    from tpuserve.models import llama
    from tpuserve.models.llama import KVCache, LlamaParams

    p = LlamaParams(vocab_size=128, dim=32, n_layers=2, n_heads=8, n_kv_heads=4,
                    head_dim=8, ffn_dim=64)
    params = llama.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32)
    cache = KVCache.create(p, 4, 64, quantized=False, dtype=jnp.float32)
    tokens = np.zeros((1, 16), np.int32)
    tokens[0, : len(PROMPT)] = PROMPT
    logits, cache = llama.prefill(params, p, jnp.asarray(tokens), cache,
                                  jnp.int32(0), jnp.int32(len(PROMPT)))
    out = [int(np.argmax(np.asarray(logits)[0]))]
    pos = len(PROMPT)
    for _ in range(MAX_NEW - 1):
        t = np.zeros((4,), np.int32)
        pp = np.full((4,), -1, np.int32)
        t[0] = out[-1]
        pp[0] = pos
        lg, cache = llama.decode_step(params, p, jnp.asarray(t), cache, jnp.asarray(pp))
        out.append(int(np.argmax(np.asarray(lg)[0])))
        pos += 1
    return out


@pytest.mark.slow
def test_two_process_generation_identical(tmp_path):
    port = _free_port()
    nproc = 2
    procs = []
    outs = []
    for pid in range(nproc):
        out = str(tmp_path / f"out_{pid}.json")
        outs.append(out)
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(nproc), "--process-id", str(pid),
             "--out", out, "--tp", "4", "--dp", "2",
             "--max-new", str(MAX_NEW)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for pr in procs:
        try:
            stdout, _ = pr.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail("multihost worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for pr, log in zip(procs, logs):
        assert pr.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = []
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))
    # the process group really spanned processes
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["global_devices"] == 8 for r in results)
    assert all(r["local_devices"] == 4 for r in results)
    # every process saw identical tokens (controller broadcast + same jit)
    assert results[0]["tokens"] == results[1]["tokens"]
    assert len(results[0]["tokens"]) == MAX_NEW
    # and they match the single-process reference
    assert results[0]["tokens"] == _single_process_reference()
