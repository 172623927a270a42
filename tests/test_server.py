"""REST API tests (≙ reference client/test_client.py semantics, run in-process
against the aiohttp app — every endpoint, lifecycle idempotency, error paths,
and the reference's status-code quirks)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from tpuserve.fixtures import create_test_model
from tpuserve.server.http import create_app


@pytest.fixture()
def repo_dir(tmp_path):
    create_test_model(str(tmp_path))
    return str(tmp_path)


@pytest.fixture()
def api(repo_dir):
    """Callable running an async test body against a live in-process app."""

    def run(test_body):
        async def go():
            app = create_app(repo_dir)
            client = TestClient(TestServer(app))
            await client.start_server()
            try:
                await test_body(client)
            finally:
                await client.close()

        asyncio.run(go())

    return run


def test_health(api):
    async def body(c):
        r = await c.get("/health")
        assert r.status == 200
        data = await r.json()
        assert data["status"] == "healthy"
        assert isinstance(data["time"], int)

    api(body)


def test_device_endpoints(api):
    async def body(c):
        for path in ("/tpu", "/cuda"):
            r = await c.get(path)
            assert r.status == 200
            data = await r.json()
            assert data["device_count"] == 8
        r = await c.get("/devices")
        data = await r.json()
        assert len(data["devices"]) == 8
        assert data["devices"][0].startswith("Device 0:")
        for path in ("/tpu/memory", "/gpu/memory"):
            r = await c.get(path)
            data = await r.json()
            assert len(data["memory_info"]) == 8
            assert {"device_id", "total_mb", "free_mb", "used_mb", "used_percent"} <= set(
                data["memory_info"][0]
            )

    api(body)


def test_list_models(api):
    async def body(c):
        r = await c.get("/models")
        assert r.status == 200
        data = await r.json()
        assert data["model_count"] == 1
        assert data["models"][0]["name"] == "test_model"
        assert data["models"][0]["is_loaded"] is False
        assert data["models"][0]["state"] == "UNLOADED"

    api(body)


def test_lifecycle_and_infer(api):
    async def body(c):
        # load -> 202 (reference quirk §2c.3)
        r = await c.post("/models/test_model/load")
        assert r.status == 202
        assert (await r.json())["message"] == "Model loaded successfully"

        # double load -> 200 already loaded (quirk §2c.2)
        r = await c.post("/models/test_model/load")
        assert r.status == 200
        assert "already loaded" in (await r.json())["message"].lower()

        # status
        r = await c.get("/models/test_model")
        data = await r.json()
        assert data["is_loaded"] is True
        assert data["available_versions"] == ["1"]
        assert data["config"]["inputs"][0]["name"] == "input"

        # infer with flat input (reference format)
        r = await c.post(
            "/models/test_model/infer", json={"inputs": {"input": [1.0, 1.0, 1.0]}}
        )
        assert r.status == 200
        data = await r.json()
        assert data["model_name"] == "test_model"
        out = data["outputs"][0]
        assert out["name"] == "output"
        assert out["shape"] == [1, 2]
        assert len(out["data"]) == 2
        # reference fixture ground truth (seed 42, ones input)
        from tpuserve.fixtures import make_test_model_weights, reference_mlp_forward

        expected = reference_mlp_forward(make_test_model_weights(), np.ones((1, 3), np.float32))
        np.testing.assert_allclose(np.array(out["data"]), expected.reshape(-1), rtol=1e-5)

        # nested input form also accepted
        r = await c.post(
            "/models/test_model/infer", json={"inputs": {"input": [[1.0, 1.0, 1.0]]}}
        )
        assert r.status == 200

        # stats endpoint (reference plumbed but never exposed)
        r = await c.get("/models/test_model/stats")
        assert r.status == 200
        stats = (await r.json())["stats"]
        assert stats["inference_count"] == 2
        assert stats["p50_inference_ns"] > 0

        # metrics
        r = await c.get("/metrics")
        data = await r.json()
        assert "test_model:1" in data["models"]

        # unload -> 201 (quirk §2c.3)
        r = await c.post("/models/test_model/unload")
        assert r.status == 201
        # double unload -> 200 "not loaded"
        r = await c.post("/models/test_model/unload")
        assert r.status == 200
        assert "not loaded" in (await r.json())["message"].lower()

    api(body)


def test_error_paths(api):
    async def body(c):
        r = await c.post("/models/ghost/load")
        assert r.status == 404
        r = await c.get("/models/ghost")
        assert r.status == 404
        r = await c.post("/models/test_model/infer", json={"inputs": {"input": [1.0]}})
        assert r.status == 400  # not loaded
        await c.post("/models/test_model/load")
        r = await c.post("/models/test_model/infer", json={"inputs": {"input": [1.0]}})
        assert r.status == 400  # element count mismatch
        body_text = await r.json()
        assert "error" in body_text
        r = await c.post("/models/test_model/infer", data=b"not json")
        assert r.status == 400
        r = await c.post("/models/test_model/infer", json={})
        assert r.status == 400
        r = await c.get("/models/test_model/stats?version=99")
        assert r.status == 400

    api(body)


def test_version_query_param(api, repo_dir):
    async def body(c):
        create_test_model(repo_dir, version="2")
        r = await c.post("/models/test_model/load?version=1")
        assert r.status == 202
        r = await c.get("/models/test_model?version=1")
        data = await r.json()
        assert data["version"] == "1" and data["is_loaded"] is True
        # unversioned status resolves latest (2), which is not loaded
        r = await c.get("/models/test_model")
        data = await r.json()
        assert data["version"] == "2" and data["is_loaded"] is False

    api(body)


def test_classification_labels(api, repo_dir, tmp_path):
    async def body(c):
        # build a tiny classifier with labels
        import os

        from safetensors.numpy import save_file

        vdir = os.path.join(repo_dir, "clf", "1")
        os.makedirs(vdir)
        rng = np.random.default_rng(0)
        save_file(
            {
                "dense1/kernel": rng.normal(size=(4, 6)).astype(np.float32),
                "dense1/bias": np.zeros(6, np.float32),
            },
            os.path.join(vdir, "model.safetensors"),
        )
        cfg = {
            "name": "clf",
            "platform": "jax",
            "architecture": "mlp",
            "inputs": [{"name": "input", "shape": [1, 4], "data_type": "FLOAT32"}],
            "outputs": [
                {"name": "output", "shape": [1, 6], "data_type": "FLOAT32", "label_filename": "labels.txt"}
            ],
            "model_params": {"features": [6]},
        }
        with open(os.path.join(vdir, "config.json"), "w") as f:
            json.dump(cfg, f)
        with open(os.path.join(vdir, "labels.txt"), "w") as f:
            f.write("\n".join(f"class_{i}" for i in range(6)))

        await c.post("/models/clf/load")
        r = await c.post("/models/clf/infer", json={"inputs": {"input": [1, 2, 3, 4]}})
        assert r.status == 200
        out = (await r.json())["outputs"][0]
        assert len(out["classifications"]) == 5  # top-5 (≙ findTopClasses)
        assert out["classifications"][0]["probability"] >= out["classifications"][1]["probability"]
        assert out["classifications"][0]["label"].startswith("class_")

    api(body)


def test_streaming_generate(api, repo_dir):
    """REST streaming generation: newline-delimited JSON token chunks."""
    async def body(c):
        import json as _json
        import os

        vdir = os.path.join(repo_dir, "tiny_llm", "1")
        os.makedirs(vdir)
        with open(os.path.join(vdir, "config.json"), "w") as f:
            _json.dump({
                "name": "tiny_llm", "platform": "llm", "architecture": "llama",
                "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 1,
                                  "n_heads": 2, "n_kv_heads": 2, "head_dim": 16,
                                  "ffn_dim": 64, "init": "random"},
                "generation": {"max_seq_len": 64, "max_slots": 2,
                                "eos_token_id": 2, "max_new_tokens": 5},
            }, f)
        r = await c.post("/models/tiny_llm/load")
        assert r.status == 202

        # non-streaming reference
        r = await c.post("/models/tiny_llm/generate",
                          json={"input_ids": [5, 9], "max_new_tokens": 4})
        assert r.status == 200
        ref = (await r.json())["generated_ids"]

        # streaming: same tokens, chunk per token, final done record
        r = await c.post("/models/tiny_llm/generate",
                          json={"input_ids": [5, 9], "max_new_tokens": 4, "stream": True})
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("application/x-ndjson")
        lines = [l for l in (await r.text()).splitlines() if l]
        chunks = [_json.loads(l) for l in lines]
        assert chunks[-1]["done"] is True
        streamed = [ch["token"] for ch in chunks if "token" in ch]
        assert streamed == ref

    api(body)


def test_orbax_checkpoint_loading(api, repo_dir):
    """A model shipped as an orbax checkpoint/ dir loads and serves."""
    async def body(c):
        import json as _json
        import os

        import jax
        import orbax.checkpoint as ocp

        from tpuserve.fixtures import make_test_model_weights

        vdir = os.path.join(repo_dir, "orbax_model", "1")
        os.makedirs(vdir)
        weights = {k: v for k, v in make_test_model_weights().items()}
        with ocp.PyTreeCheckpointer() as checkpointer:
            checkpointer.save(os.path.join(vdir, "checkpoint"), weights)
        with open(os.path.join(vdir, "config.json"), "w") as f:
            _json.dump({
                "name": "orbax_model", "platform": "jax", "architecture": "mlp",
                "inputs": [{"name": "input", "shape": [1, 3], "data_type": "FLOAT32"}],
                "outputs": [{"name": "output", "shape": [1, 2], "data_type": "FLOAT32"}],
                "model_params": {"features": [5, 2]},
            }, f)
        r = await c.post("/models/orbax_model/load")
        assert r.status == 202, await r.text()
        r = await c.post("/models/orbax_model/infer",
                          json={"inputs": {"input": [1.0, 1.0, 1.0]}})
        assert r.status == 200
        import numpy as np

        from tpuserve.fixtures import reference_mlp_forward

        out = (await r.json())["outputs"][0]["data"]
        expected = reference_mlp_forward(make_test_model_weights(), np.ones((1, 3), np.float32))
        np.testing.assert_allclose(np.array(out), expected.reshape(-1), rtol=1e-5)

    api(body)


def test_metrics_includes_serving_stats(api, repo_dir):
    """LLM models expose scheduler telemetry (slots, queue, pages) in /metrics."""
    async def body(c):
        import json as _json
        import os

        vdir = os.path.join(repo_dir, "m_llm", "1")
        os.makedirs(vdir)
        with open(os.path.join(vdir, "config.json"), "w") as f:
            _json.dump({
                "name": "m_llm", "platform": "llm", "architecture": "llama",
                "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 1,
                                  "n_heads": 2, "n_kv_heads": 2, "head_dim": 16,
                                  "ffn_dim": 64, "init": "random"},
                "generation": {"max_seq_len": 64, "max_slots": 2, "paged": True,
                                "page_size": 16, "eos_token_id": 2,
                                "max_new_tokens": 4},
            }, f)
        await c.post("/models/m_llm/load")
        await c.post("/models/m_llm/generate", json={"input_ids": [5, 9]})
        r = await c.get("/metrics")
        serving = (await r.json())["models"]["m_llm:1"]["serving"]
        assert serving["max_slots"] == 2
        assert serving["tokens_generated"] >= 1
        assert serving["paged"] is True
        assert serving["kv_free_pages"] >= 0

    api(body)


def test_list_form_inputs(api):
    """Explicit list input form: [{"name","shape","data_type","data"}]."""
    async def body(c):
        await c.post("/models/test_model/load")
        r = await c.post("/models/test_model/infer", json={
            "inputs": [{"name": "input", "shape": [1, 3], "data_type": "FP32",
                         "data": [1.0, 1.0, 1.0]}]
        })
        assert r.status == 200
        out = (await r.json())["outputs"][0]
        from tpuserve.fixtures import make_test_model_weights, reference_mlp_forward

        expected = reference_mlp_forward(make_test_model_weights(), np.ones((1, 3), np.float32))
        np.testing.assert_allclose(np.array(out["data"]), expected.reshape(-1), rtol=1e-5)
        # malformed list entries rejected
        r = await c.post("/models/test_model/infer", json={"inputs": [{"name": "input"}]})
        assert r.status == 400

    api(body)


def test_text_generation_with_tokenizer(api, repo_dir):
    """/generate accepts 'text' when the model ships tokenizer.json."""
    async def body(c):
        import json as _json
        import os

        from tokenizers import Tokenizer, models
        from tokenizers.pre_tokenizers import Whitespace

        vdir = os.path.join(repo_dir, "txt_llm", "1")
        os.makedirs(vdir)
        vocab = {"<unk>": 0, "hello": 1, "world": 2}
        vocab.update({f"tok{i}": i for i in range(3, 120)})
        tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = Whitespace()
        tok.save(os.path.join(vdir, "tokenizer.json"))
        with open(os.path.join(vdir, "config.json"), "w") as f:
            _json.dump({
                "name": "txt_llm", "platform": "llm", "architecture": "llama",
                "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 1,
                                  "n_heads": 2, "n_kv_heads": 2, "head_dim": 16,
                                  "ffn_dim": 64, "init": "random"},
                "generation": {"max_seq_len": 64, "max_slots": 2,
                                "eos_token_id": 0, "max_new_tokens": 5},
            }, f)
        await c.post("/models/txt_llm/load")
        r = await c.post("/models/txt_llm/generate",
                          json={"text": "hello world", "max_new_tokens": 4})
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["output_ids"][:2] == [1, 2]  # "hello world" tokenized
        assert "text" in data and isinstance(data["text"], str)
        # ids-equivalence: same prompt as ids gives the same continuation
        r2 = await c.post("/models/txt_llm/generate",
                           json={"input_ids": [1, 2], "max_new_tokens": 4})
        assert (await r2.json())["generated_ids"] == data["generated_ids"]
        # text without tokenizer -> clear 400
        await c.post("/models/test_model/load")
        r = await c.post("/models/txt_llm/unload")

    api(body)


def test_text_generation_without_tokenizer_rejected(api, repo_dir):
    async def body(c):
        import json as _json
        import os

        vdir = os.path.join(repo_dir, "plain_llm", "1")
        os.makedirs(vdir)
        with open(os.path.join(vdir, "config.json"), "w") as f:
            _json.dump({
                "name": "plain_llm", "platform": "llm", "architecture": "llama",
                "model_params": {"vocab_size": 64, "dim": 32, "n_layers": 1,
                                  "n_heads": 2, "n_kv_heads": 2, "head_dim": 16,
                                  "ffn_dim": 64, "init": "random"},
                "generation": {"max_seq_len": 32, "max_slots": 2},
            }, f)
        await c.post("/models/plain_llm/load")
        r = await c.post("/models/plain_llm/generate", json={"text": "hi"})
        assert r.status == 400
        assert "tokenizer" in (await r.json())["error"]

    api(body)


def test_profile_capture(api, tmp_path):
    """POST /profile/start + /profile/stop capture a real jax.profiler trace
    (SURVEY §5 tracing row: the reference had no trace capture at all)."""
    async def body(c):
        r = await c.get("/profile")
        assert r.status == 200 and (await r.json())["active"] is False

        trace_dir = str(tmp_path / "trace")
        r = await c.post("/profile/start", json={"dir": trace_dir})
        assert r.status == 200
        data = await r.json()
        assert data["status"] == "started" and data["trace_dir"] == trace_dir

        # second start while active -> 409
        r = await c.post("/profile/start", json={})
        assert r.status == 409

        r = await c.get("/profile")
        assert (await r.json())["active"] is True

        # do some device work so the trace has content
        import jax.numpy as jnp
        x = jnp.ones((128, 128))
        (x @ x).block_until_ready()

        r = await c.post("/profile/stop")
        assert r.status == 200
        data = await r.json()
        assert data["status"] == "stopped"
        assert data["total_bytes"] > 0 and len(data["files"]) > 0

        # stop when inactive -> 400
        r = await c.post("/profile/stop")
        assert r.status == 400

    api(body)
