"""gRPC frontend tests: full service surface against an in-process server
on the CPU platform (the reference promised gRPC and never shipped it;
this proves ours end-to-end including streaming generation)."""

import json

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")

from tpuserve.engine.manager import InferenceManager
from tpuserve.fixtures import create_test_model, make_test_model_weights, reference_mlp_forward
from tpuserve.server import tpuserve_pb2 as pb
from tpuserve.server.grpc import GrpcClient, create_grpc_server


@pytest.fixture()
def served(tmp_path):
    create_test_model(str(tmp_path))
    # tiny LLM entry for generate tests
    vdir = tmp_path / "tiny_llm" / "1"
    vdir.mkdir(parents=True)
    (vdir / "config.json").write_text(json.dumps({
        "name": "tiny_llm", "platform": "llm", "architecture": "llama",
        "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 1, "n_heads": 2,
                          "n_kv_heads": 2, "head_dim": 16, "ffn_dim": 64, "init": "random"},
        "generation": {"max_seq_len": 64, "max_slots": 2, "eos_token_id": 2,
                        "max_new_tokens": 6},
    }))
    manager = InferenceManager(str(tmp_path))
    server = create_grpc_server(manager, port=0)  # port 0: pick free port
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()
    client = GrpcClient(f"127.0.0.1:{port}")
    yield client
    client.close()
    server.stop(grace=None)
    manager.shutdown()


def test_health(served):
    resp = served.health(pb.HealthRequest())
    assert resp.status == "healthy" and resp.time > 0


def test_list_and_status(served):
    resp = served.list_models(pb.ListModelsRequest())
    names = {m.name for m in resp.models}
    assert names == {"test_model", "tiny_llm"}
    st = served.model_status(pb.ModelRequest(name="test_model"))
    assert st.version == "1" and not st.is_loaded
    cfg = json.loads(st.config_json)
    assert cfg["architecture"] == "mlp"


def test_lifecycle_and_infer(served):
    resp = served.load_model(pb.ModelRequest(name="test_model"))
    assert resp.message == "Model loaded successfully"
    resp = served.load_model(pb.ModelRequest(name="test_model"))
    assert resp.message == "Model already loaded"

    req = pb.InferRequest(
        name="test_model",
        inputs=[pb.Tensor(name="input", data_type="FP32", shape=[1, 3],
                           float_data=[1.0, 1.0, 1.0])],
    )
    resp = served.infer(req)
    out = resp.outputs[0].tensor
    expected = reference_mlp_forward(make_test_model_weights(), np.ones((1, 3), np.float32))
    np.testing.assert_allclose(np.array(out.float_data), expected.reshape(-1), rtol=1e-5)

    resp = served.unload_model(pb.ModelRequest(name="test_model"))
    assert resp.message == "Model unloaded successfully"
    resp = served.unload_model(pb.ModelRequest(name="test_model"))
    assert resp.message == "Model not loaded"


def test_infer_errors(served):
    with pytest.raises(grpc.RpcError) as e:
        served.infer(pb.InferRequest(name="ghost"))
    assert e.value.code() == grpc.StatusCode.NOT_FOUND
    with pytest.raises(grpc.RpcError) as e:
        served.infer(pb.InferRequest(name="test_model"))  # not loaded
    assert e.value.code() == grpc.StatusCode.INVALID_ARGUMENT


def test_generate_and_stream(served):
    served.load_model(pb.ModelRequest(name="tiny_llm"))
    req = pb.GenerateRequest(name="tiny_llm", input_ids=[5, 17, 100], max_new_tokens=5)
    resp = served.generate(req)
    assert list(resp.output_ids)[:3] == [5, 17, 100]
    assert 1 <= resp.num_generated <= 5
    assert resp.finish_reason in ("eos", "max_new_tokens")

    # streaming yields the same tokens one by one (greedy determinism)
    chunks = list(served.generate_stream(req))
    assert chunks[-1].done
    streamed = [c.token for c in chunks if not c.done]
    assert streamed == list(resp.generated_ids)

    # round-2 params: logprobs + stop ids flow through the proto
    req2 = pb.GenerateRequest(name="tiny_llm", input_ids=[5, 17, 100],
                              max_new_tokens=5, logprobs=True)
    resp2 = served.generate(req2)
    assert len(resp2.logprobs) == resp2.num_generated
    assert all(lp <= 0.0 for lp in resp2.logprobs)
    first = resp.generated_ids[0]
    req3 = pb.GenerateRequest(name="tiny_llm", input_ids=[5, 17, 100],
                              max_new_tokens=5, stop_token_ids=[first])
    resp3 = served.generate(req3)
    assert resp3.finish_reason == "stop" and resp3.num_generated == 1


def test_metrics(served):
    resp = served.metrics(pb.MetricsRequest())
    payload = json.loads(resp.json)
    assert payload["device_count"] == 8
    assert "memory" in payload
