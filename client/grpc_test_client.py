#!/usr/bin/env python3
"""End-to-end gRPC API test client (counterpart of test_client.py for the
gRPC frontend the reference advertised but never shipped).

Usage: python client/grpc_test_client.py --target localhost:9090 [--model test_model]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import grpc

from tpuserve.server import tpuserve_pb2 as pb
from tpuserve.server.grpc import GrpcClient


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="localhost:9090")
    ap.add_argument("--model", default="test_model")
    args = ap.parse_args()

    failures = []

    def check(cond, msg):
        print(f"  [{'PASS' if cond else 'FAIL'}] {msg}")
        if not cond:
            failures.append(msg)

    c = GrpcClient(args.target)

    print("== Health ==")
    resp = c.health(pb.HealthRequest())
    check(resp.status == "healthy", f"status={resp.status}")

    print("== ListModels ==")
    resp = c.list_models(pb.ListModelsRequest())
    names = [m.name for m in resp.models]
    check(len(names) >= 1, f"models: {names}")
    model = args.model if args.model in names else (names[0] if names else args.model)

    print(f"== ModelStatus: {model} ==")
    st = c.model_status(pb.ModelRequest(name=model))
    cfg = json.loads(st.config_json)
    check(st.version != "", f"version {st.version}, platform {cfg.get('platform')}")

    print(f"== Load / double-load: {model} ==")
    resp = c.load_model(pb.ModelRequest(name=model))
    check("loaded" in resp.message.lower(), resp.message)
    resp = c.load_model(pb.ModelRequest(name=model))
    check("already" in resp.message.lower(), f"double load: {resp.message}")

    if cfg.get("platform") == "llm":
        print("== Generate (unary + stream) ==")
        req = pb.GenerateRequest(name=model, input_ids=[5, 17, 100], max_new_tokens=8)
        resp = c.generate(req)
        check(resp.num_generated >= 1, f"{resp.num_generated} tokens, {resp.finish_reason}")
        chunks = list(c.generate_stream(req))
        streamed = [ch.token for ch in chunks if not ch.done]
        check(chunks and chunks[-1].done, "stream ends with done")
        check(streamed == list(resp.generated_ids), "stream matches unary tokens")
    else:
        print("== Infer ==")
        inputs = []
        for inp in cfg.get("inputs", []):
            shape = [1 if d == -1 else int(d) for d in inp["shape"]]
            n = int(np.prod(shape))
            inputs.append(pb.Tensor(name=inp["name"], data_type=inp["data_type"],
                                     shape=shape,
                                     float_data=np.random.default_rng(0).normal(size=n).astype(np.float32).tolist()))
        resp = c.infer(pb.InferRequest(name=model, inputs=inputs))
        check(len(resp.outputs) >= 1, f"{len(resp.outputs)} outputs")
        t = resp.outputs[0].tensor
        check(len(t.float_data) or len(t.int_data), f"output '{t.name}' shape {list(t.shape)}")

    print("== Error paths ==")
    try:
        c.infer(pb.InferRequest(name="__nope__"))
        check(False, "unknown model should fail")
    except grpc.RpcError as e:
        check(e.code() == grpc.StatusCode.NOT_FOUND, f"unknown model -> {e.code()}")

    print("== Metrics ==")
    resp = c.metrics(pb.MetricsRequest())
    payload = json.loads(resp.json)
    check("memory" in payload, f"devices: {payload.get('device_count')}")

    print(f"== Unload: {model} ==")
    resp = c.unload_model(pb.ModelRequest(name=model))
    check("unloaded" in resp.message.lower() or "not loaded" in resp.message.lower(), resp.message)

    c.close()
    print()
    if failures:
        print(f"{len(failures)} FAILURES")
        sys.exit(1)
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
