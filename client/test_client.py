#!/usr/bin/env python3
"""End-to-end API test client.

Reference counterpart: client/test_client.py (420 LoC) — a requests-based
script against a live server URL exercising every endpoint, with lifecycle
idempotency checks (:143-165), shape-correct dummy-data generation
(:208-244), and top-5 classification pretty-printing. This version adds real
assertions (the reference only printed) and exits non-zero on failure.

Usage: python client/test_client.py --url http://localhost:8080 [--model test_model]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np
import requests


class Client:
    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")
        self.failures = []

    def check(self, cond, msg):
        tag = "PASS" if cond else "FAIL"
        print(f"  [{tag}] {msg}")
        if not cond:
            self.failures.append(msg)

    # ------------------------------------------------------------------
    def test_health(self):
        print("== /health ==")
        r = requests.get(f"{self.base}/health", timeout=30)
        self.check(r.status_code == 200, f"status {r.status_code}")
        body = r.json()
        self.check(body.get("status") == "healthy", f"body {body}")

    def test_device_endpoints(self):
        print("== /tpu /cuda /devices /tpu/memory ==")
        for path in ("/tpu", "/cuda"):
            r = requests.get(self.base + path, timeout=30)
            self.check(r.status_code == 200, f"GET {path} -> {r.status_code}")
            self.check("device_count" in r.json(), f"{path} reports device_count")
        r = requests.get(f"{self.base}/devices", timeout=30)
        self.check(r.status_code == 200 and "devices" in r.json(), "devices listed")
        for path in ("/tpu/memory", "/gpu/memory"):
            r = requests.get(self.base + path, timeout=30)
            mem = r.json().get("memory_info", [])
            self.check(r.status_code == 200 and len(mem) >= 1, f"{path}: {len(mem)} devices")
            if mem:
                self.check(
                    {"device_id", "total_mb", "free_mb", "used_mb", "used_percent"} <= set(mem[0]),
                    "memory fields present",
                )

    def test_list_models(self):
        print("== /models ==")
        r = requests.get(f"{self.base}/models", timeout=30)
        self.check(r.status_code == 200, f"status {r.status_code}")
        body = r.json()
        self.check("models" in body and "repository_path" in body, f"keys: {sorted(body)}")
        return [m["name"] for m in body.get("models", [])]

    def test_model_lifecycle(self, model: str):
        """≙ reference test_model_lifecycle (:143-165): load, double-load
        idempotency, status, unload, double-unload."""
        print(f"== lifecycle: {model} ==")
        r = requests.post(f"{self.base}/models/{model}/load", timeout=300)
        self.check(r.status_code in (200, 202), f"load -> {r.status_code} {r.json()}")
        r = requests.post(f"{self.base}/models/{model}/load", timeout=60)
        self.check(
            r.status_code == 200 and "already loaded" in r.json().get("message", "").lower(),
            f"double load -> already loaded ({r.json()})",
        )
        r = requests.get(f"{self.base}/models/{model}", timeout=30)
        body = r.json()
        self.check(body.get("is_loaded") is True, f"status shows loaded ({body.get('state')})")
        self.check(bool(body.get("available_versions")), "available_versions present")
        return body

    def generate_dummy_data(self, config: dict) -> dict:
        """Shape-correct dummy inputs (≙ generate_dynamic_dummy_data,
        reference client :208-244)."""
        inputs = {}
        for inp in config.get("inputs", []):
            shape = [1 if d == -1 else int(d) for d in inp["shape"]]
            n = int(np.prod(shape))
            inputs[inp["name"]] = np.random.default_rng(0).normal(size=n).astype(np.float32).tolist()
        return inputs

    @staticmethod
    def prepare_image_data(image_path: str, input_shape: list) -> list:
        """Real-image preprocessing (≙ reference prepare_image_data,
        client/test_client.py:167-206): RGB load, resize to the model's
        H x W, /255 normalize, HWC->CHW when the shape is NCHW, flatten."""
        from PIL import Image

        img = Image.open(image_path).convert("RGB")
        height, width = 224, 224
        if len(input_shape) >= 4:
            height, width = int(input_shape[2]), int(input_shape[3])
        elif len(input_shape) >= 2:
            height, width = int(input_shape[0]), int(input_shape[1])
        img = img.resize((width, height))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if len(input_shape) >= 4 and int(input_shape[1]) == 3:
            arr = arr.transpose(2, 0, 1)  # HWC -> CHW
        if len(input_shape) >= 4 and input_shape[0] in (1, -1):
            arr = arr[None]
        return arr.flatten().tolist()

    def test_inference(self, model: str, status_body: dict, image: str = ""):
        print(f"== inference: {model} ==")
        config = status_body.get("config", {})
        inputs = self.generate_dummy_data(config)
        if image:
            inps = config.get("inputs", [])
            img_inp = next(
                (i for i in inps
                 if len(i["shape"]) == 4 and 3 in (i["shape"][1], i["shape"][3])),
                None,
            )
            self.check(img_inp is not None, "model has an image-shaped input")
            if img_inp is not None:
                inputs[img_inp["name"]] = self.prepare_image_data(image, img_inp["shape"])
                print(f"  image '{image}' -> input '{img_inp['name']}'")
        payload = {"inputs": inputs}
        r = requests.post(f"{self.base}/models/{model}/infer", json=payload, timeout=300)
        self.check(r.status_code == 200, f"infer -> {r.status_code}: {r.text[:200]}")
        if r.status_code == 200:
            body = r.json()
            outs = body.get("outputs", [])
            self.check(len(outs) >= 1, f"{len(outs)} outputs")
            for o in outs:
                n = int(np.prod([abs(d) for d in o["shape"]]))
                self.check(len(o["data"]) == n, f"output '{o['name']}' has {len(o['data'])} values")
                if "classifications" in o:
                    print("  top-5 classifications:")
                    for c in o["classifications"]:
                        print(f"    {c.get('label', c['index'])}: {c['probability']:.4f}")

    def test_error_paths(self, model: str):
        print("== error paths ==")
        r = requests.post(f"{self.base}/models/__nope__/load", timeout=30)
        self.check(r.status_code == 404, f"load unknown model -> {r.status_code}")
        r = requests.post(f"{self.base}/models/{model}/infer", json={"inputs": {}}, timeout=30)
        self.check(r.status_code == 400, f"empty inputs -> {r.status_code}")
        r = requests.post(f"{self.base}/models/{model}/infer", data="not json", timeout=30)
        self.check(r.status_code == 400, f"malformed json -> {r.status_code}")

    def test_stats_and_metrics(self, model: str):
        print("== /stats /metrics ==")
        r = requests.get(f"{self.base}/models/{model}/stats", timeout=30)
        self.check(r.status_code == 200, f"stats -> {r.status_code}")
        if r.status_code == 200:
            stats = r.json().get("stats", {})
            self.check(stats.get("inference_count", 0) >= 1, f"inference_count {stats.get('inference_count')}")
        r = requests.get(f"{self.base}/metrics", timeout=30)
        self.check(r.status_code == 200 and "memory" in r.json(), "metrics endpoint")

    def test_generate(self, model: str, status_body: dict):
        """LLM models: /generate (unary + streaming) — skipped for
        non-generative models."""
        if status_body.get("config", {}).get("platform") != "llm":
            return
        print(f"== generate: {model} ==")
        payload = {"input_ids": [5, 17, 100], "max_new_tokens": 8}
        r = requests.post(f"{self.base}/models/{model}/generate", json=payload, timeout=300)
        self.check(r.status_code == 200, f"generate -> {r.status_code}: {r.text[:200]}")
        if r.status_code != 200:
            return
        body = r.json()
        self.check(body["output_ids"][:3] == [5, 17, 100], "prompt echoed")
        self.check(1 <= body["num_generated"] <= 8, f"generated {body['num_generated']}")
        # streaming yields the same tokens (greedy determinism)
        r = requests.post(
            f"{self.base}/models/{model}/generate",
            json={**payload, "stream": True}, timeout=300, stream=True,
        )
        chunks = [json.loads(line) for line in r.iter_lines() if line]
        streamed = [c["token"] for c in chunks if "token" in c]
        self.check(chunks and chunks[-1].get("done"), "stream ends with done record")
        self.check(streamed == body["generated_ids"], "stream matches unary tokens")
        # round-2 sampling features: logprobs, stop ids, repetition penalty
        r = requests.post(f"{self.base}/models/{model}/generate",
                          json={**payload, "logprobs": True}, timeout=300)
        lp = r.json().get("logprobs", [])
        self.check(r.status_code == 200 and len(lp) == r.json()["num_generated"]
                   and all(x <= 0.0 for x in lp), "logprobs returned, <= 0")
        first = body["generated_ids"][0]
        r = requests.post(f"{self.base}/models/{model}/generate",
                          json={**payload, "stop_token_ids": [first]}, timeout=300)
        self.check(r.status_code == 200
                   and r.json()["finish_reason"] == "stop"
                   and r.json()["num_generated"] == 1, "stop_token_ids retire")
        r = requests.post(f"{self.base}/models/{model}/generate",
                          json={**payload, "repetition_penalty": 1.2}, timeout=300)
        self.check(r.status_code == 200 and r.json()["num_generated"] >= 1,
                   "repetition_penalty accepted")

    def test_unload(self, model: str):
        print(f"== unload: {model} ==")
        r = requests.post(f"{self.base}/models/{model}/unload", timeout=60)
        self.check(r.status_code in (200, 201), f"unload -> {r.status_code}")
        r = requests.post(f"{self.base}/models/{model}/unload", timeout=60)
        self.check(
            r.status_code == 200 and "not loaded" in r.json().get("message", "").lower(),
            f"double unload -> not loaded ({r.json()})",
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://localhost:8080")
    p.add_argument("--model", default="test_model")
    p.add_argument("--image", default="",
                   help="path to an image file; preprocessed (resize, "
                        "normalize, NCHW) and fed to the model's image input")
    args = p.parse_args()

    c = Client(args.url)
    c.test_health()
    c.test_device_endpoints()
    models = c.test_list_models()
    model = args.model if args.model in models or not models else models[0]
    status = c.test_model_lifecycle(model)
    c.test_inference(model, status, image=args.image)
    c.test_generate(model, status)
    c.test_error_paths(model)
    c.test_stats_and_metrics(model)
    c.test_unload(model)

    print()
    if c.failures:
        print(f"{len(c.failures)} FAILURES:")
        for f in c.failures:
            print(f"  - {f}")
        sys.exit(1)
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
