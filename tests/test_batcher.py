"""Dynamic micro-batching tests (VERDICT r1 next #8: make the reference's
dead `dynamic_batching`/`instance_count` flags real). Proves >1 concurrent
requests coalesce into one forward, outputs split correctly, errors fan
out, and unbatchable shapes fall through."""

import json
import os
import threading
import time

import numpy as np
import pytest

from tpuserve.engine.batcher import MicroBatcher
from tpuserve.utils.dtypes import DataType
from tpuserve.utils.tensor import Tensor


def _t(name, arr):
    arr = np.asarray(arr, np.float32)
    return Tensor(name=name, dtype=DataType.FP32, shape=arr.shape, data=arr)


class CountingInfer:
    def __init__(self, delay=0.0):
        self.calls = []
        self.delay = delay

    def __call__(self, inputs):
        self.calls.append([t.shape for t in inputs])
        if self.delay:
            time.sleep(self.delay)
        x = inputs[0].numpy()
        return [_t("y", x * 2.0)]


class TestMicroBatcher:
    def test_concurrent_requests_coalesce(self):
        fn = CountingInfer()
        mb = MicroBatcher(fn, batch_axis_inputs=["x"], max_queue_delay_us=100_000)
        results = {}
        barrier = threading.Barrier(3)

        def run(i):
            barrier.wait()
            if i > 0:
                time.sleep(0.02)  # followers arrive inside the leader window
            out = mb.infer([_t("x", np.full((1, 3), float(i)))])
            results[i] = out[0].numpy()

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # one merged forward of batch 3 (or leader+stragglers in <=2 calls)
        total_rows = sum(s[0][0] for s in fn.calls)
        assert total_rows == 3
        assert len(fn.calls) < 3, f"no coalescing happened: {fn.calls}"
        assert mb.batched_requests >= 2
        for i in range(3):
            np.testing.assert_allclose(results[i], np.full((1, 3), 2.0 * i))

    def test_mismatched_shapes_do_not_merge(self):
        fn = CountingInfer()
        mb = MicroBatcher(fn, batch_axis_inputs=["x"], max_queue_delay_us=0)
        out = mb.infer([_t("x", np.ones((2, 5)))])
        assert out[0].shape == (2, 5)
        out2 = mb.infer([_t("x", np.ones((1, 3)))])
        assert out2[0].shape == (1, 3)
        assert len(fn.calls) == 2

    def test_unbatchable_input_falls_through(self):
        fn = CountingInfer()
        mb = MicroBatcher(fn, batch_axis_inputs=[], max_queue_delay_us=10_000)
        out = mb.infer([_t("x", np.ones((1, 3)))])
        assert out[0].shape == (1, 3)
        assert len(fn.calls) == 1

    def test_error_propagates_to_followers(self):
        calls = []

        def boom(inputs):
            calls.append(1)
            time.sleep(0.01)
            raise RuntimeError("kaboom")

        mb = MicroBatcher(boom, batch_axis_inputs=["x"], max_queue_delay_us=100_000)
        errors = []
        barrier = threading.Barrier(2)

        def run(i):
            barrier.wait()
            if i > 0:
                time.sleep(0.02)
            try:
                mb.infer([_t("x", np.ones((1, 3)))])
            except RuntimeError as e:
                errors.append(str(e))

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == ["kaboom", "kaboom"]

    def test_instance_count_bounds_concurrency(self):
        active = []
        peak = []
        lock = threading.Lock()

        def slow(inputs):
            with lock:
                active.append(1)
                peak.append(len(active))
            time.sleep(0.05)
            with lock:
                active.pop()
            return [_t("y", inputs[0].numpy())]

        mb = MicroBatcher(slow, batch_axis_inputs=[], instance_count=2,
                          max_queue_delay_us=0, enabled=False)
        threads = [threading.Thread(target=lambda: mb.infer([_t("x", np.ones((1, 3)))]))
                   for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert max(peak) <= 2


class TestModelIntegration:
    def test_manager_dynamic_batching_stats(self, tmp_path):
        """A JAX MLP with dynamic_batching=true coalesces concurrent /infer
        calls — visible in the model's stats."""
        from safetensors.numpy import save_file

        from tpuserve.engine.manager import InferenceManager
        from tpuserve.fixtures import make_test_model_weights

        vdir = os.path.join(str(tmp_path), "batched_mlp", "1")
        os.makedirs(vdir)
        save_file(make_test_model_weights(), os.path.join(vdir, "model.safetensors"))
        cfg = {
            "name": "batched_mlp",
            "platform": "jax",
            "architecture": "mlp",
            "max_batch_size": 16,
            "dynamic_batching": True,
            "instance_count": 1,
            "inputs": [{"name": "input", "shape": [-1, 3], "data_type": "FP32"}],
            "outputs": [{"name": "output", "shape": [-1, 2], "data_type": "FP32"}],
            "model_params": {"features": [5, 2], "activation": "relu"},
        }
        with open(os.path.join(vdir, "config.json"), "w") as f:
            json.dump(cfg, f)

        m = InferenceManager(str(tmp_path))
        try:
            m.load_model("batched_mlp")
            # prime compile for the merged bucket so the timed window is tiny
            m.run_inference("batched_mlp", [_t("input", np.ones((4, 3)))])

            barrier = threading.Barrier(4)
            outs = {}

            def run(i):
                barrier.wait()
                if i > 0:
                    time.sleep(0.001)
                outs[i] = m.run_inference(
                    "batched_mlp", [_t("input", np.full((1, 3), float(i)))]
                )

            threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            stats = m.get_model_status("batched_mlp")["stats"]
            assert stats.get("dynamic_batched_requests", 0) >= 2, stats
            # each request still gets ITS answer
            from tpuserve.fixtures import reference_mlp_forward, make_test_model_weights

            w = make_test_model_weights()
            for i in range(4):
                expect = reference_mlp_forward(w, np.full((1, 3), float(i), np.float32))
                np.testing.assert_allclose(outs[i][0].numpy(), expect, rtol=1e-4, atol=1e-4)
        finally:
            m.shutdown()
