"""tpuserve — TPU-native quantized model-serving engine.

A brand-new, single-process serving framework built on JAX/XLA/Pallas that
replicates the capabilities of the reference GPU inference server
(Oscar-W-Chen/gpu-ai-inference-server — see SURVEY.md) and extends them
TPU-first:

- versioned filesystem model repository with dynamic load/unload
  (reference: inference_engine/src/model_repository.cpp)
- per-model execution engines behind a backend interface
  (reference: inference_engine/src/model.cpp ModelImpl backend dispatch)
- a real async lifecycle manager with a model state machine
  (reference: inference_engine/src/inference_manager.cpp — which the
  reference shipped but bypassed; here it is the single serving path)
- REST + gRPC frontends with health / device / memory telemetry
  (reference: server/main.go routes)
- per-model inference statistics (reference: model.cpp:572-610)

TPU-native additions (north star, BASELINE.md): weight-only INT8/INT4 and
FP8-activation quantization, INT8 KV cache, fused dequant+matmul Pallas
kernels, a paged continuous-batching scheduler, and tensor-sharded multi-host
serving over ICI/DCN meshes.

Where the reference stacks Go/Gin -> CGO -> C bridge -> C++ engine -> CUDA,
tpuserve is one Python process over XLA, with an optional native C++ runtime
(`native/` -> libtpuserve.so) for the filesystem repository scanner, the
lifecycle state machine, and the KV page allocator.
"""

__version__ = "0.1.0"

from tpuserve.utils.dtypes import DataType  # noqa: F401
from tpuserve.utils.tensor import Tensor  # noqa: F401
