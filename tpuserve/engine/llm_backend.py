"""Quantized-LLM backend: continuous batching over a paged KV cache.

No reference counterpart (the reference has no attention/KV machinery —
SURVEY.md §5); this is the north-star serving path. Filled in by the LLM
serving milestone; the class registers now so ModelType.LLM resolves.
"""

from __future__ import annotations

from typing import List

from tpuserve.engine.backend import Backend, register_backend
from tpuserve.repository.repo import ModelType
from tpuserve.utils.errors import BackendError
from tpuserve.utils.tensor import Tensor


@register_backend(ModelType.LLM)
class LLMBackend(Backend):
    def __init__(self, model_dir: str, config):
        super().__init__(model_dir, config)
        self._engine = None

    def load(self) -> None:
        from tpuserve.serving.engine import GenerationEngine

        self._engine = GenerationEngine(self.model_dir, self.config)
        self._engine.start()

    def unload(self) -> None:
        if self._engine is not None:
            self._engine.stop()
            self._engine = None

    def memory_usage_bytes(self) -> int:
        return self._engine.memory_usage_bytes() if self._engine else 0

    @property
    def engine(self):
        if self._engine is None:
            raise BackendError("model not loaded")
        return self._engine

    def infer(self, inputs: List[Tensor]) -> List[Tensor]:
        """Tensor-style entry: 'input_ids' int32 [1, L] (+ optional
        'max_new_tokens' int32 [1]) -> 'output_ids' int32 [1, L']."""
        return self.engine.infer_tensors(inputs)

    def generate(self, prompt_ids, **kw):
        return self.engine.generate(prompt_ids, **kw)
