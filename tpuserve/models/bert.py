"""BERT encoder family (bert-base default) — BASELINE.md configs[2] text
model of the mixed repository.

Pure-function encoder over a flat param dict: wordpiece/position/type
embeddings, post-LN transformer blocks, GELU FFN, pooler + optional
classifier. All matmul weights are 2-D and quantize through the standard
predicate.

Inputs: input_ids int32 [B, L], optional attention_mask int32 [B, L].
Outputs: logits [B, num_labels] (classifier) or pooled [B, D].
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from tpuserve.models.layers import layer_norm, linear
from tpuserve.models.registry import Architecture, register_architecture


@register_architecture("bert")
class Bert(Architecture):
    def _dims(self):
        mp = self.params_cfg
        return {
            "vocab_size": int(mp.get("vocab_size", 30522)),
            "dim": int(mp.get("dim", 768)),
            "n_layers": int(mp.get("n_layers", 12)),
            "n_heads": int(mp.get("n_heads", 12)),
            "ffn_dim": int(mp.get("ffn_dim", 3072)),
            "max_len": int(mp.get("max_len", 512)),
            "type_vocab": int(mp.get("type_vocab", 2)),
            "num_labels": int(mp.get("num_labels", 2)),
        }

    def init(self, rng: jax.Array) -> Dict[str, jax.Array]:
        d = self._dims()
        dtype = jnp.bfloat16
        params: Dict[str, jax.Array] = {}

        def nxt():
            nonlocal rng
            rng, k = jax.random.split(rng)
            return k

        def w(shape, std=0.02):
            return (jax.random.normal(nxt(), shape) * std).astype(dtype)

        params["embed/word"] = w((d["vocab_size"], d["dim"]))
        params["embed/position"] = w((d["max_len"], d["dim"]))
        params["embed/type"] = w((d["type_vocab"], d["dim"]))
        params["embed/ln/scale"] = jnp.ones((d["dim"],), dtype)
        params["embed/ln/bias"] = jnp.zeros((d["dim"],), dtype)
        for l in range(d["n_layers"]):
            pre = f"layers.{l}"
            for name, shape in [
                ("wq", (d["dim"], d["dim"])), ("wk", (d["dim"], d["dim"])),
                ("wv", (d["dim"], d["dim"])), ("wo", (d["dim"], d["dim"])),
                ("ffn_in", (d["dim"], d["ffn_dim"])), ("ffn_out", (d["ffn_dim"], d["dim"])),
            ]:
                params[f"{pre}/{name}/kernel"] = w(shape)
                params[f"{pre}/{name}/bias"] = jnp.zeros((shape[1],), dtype)
            for ln in ("attn_ln", "ffn_ln"):
                params[f"{pre}/{ln}/scale"] = jnp.ones((d["dim"],), dtype)
                params[f"{pre}/{ln}/bias"] = jnp.zeros((d["dim"],), dtype)
        params["pooler/kernel"] = w((d["dim"], d["dim"]))
        params["pooler/bias"] = jnp.zeros((d["dim"],), dtype)
        params["classifier/kernel"] = w((d["dim"], d["num_labels"]))
        params["classifier/bias"] = jnp.zeros((d["num_labels"],), dtype)
        return params

    def apply(self, params: Dict, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        d = self._dims()
        out_name = self.config.outputs[0].name if self.config.outputs else "logits"
        ids = inputs.get("input_ids")
        if ids is None:
            raise ValueError("bert requires 'input_ids'")
        ids = ids.astype(jnp.int32)
        b, l = ids.shape
        mask = inputs.get("attention_mask")
        mask = jnp.ones((b, l), jnp.int32) if mask is None else mask.astype(jnp.int32)

        x = (
            params["embed/word"][ids]
            + params["embed/position"][jnp.arange(l)][None, :, :]
            + params["embed/type"][jnp.zeros((b, l), jnp.int32)]
        )
        x = layer_norm(params, "embed/ln", x, eps=1e-12)

        attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)  # [B,1,1,L]
        h = d["dim"] // d["n_heads"]
        for layer in range(d["n_layers"]):
            pre = f"layers.{layer}"
            q = linear(params, f"{pre}/wq", x).reshape(b, l, d["n_heads"], h)
            k = linear(params, f"{pre}/wk", x).reshape(b, l, d["n_heads"], h)
            v = linear(params, f"{pre}/wv", x).reshape(b, l, d["n_heads"], h)
            scores = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32))
            scores = scores / math.sqrt(h) + attn_bias
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v.dtype), v).reshape(b, l, d["dim"])
            x = layer_norm(params, f"{pre}/attn_ln", x + linear(params, f"{pre}/wo", ctx), eps=1e-12)
            y = jax.nn.gelu(linear(params, f"{pre}/ffn_in", x).astype(jnp.float32)).astype(x.dtype)
            x = layer_norm(params, f"{pre}/ffn_ln", x + linear(params, f"{pre}/ffn_out", y), eps=1e-12)

        pooled = jnp.tanh(linear(params, "pooler", x[:, 0, :]).astype(jnp.float32)).astype(x.dtype)
        logits = linear(params, "classifier", pooled).astype(jnp.float32)
        return {out_name: logits, "pooled": pooled.astype(jnp.float32)}

    def quant_predicate(self, name: str, arr) -> bool:
        return arr.ndim == 2 and name.endswith("kernel")
