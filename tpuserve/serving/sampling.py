"""Token sampling — jittable, batched over slots.

Greedy / temperature / top-k / top-p / repetition penalty, applied per slot
with per-slot parameters so one compiled sampler serves a mixed continuous
batch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SamplingParams:
    """Per-slot sampling parameters, each [S]-shaped."""

    temperature: jax.Array  # 0 -> greedy
    top_k: jax.Array  # 0 -> disabled
    top_p: jax.Array  # 1 -> disabled
    repetition_penalty: jax.Array  # 1 -> disabled (CTRL-style)
    min_p: jax.Array  # 0 -> disabled (keep tokens with p >= min_p * p_max)

    def tree_flatten(self):
        return (self.temperature, self.top_k, self.top_p,
                self.repetition_penalty, self.min_p), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_slots: int, temperature=0.0, top_k=0, top_p=1.0,
               repetition_penalty=1.0, min_p=0.0) -> "SamplingParams":
        return cls(
            temperature=jnp.full((n_slots,), float(temperature), jnp.float32),
            top_k=jnp.full((n_slots,), int(top_k), jnp.int32),
            top_p=jnp.full((n_slots,), float(top_p), jnp.float32),
            repetition_penalty=jnp.full((n_slots,), float(repetition_penalty),
                                        jnp.float32),
            min_p=jnp.full((n_slots,), float(min_p), jnp.float32),
        )

    def update_slot(self, slot: int, temperature: float, top_k: int,
                    top_p: float, repetition_penalty: float = 1.0,
                    min_p: float = 0.0) -> "SamplingParams":
        return SamplingParams(
            temperature=self.temperature.at[slot].set(float(temperature)),
            top_k=self.top_k.at[slot].set(int(top_k)),
            top_p=self.top_p.at[slot].set(float(top_p)),
            repetition_penalty=self.repetition_penalty.at[slot].set(
                float(repetition_penalty)),
            min_p=self.min_p.at[slot].set(float(min_p)),
        )


def mark_presence(presence: jax.Array, tokens: jax.Array) -> jax.Array:
    """Record sampled tokens in the per-slot presence mask [S, V] bool (the
    repetition-penalty working set; prompt tokens are seeded at admission)."""
    s = tokens.shape[0]
    return presence.at[jnp.arange(s), tokens].set(True)


def sample(logits: jax.Array, params: SamplingParams, key: jax.Array,
           presence: Optional[jax.Array] = None) -> jax.Array:
    """logits [S, V] -> token ids [S] int32.

    All filters are applied as masks so the whole thing stays one fused XLA
    program: repetition-penalized, temperature-scaled logits are masked by
    top-k rank and top-p cumulative mass, then Gumbel-max sampled;
    temperature<=0 slots take the plain argmax (still penalized).

    presence [S, V] bool marks tokens already in each slot's sequence
    (prompt + generated); CTRL-style penalty divides positive logits by
    repetition_penalty and multiplies negative ones, for present tokens.
    """
    s, v = logits.shape
    lf = logits.astype(jnp.float32)

    if presence is not None:
        rp = params.repetition_penalty[:, None]
        penalized = jnp.where(lf > 0, lf / rp, lf * rp)
        lf = jnp.where(presence & (rp != 1.0), penalized, lf)

    greedy = jnp.argmax(lf, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(params.temperature, 1e-6)[:, None]
    scaled = lf / temp

    # top-k mask: rank of each logit within its row (descending)
    sort_idx = jnp.argsort(-scaled, axis=-1)
    ranks = jnp.zeros_like(sort_idx).at[
        jnp.arange(s)[:, None], sort_idx
    ].set(jnp.broadcast_to(jnp.arange(v)[None, :], (s, v)))
    k = jnp.where(params.top_k[:, None] > 0, params.top_k[:, None], v)
    scaled = jnp.where(ranks < k, scaled, -jnp.inf)

    # top-p mask: keep the smallest prefix of sorted probs covering top_p
    sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (cum - sorted_probs) < params.top_p[:, None]  # always keeps rank 0
    keep = jnp.zeros_like(keep_sorted).at[jnp.arange(s)[:, None], sort_idx].set(keep_sorted)
    scaled = jnp.where(keep, scaled, -jnp.inf)

    # min-p mask: drop tokens whose (temperature-scaled) probability falls
    # below min_p * p_max — adaptive truncation that tracks distribution
    # sharpness better than a fixed top-k/p
    probs = jax.nn.softmax(scaled, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    scaled = jnp.where(probs >= params.min_p[:, None] * pmax, scaled, -jnp.inf)

    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (s, v), minval=1e-10, maxval=1.0)))
    sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

    return jnp.where(params.temperature > 0, sampled, greedy)


def sample_with_logprobs(
    logits: jax.Array, params: SamplingParams, key: jax.Array,
    presence: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """sample() + the chosen token's log-probability under the UNFILTERED
    distribution (the standard serving convention: logprobs reflect the
    model, not the sampler's truncation) + the updated presence mask.
    Returns (tokens [S] int32, logprobs [S] f32, presence|None)."""
    toks = sample(logits, params, key, presence)
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(
        logits.astype(jnp.float32), toks[:, None].astype(jnp.int32), axis=-1)[:, 0]
    lp = chosen - lse
    if presence is not None:
        presence = mark_presence(presence, toks)
    return toks, lp, presence
