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


def _masked_logits(lf: jax.Array, params: SamplingParams) -> jax.Array:
    """Temperature-scaled, top-k / top-p / min-p masked logits [N, V] — the
    processed distribution sample() draws from; dropped tokens are -inf.
    Rank-0 is never masked, so argmax(masked) == argmax(lf)."""
    n, v = lf.shape
    temp = jnp.maximum(params.temperature, 1e-6)[:, None]
    scaled = lf / temp

    # top-k mask: rank of each logit within its row (descending)
    sort_idx = jnp.argsort(-scaled, axis=-1)
    ranks = jnp.zeros_like(sort_idx).at[
        jnp.arange(n)[:, None], sort_idx
    ].set(jnp.broadcast_to(jnp.arange(v)[None, :], (n, v)))
    k = jnp.where(params.top_k[:, None] > 0, params.top_k[:, None], v)
    scaled = jnp.where(ranks < k, scaled, -jnp.inf)

    # top-p mask: keep the smallest prefix of sorted probs covering top_p
    sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep_sorted = (cum - sorted_probs) < params.top_p[:, None]  # always keeps rank 0
    keep = jnp.zeros_like(keep_sorted).at[jnp.arange(n)[:, None], sort_idx].set(keep_sorted)
    scaled = jnp.where(keep, scaled, -jnp.inf)

    # min-p mask: drop tokens whose (temperature-scaled) probability falls
    # below min_p * p_max — adaptive truncation that tracks distribution
    # sharpness better than a fixed top-k/p
    probs = jax.nn.softmax(scaled, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs >= params.min_p[:, None] * pmax, scaled, -jnp.inf)


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

    scaled = _masked_logits(lf, params)

    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (s, v), minval=1e-10, maxval=1.0)))
    sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

    return jnp.where(params.temperature > 0, sampled, greedy)


def spec_accept(
    logits: jax.Array, draft: jax.Array, lens: jax.Array,
    params: SamplingParams, key: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact speculative acceptance for point-mass (prompt-lookup) drafts.

    logits [S, C, V]: position j's logits predict the token at column j+1
    (the model distribution after column j's token is fed). draft [S, C]
    int32: column 0 is the slot's committed last token, columns 1..len-1
    the drafted continuation. lens [S]: valid columns per row (>=1), so a
    row carries k = lens-1 draft tokens.

    Acceptance (Leviathan/Chen rejection sampling with a point-mass
    proposal q): draft j is accepted with probability p_j(draft) under the
    slot's PROCESSED distribution (temperature / top-k / top-p / min-p —
    the same masks sample() applies); greedy slots (temperature<=0) accept
    iff the draft equals the argmax. At the first rejection the emitted
    token is drawn from the residual norm(max(p - q, 0)) — for point-mass
    q that is p with the rejected token masked out, renormalized — so the
    emitted sequence is distributed EXACTLY as token-by-token sampling.
    If all k drafts are accepted, a bonus token is drawn from p_k.

    Repetition penalty is NOT applied (the engine gates speculation on
    repetition_penalty == 1.0, where presence is a no-op).

    Returns (tokens [S, C] int32, logprobs [S, C] f32, accepted [S] int32):
    row i emits tokens[i, :accepted[i]+1]; logprobs are under the
    unfiltered model distribution (the serving convention).
    """
    s, c, v = logits.shape
    lf = logits.astype(jnp.float32)

    params_c = SamplingParams(
        temperature=jnp.repeat(params.temperature, c),
        top_k=jnp.repeat(params.top_k, c),
        top_p=jnp.repeat(params.top_p, c),
        repetition_penalty=jnp.repeat(params.repetition_penalty, c),
        min_p=jnp.repeat(params.min_p, c),
    )
    masked = _masked_logits(lf.reshape(s * c, v), params_c).reshape(s, c, v)
    probs = jax.nn.softmax(masked, axis=-1)
    greedy_tok = jnp.argmax(masked, axis=-1).astype(jnp.int32)  # == argmax(lf)

    key_u, key_g = jax.random.split(key)
    # the token judged by position-j logits sits at draft column j+1
    draft_next = jnp.concatenate(
        [draft[:, 1:], jnp.zeros((s, 1), jnp.int32)], axis=1)  # [S, C]
    p_draft = jnp.take_along_axis(probs, draft_next[..., None], axis=-1)[..., 0]
    u = jax.random.uniform(key_u, (s, c), minval=1e-10, maxval=1.0)
    accept = jnp.where((params.temperature > 0)[:, None],
                       u < p_draft, draft_next == greedy_tok)
    k = jnp.maximum(lens - 1, 0)  # number of drafts per row
    cols = jnp.arange(c, dtype=jnp.int32)[None, :]
    accept = accept & (cols < k[:, None])
    a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)  # [S]

    # final token at position a: residual (rejected draft masked) when a<k,
    # else the bonus draw from p_k
    m_a = jnp.take_along_axis(masked, a[:, None, None], axis=1)[:, 0]  # [S, V]
    rejected = jnp.take_along_axis(draft_next, a[:, None], axis=1)[:, 0]
    mask_rej = (a < k)[:, None] & (jnp.arange(v)[None, :] == rejected[:, None])
    m_final = jnp.where(mask_rej, -jnp.inf, m_a)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key_g, (s, v), minval=1e-10, maxval=1.0)))
    sampled_final = jnp.argmax(m_final + gumbel, axis=-1).astype(jnp.int32)
    greedy_final = jnp.argmax(m_final, axis=-1).astype(jnp.int32)
    final = jnp.where(params.temperature > 0, sampled_final, greedy_final)

    out = jnp.where(cols < a[:, None], draft_next, 0)
    out = jnp.where(cols == a[:, None], final[:, None], out).astype(jnp.int32)

    lse = jax.nn.logsumexp(lf, axis=-1)  # [S, C]
    lp = jnp.take_along_axis(lf, out[..., None], axis=-1)[..., 0] - lse
    return out, lp, a.astype(jnp.int32)


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
