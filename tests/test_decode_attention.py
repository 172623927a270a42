"""Flash-decode attention kernel tests (interpret mode) against a numpy
reference: GQA, INT8 scales, masking, inactive slots, L-blocking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuserve.ops.decode_attention import (
    decode_attention,
    decode_attention_wide,
    decode_attention_wide_cache,
)


def _reference(q, k, v, k_scale, v_scale, positions):
    """Dense numpy GQA attention with per-(pos, head) dequant scales."""
    s, h, hd = q.shape
    _, l, n_kv, _ = k.shape
    rep = h // n_kv
    out = np.zeros((s, h, hd), np.float32)
    for si in range(s):
        pos = positions[si]
        if pos < 0:
            continue
        for hk in range(n_kv):
            kk = k[si, : pos + 1, hk, :].astype(np.float32)
            vv = v[si, : pos + 1, hk, :].astype(np.float32)
            if k_scale is not None:
                kk = kk * k_scale[si, hk, : pos + 1][:, None]
                vv = vv * v_scale[si, hk, : pos + 1][:, None]
            for r in range(rep):
                qi = q[si, hk * rep + r, :].astype(np.float32)
                scores = kk @ qi  # [pos+1] (q is pre-scaled by caller)
                p = np.exp(scores - scores.max())
                p = p / p.sum()
                out[si, hk * rep + r, :] = p @ vv
    return out


def _setup(rng, s=3, l=64, n_kv=2, rep=2, hd=32, quantized=True):
    h = n_kv * rep
    q = rng.normal(size=(s, h, hd)).astype(np.float32) / np.sqrt(hd)
    positions = np.array([5, -1, l - 1], np.int32)[:s]
    if quantized:
        k = rng.integers(-127, 127, size=(s, l, n_kv, hd)).astype(np.int8)
        v = rng.integers(-127, 127, size=(s, l, n_kv, hd)).astype(np.int8)
        # head-major [S, Hkv, L] — the cache's stored layout (wide kernels)
        ks = rng.uniform(0.001, 0.02, size=(s, n_kv, l)).astype(np.float32)
        vs = rng.uniform(0.001, 0.02, size=(s, n_kv, l)).astype(np.float32)
    else:
        k = rng.normal(size=(s, l, n_kv, hd)).astype(np.float32)
        v = rng.normal(size=(s, l, n_kv, hd)).astype(np.float32)
        ks = vs = None
    return q, k, v, ks, vs, positions


@pytest.mark.parametrize("quantized", [True, False])
def test_matches_reference(rng, quantized):
    q, k, v, ks, vs, positions = _setup(rng, quantized=quantized)
    out = np.asarray(
        decode_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            None if ks is None else jnp.asarray(ks.transpose(0, 2, 1)),
            None if vs is None else jnp.asarray(vs.transpose(0, 2, 1)),
            jnp.asarray(positions), interpret=True,
        )
    )
    ref = _reference(q, k, v, ks, vs, positions)
    # int8 KV also quantizes q per head (SageAttention-style int8 score
    # dot) — wider tolerance than the pure-float path
    tol = dict(rtol=5e-2, atol=1e-2) if quantized else dict(rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(out, ref, **tol)


def test_inactive_slot_zero(rng):
    q, k, v, ks, vs, positions = _setup(rng)
    out = np.asarray(
        decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(ks.transpose(0, 2, 1)),
                          jnp.asarray(vs.transpose(0, 2, 1)),
                          jnp.asarray(positions), interpret=True)
    )
    assert np.all(out[1] == 0.0)  # position -1
    assert not np.all(out[0] == 0.0)


def test_l_blocking_consistent(rng):
    """Multiple L blocks (online softmax) == single block, within bf16
    probability rounding (p@v runs in bf16, as in standard flash kernels;
    per-block max normalization shifts the rounding pattern)."""
    q, k, v, ks, vs, positions = _setup(rng, l=128)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(ks.transpose(0, 2, 1)), jnp.asarray(vs.transpose(0, 2, 1)),
            jnp.asarray(positions))
    full = np.asarray(decode_attention(*args, block_l=128, interpret=True))
    blocked = np.asarray(decode_attention(*args, block_l=32, interpret=True))
    np.testing.assert_allclose(blocked, full, rtol=5e-2, atol=1e-2)
    # and both track the exact f32 reference
    ref = _reference(q, k, v, ks, vs, positions)
    np.testing.assert_allclose(blocked, ref, rtol=5e-2, atol=1e-2)


def test_mha_rep1(rng):
    q, k, v, ks, vs, positions = _setup(rng, n_kv=4, rep=1)
    out = np.asarray(
        decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(ks.transpose(0, 2, 1)),
                          jnp.asarray(vs.transpose(0, 2, 1)),
                          jnp.asarray(positions), interpret=True)
    )
    ref = _reference(q, k, v, ks, vs, positions)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=1e-2)


@pytest.mark.parametrize("quantized", [True, False])
def test_wide_matches_reference(rng, quantized):
    q, k, v, ks, vs, positions = _setup(rng, quantized=quantized)
    out = np.asarray(
        decode_attention_wide(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            None if ks is None else jnp.asarray(ks),
            None if vs is None else jnp.asarray(vs),
            jnp.asarray(positions), interpret=True,
        )
    )
    ref = _reference(q, k, v, ks, vs, positions)
    tol = dict(rtol=5e-2, atol=1e-2) if quantized else dict(rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(out, ref, **tol)


def test_wide_mha_blocked(rng):
    q, k, v, ks, vs, positions = _setup(rng, n_kv=4, rep=1, l=128)
    out = np.asarray(
        decode_attention_wide(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(ks), jnp.asarray(vs),
                              jnp.asarray(positions), block_l=32,
                              interpret=True)
    )
    ref = _reference(q, k, v, ks, vs, positions)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=1e-2)
    assert np.all(out[1] == 0.0)  # inactive slot


@pytest.mark.parametrize("quantized", [True, False])
@pytest.mark.parametrize("layer", [0, 2])
def test_wide_cache_layer_offset(rng, quantized, layer):
    """Full-cache entry point: reads the right layer of [n_layers, ...] and
    honors the static window (garbage past it must not leak in)."""
    n_layers, s, l = 3, 3, 64
    q, k, v, ks, vs, positions = _setup(rng, s=s, l=l, quantized=quantized)
    if quantized:
        k_full = rng.integers(-127, 127, size=(n_layers,) + k.shape).astype(np.int8)
        v_full = rng.integers(-127, 127, size=(n_layers,) + v.shape).astype(np.int8)
    else:
        k_full = rng.normal(size=(n_layers,) + k.shape).astype(np.float32)
        v_full = rng.normal(size=(n_layers,) + v.shape).astype(np.float32)
    k_full[layer], v_full[layer] = k, v
    out = np.asarray(
        decode_attention_wide_cache(
            jnp.asarray(q), jnp.asarray(k_full), jnp.asarray(v_full),
            None if ks is None else jnp.asarray(ks),
            None if vs is None else jnp.asarray(vs),
            jnp.asarray(positions), layer, block_l=32, interpret=True,
        )
    )
    ref = _reference(q, k, v, ks, vs, positions)
    tol = dict(rtol=5e-2, atol=1e-2) if quantized else dict(rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(out, ref, **tol)


@pytest.mark.parametrize("quantized", [True, False])
def test_wide_cache_packed_slots(quantized):
    """Sub-MB windows pack multiple slots per KV block (_packed_kernel);
    cross-slot scores must be masked and results must match the per-slot
    reference, including an inactive slot inside a packed group. Local rng:
    the int8 P-requant tolerance is tight enough that the shared session
    stream makes it order-dependent."""
    rng = np.random.default_rng(11)
    s, l = 4, 64
    q, k, v, ks, vs, _ = _setup(rng, s=s, l=l, quantized=quantized)
    positions = np.array([5, -1, l - 1, 17], np.int32)
    out = np.asarray(
        decode_attention_wide_cache(
            jnp.asarray(q), jnp.asarray(k)[None], jnp.asarray(v)[None],
            None if ks is None else jnp.asarray(ks),
            None if vs is None else jnp.asarray(vs),
            jnp.asarray(positions), 0, interpret=True,
        )
    )
    ref = _reference(q, k, v, ks, vs, positions)
    # int8 P-requant keeps ~7 bits of the row max; the packed variant's
    # per-group max differs from the reference's per-slot one, so single
    # elements can land just past 1e-2 absolute depending on the draw
    tol = dict(rtol=5e-2, atol=2e-2) if quantized else dict(rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(out, ref, **tol)
    assert np.all(out[1] == 0.0)


def test_wide_cache_window(rng):
    """window=32 on an L=64 cache must equal the full read when every live
    position is below 32."""
    q, k, v, ks, vs, positions = _setup(rng, s=2, l=64)
    positions = np.array([5, 20], np.int32)
    k_full = k[None]
    v_full = v[None]
    full = np.asarray(
        decode_attention_wide_cache(
            jnp.asarray(q), jnp.asarray(k_full), jnp.asarray(v_full),
            jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(positions), 0,
            block_l=32, interpret=True)
    )
    windowed = np.asarray(
        decode_attention_wide_cache(
            jnp.asarray(q), jnp.asarray(k_full), jnp.asarray(v_full),
            jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(positions), 0,
            window=32, block_l=32, interpret=True)
    )
    np.testing.assert_allclose(windowed, full, rtol=1e-6, atol=1e-6)


def _decode_step_with_mode(monkeypatch, mode, flat=False):
    """Run llama.decode_step tiny-scale with a forced attention mode
    (interpret-mode kernels) and return the logits."""
    import tpuserve.models.llama as llama_mod
    import tpuserve.ops.decode_attention as da_mod
    from tpuserve.models import llama
    from tpuserve.models.llama import KVCache, LlamaParams

    p = LlamaParams.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32)
    cache = KVCache.create(p, 2, 32, quantized=True, flat=flat)
    tokens16 = np.zeros((1, 16), np.int32)
    tokens16[0, :4] = [5, 9, 3, 7]
    _, cache = llama.prefill(params, p, jnp.asarray(tokens16), cache, jnp.int32(0), jnp.int32(4))

    t = jnp.asarray(np.array([11, 0], np.int32))
    pos = jnp.asarray(np.array([4, -1], np.int32))
    if mode != "xla":
        monkeypatch.setattr(llama_mod, "_decode_attn_mode", lambda _p: mode)
        for name in ("decode_attention", "decode_attention_wide_cache"):
            orig = getattr(da_mod, name)
            monkeypatch.setattr(
                da_mod, name,
                (lambda orig: lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))(orig),
            )
    logits, _ = llama.decode_step(params, p, t, cache, pos)
    return np.asarray(logits)


@pytest.mark.parametrize("mode", ["grouped", "pallas"])
def test_matches_llama_xla_path(rng, monkeypatch, mode):
    """Both kernels must agree with llama.decode_step's XLA einsum path."""
    logits_xla = _decode_step_with_mode(monkeypatch, "xla")
    logits_pl = _decode_step_with_mode(monkeypatch, mode)
    np.testing.assert_allclose(logits_pl[0], logits_xla[0], rtol=5e-2, atol=5e-2)


def test_flat_cache_layouts_agree(rng, monkeypatch):
    """The flat [.., L, W] cache layout (wide-kernel serving layout) must be
    numerically identical to the 5D layout on the XLA path, and the pallas
    path over the flat cache must agree too."""
    logits_5d = _decode_step_with_mode(monkeypatch, "xla", flat=False)
    logits_flat = _decode_step_with_mode(monkeypatch, "xla", flat=True)
    np.testing.assert_allclose(logits_flat, logits_5d, rtol=1e-5, atol=1e-5)
    logits_pl = _decode_step_with_mode(monkeypatch, "pallas", flat=True)
    np.testing.assert_allclose(logits_pl[0], logits_5d[0], rtol=5e-2, atol=5e-2)
