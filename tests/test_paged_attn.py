"""Bespoke paged decode-attention kernel (ops/paged_attn.py) vs the
gather + grouped-GQA oracle, bf16-layout and int8-with-scales paths, in
interpret mode; plus the engine routed through the kernel end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.nn.modules import _kv_quantize
from autoawq_tpu.ops.paged_attn import paged_decode_attention, supported


def _oracle(q, kp, vp, table, lengths, scale, ks=None, vs=None,
            softcap=None):
    b, nh, hd = q.shape
    nkv = kp.shape[0]
    kb = jnp.moveaxis(kp[:, table], 1, 0).reshape(b, nkv, -1, hd) \
        .astype(jnp.float32)
    vb = jnp.moveaxis(vp[:, table], 1, 0).reshape(b, nkv, -1, hd) \
        .astype(jnp.float32)
    rep = nh // nkv
    qg = q.reshape(b, nkv, rep, hd).astype(jnp.float32)
    s = jnp.einsum("bgrd,bgtd->bgrt", qg, kb) * scale
    if ks is not None:
        ksb = jnp.moveaxis(ks[:, table], 1, 0).reshape(b, nkv, -1)
        s = s * ksb[:, :, None, :]
    if softcap:
        s = jnp.tanh(s / softcap) * softcap
    valid = jnp.arange(kb.shape[2])[None, :] < lengths[:, None]
    s = jnp.where(valid[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, -1)
    if vs is not None:
        vsb = jnp.moveaxis(vs[:, table], 1, 0).reshape(b, nkv, -1)
        p = p * vsb[:, :, None, :]
    return jnp.einsum("bgrt,bgtd->bgrd", p, vb).reshape(b, nh * hd)


def _setup(rng, b=3, nh=8, nkv=2, hd=16, ps=8, npages=16, pps=4):
    q = jnp.asarray(rng.standard_normal((b, nh, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((nkv, npages, ps, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((nkv, npages, ps, hd)), jnp.float32)
    table = jnp.asarray(rng.permutation(npages)[: b * pps]
                        .reshape(b, pps).astype(np.int32))
    lengths = jnp.asarray(rng.integers(1, pps * ps, (b,)), jnp.int32)
    return q, kp, vp, table, lengths


@pytest.mark.parametrize("softcap", [None, 30.0])
def test_paged_attn_matches_oracle(rng, softcap):
    q, kp, vp, table, lengths = _setup(rng)
    scale = q.shape[-1] ** -0.5
    got = paged_decode_attention(q, kp, vp, table, lengths, scale=scale,
                                 softcap=softcap, interpret=True)
    ref = _oracle(q, kp, vp, table, lengths, scale, softcap=softcap)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_paged_attn_int8_matches_oracle(rng):
    q, kp, vp, table, lengths = _setup(rng, nh=4, nkv=4, hd=32)
    scale = q.shape[-1] ** -0.5
    k8, ks = _kv_quantize(kp)
    v8, vs = _kv_quantize(vp)
    got = paged_decode_attention(q, k8, v8, table, lengths, scale=scale,
                                 k_scales=ks, v_scales=vs, interpret=True)
    ref = _oracle(q, k8, v8, table, lengths, scale, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_gates():
    assert supported(8, 2, 16, 8)          # rep 4, aligned
    assert not supported(16, 1, 16, 8)     # rep 16 > sublane tile
    assert not supported(8, 2, 12, 8)      # hd % 8
    assert not supported(8, 2, 16, 6)      # ps % 8


def test_paged_engine_through_kernel(rng, monkeypatch):
    """AWQ_TPU_PAGED_ATTN=force routes the int8 paged engine's decode
    through the bespoke kernel (interpret mode) — streams must match the
    gather path exactly at f32."""
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.serve.paged import PagedBatchingEngine

    cfg = ModelConfig(
        model_type="llama", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=128)
    params = init_random_params(cfg, seed=3, scale=0.08)
    prompts = [rng.integers(0, 128, (n,)) for n in (5, 11)]

    def run():
        eng = PagedBatchingEngine(cfg, params, max_batch=2, page_size=8,
                                  total_pages=32, pages_per_seq=4,
                                  method="auto", dtype=jnp.float32,
                                  kv_quant=True)
        for i, p in enumerate(prompts):
            eng.add_request(i, p, max_new_tokens=6)
        return eng.run()

    monkeypatch.setenv("AWQ_TPU_PAGED_ATTN", "force")
    via_kernel = run()
    monkeypatch.setenv("AWQ_TPU_PAGED_ATTN", "0")
    via_gather = run()
    assert via_kernel == via_gather


def test_paged_attn_sliding_window_matches_oracle(rng):
    q, kp, vp, table, lengths = _setup(rng)
    scale = q.shape[-1] ** -0.5
    window = 9

    def oracle_win():
        b, nh, hd = q.shape
        nkv = kp.shape[0]
        kb = jnp.moveaxis(kp[:, table], 1, 0).reshape(b, nkv, -1, hd)
        vb = jnp.moveaxis(vp[:, table], 1, 0).reshape(b, nkv, -1, hd)
        qg = q.reshape(b, nkv, nh // nkv, hd)
        s = jnp.einsum("bgrd,bgtd->bgrt", qg, kb) * scale
        idx = jnp.arange(kb.shape[2])[None, :]
        ok = (idx < lengths[:, None]) & (idx >= (lengths - window)[:, None])
        s = jnp.where(ok[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, -1)
        return jnp.einsum("bgrt,bgtd->bgrd", p, vb).reshape(b, nh * hd)

    got = paged_decode_attention(q, kp, vp, table, lengths, scale=scale,
                                 window=window, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle_win()),
                               rtol=1e-5, atol=1e-5)


def test_paged_attn_alibi_matches_oracle(rng):
    from autoawq_tpu.nn.modules import alibi_slopes

    q, kp, vp, table, lengths = _setup(rng)
    b, nh, hd = q.shape
    nkv = kp.shape[0]
    scale = hd ** -0.5
    slopes = alibi_slopes(nh)

    def oracle_alibi():
        kb = jnp.moveaxis(kp[:, table], 1, 0).reshape(b, nkv, -1, hd)
        vb = jnp.moveaxis(vp[:, table], 1, 0).reshape(b, nkv, -1, hd)
        rep = nh // nkv
        qg = q.reshape(b, nkv, rep, hd)
        s = jnp.einsum("bgrd,bgtd->bgrt", qg, kb) * scale
        idx = jnp.arange(kb.shape[2])[None, :]
        rel = (idx - (lengths - 1)[:, None]).astype(jnp.float32)
        s = s + slopes.reshape(nkv, rep)[None, :, :, None] \
            * rel[:, None, None, :]
        s = jnp.where((idx < lengths[:, None])[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, -1)
        return jnp.einsum("bgrt,bgtd->bgrd", p, vb).reshape(b, nh * hd)

    got = paged_decode_attention(q, kp, vp, table, lengths, scale=scale,
                                 alibi_slopes=slopes, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle_alibi()),
                               rtol=1e-5, atol=1e-5)
