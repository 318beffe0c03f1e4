"""Fused attention-step megakernel (ops/fused_attn_step.py) vs an fp32
numpy oracle, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import fuse, modules
from autoawq_tpu.ops import fused_attn_step as fas
from autoawq_tpu.ops.gemm import dequantize_planar
from autoawq_tpu.quantize.quantizer import quantize_linear_params


def _lin(rng, k, n, g=128):
    return quantize_linear_params(
        {"kernel": (rng.standard_normal((k, n)) * 0.05).astype(np.float32)},
        AwqConfig(q_group_size=g))


def _setup(rng, b, nh, nkv, hd, h, t):
    qkv = fuse._fuse_quant(
        [_lin(rng, h, nh * hd), _lin(rng, h, nkv * hd),
         _lin(rng, h, nkv * hd)], [nh * hd, nkv * hd, nkv * hd])
    qkv = {k: jnp.asarray(v) for k, v in qkv.items()}
    o = _lin(rng, nh * hd, h)
    x = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((b, nkv, t, hd)).astype(np.float32)
                     * 0.3, jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((b, nkv, t, hd)).astype(np.float32)
                     * 0.3, jnp.bfloat16)
    return qkv, o, x, kc, vc


def _oracle(qkv, o, x, kc, vc, pos, nh, nkv, hd, h, window, ang):
    rep = nh // nkv
    wq = np.asarray(dequantize_planar(
        qkv["qweight"], qkv["scales"], qkv.get("qzeros"),
        dtype=jnp.float32))[:, : (nh + 2 * nkv) * hd]
    wo = np.asarray(dequantize_planar(
        o["qweight"], o["scales"], o.get("qzeros"), dtype=jnp.float32))[:, :h]
    qkvo = np.asarray(x, np.float32) @ wq
    c0, s0 = np.cos(ang), np.sin(ang)

    def rope(z):
        half = hd // 2
        z1, z2 = z[..., :half], z[..., half:]
        return np.concatenate([z1 * c0 - z2 * s0, z2 * c0 + z1 * s0], -1)

    outs, knew, vnew = [], [], []
    scale = hd ** -0.5
    for bi in range(x.shape[0]):
        row, heads = qkvo[bi], []
        kr, vr = [], []
        for j in range(nkv):
            qg = rope(row[j * rep * hd:(j + 1) * rep * hd].reshape(rep, hd))
            kn = rope(row[nh * hd + j * hd: nh * hd + (j + 1) * hd]
                      .reshape(1, hd))
            vn = row[(nh + nkv) * hd + j * hd: (nh + nkv) * hd + (j + 1) * hd
                     ].reshape(1, hd)
            kr.append(kn[0]), vr.append(vn[0])
            ks = np.asarray(kc[bi, j], np.float32)
            vs = np.asarray(vc[bi, j], np.float32)
            keep = [i for i in range(pos)
                    if window is None or i > pos - window]
            kall = np.concatenate([ks[keep], kn], 0)
            vall = np.concatenate([vs[keep], vn], 0)
            s = (qg @ kall.T) * scale
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            heads.append(p @ vall)
        outs.append(np.concatenate(heads, 0).reshape(nh * hd))
        knew.append(np.stack(kr)), vnew.append(np.stack(vr))
    return np.stack(outs) @ wo, np.stack(knew), np.stack(vnew)


@pytest.mark.parametrize("b,nh,nkv,pos,window", [
    (1, 8, 2, 13, None),   # GQA
    (2, 8, 8, 30, None),   # MHA, batch 2
    (1, 8, 2, 40, 16),     # sliding window
])
def test_fused_attn_step_matches_oracle(rng, b, nh, nkv, pos, window):
    hd, h, t = 64, 256, 64
    qkv, o, x, kc, vc = _setup(rng, b, nh, nkv, hd, h, t)
    ang = pos * (10000.0 ** (-np.arange(hd // 2) * 2 / hd))
    cos = jnp.asarray(np.broadcast_to(np.cos(ang), (b, hd // 2)), jnp.float32)
    sin = jnp.asarray(np.broadcast_to(np.sin(ang), (b, hd // 2)), jnp.float32)
    y, kn, vn = fas.fused_attention_step(
        x, qkv, o, kc, vc, cos, sin, jnp.int32(pos), nh=nh, nkv=nkv, hd=hd,
        scale=hd ** -0.5, window=window, interpret=True)
    yo, kno, vno = _oracle(qkv, o, x, kc, vc, pos, nh, nkv, hd, h, window,
                           ang)
    assert np.abs(np.asarray(y, np.float32)[:, :h] - yo).max() \
        / (np.abs(yo).max() + 1e-9) < 0.03
    np.testing.assert_allclose(np.asarray(kn, np.float32), kno, atol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32), vno, atol=2e-2)


def test_fused_attn_generation_matches_jnp(rng, monkeypatch):
    """Whole-generation equality: both megakernels forced (interpret) vs the
    pure-jnp path — greedy tokens must match exactly."""
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils.synth import random_quantized_params

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=64, max_position_embeddings=128)
    p = jax.device_put(random_quantized_params(cfg, seed=0, fused=True,
                                               fp_dtype=jnp.bfloat16))
    pr = jnp.asarray(rng.integers(0, 128, (1, 8)))
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "force")
    monkeypatch.setenv("AWQ_TPU_FUSED_MLP", "force")
    o1 = np.asarray(gen.generate(cfg, p, pr, 12, method="auto",
                                 dtype=jnp.bfloat16))
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "0")
    monkeypatch.setenv("AWQ_TPU_FUSED_MLP", "0")
    o2 = np.asarray(gen.generate(cfg, p, pr, 12, method="jnp",
                                 dtype=jnp.bfloat16))
    np.testing.assert_array_equal(o1, o2)


def test_fused_attn_eligibility(rng):
    hd, h, t = 64, 256, 64
    qkv, o, x, kc, vc = _setup(rng, 1, 8, 2, hd, h, t)
    cfg = ModelConfig(model_type="llama", vocab_size=64, hidden_size=h,
                      intermediate_size=512, num_hidden_layers=1,
                      num_attention_heads=8, num_key_value_heads=2,
                      head_dim=hd, max_position_embeddings=t)
    p3 = x[:, None, :]
    assert fas.supported(cfg, {"qkv_proj": qkv, "o_proj": o}, p3, kc)
    # softcap / qk-norm / missing fusion / big batch fall back
    import dataclasses

    assert not fas.supported(cfg, {"o_proj": o}, p3, kc)
    assert not fas.supported(dataclasses.replace(cfg, attn_softcap=30.0),
                             {"qkv_proj": qkv, "o_proj": o}, p3, kc)
    assert not fas.supported(dataclasses.replace(cfg, qk_norm=True),
                             {"qkv_proj": qkv, "o_proj": o}, p3, kc)
    assert not fas.supported(cfg, {"qkv_proj": qkv, "o_proj": o},
                             jnp.zeros((16, 1, 256), jnp.bfloat16), kc)


def test_auto_policy_gate(rng, monkeypatch):
    """AWQ_TPU_FUSED_ATTN=auto engages the kernel only when B*T >= 2048
    (measured crossover: the kernel loses short-ctx bs1, wins long-ctx and
    batched decode)."""
    from autoawq_tpu.nn import modules

    hd, h, t = 64, 256, 64
    qkv, o, x, kc, vc = _setup(rng, 1, 8, 2, hd, h, t)
    cfg = ModelConfig(model_type="llama", vocab_size=64, hidden_size=h,
                      intermediate_size=512, num_hidden_layers=1,
                      num_attention_heads=8, num_key_value_heads=2,
                      head_dim=hd, max_position_embeddings=4096)
    p = {"qkv_proj": qkv, "o_proj": o}
    x3 = x[:, None, :]
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "force")
    small = {"k": kc, "v": vc, "pos": jnp.int32(3)}
    assert modules._fused_attn_ok(cfg, p, x3, "auto", small)
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "auto")
    # auto never fires off-TPU; the B*T branch is tested via the flag check
    # order: B*T < 2048 rejects before the backend check would accept
    big = {"k": jnp.zeros((1, 2, 4096, hd), jnp.bfloat16),
           "v": jnp.zeros((1, 2, 4096, hd), jnp.bfloat16),
           "pos": jnp.int32(3)}
    import jax as _jax
    on_tpu = _jax.default_backend() == "tpu"
    assert modules._fused_attn_ok(cfg, p, x3, "auto", big) == on_tpu
    assert not modules._fused_attn_ok(cfg, p, x3, "auto", small)
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "0")
    assert not modules._fused_attn_ok(cfg, p, x3, "auto", big)

    # int8 caches key the auto threshold on per-SEQUENCE context, not B*T:
    # batched short-ctx int8 decode is faster through the grouped XLA
    # chain (1214.0 vs 1144.8 tok/s at mistral bs8, CHIP_AB_R4C_RESULTS),
    # while bs1 long-ctx int8 still wants the megakernel (153.3 vs 148.7).
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "auto")

    def int8_cache(b, t):
        return {"k": jnp.zeros((b, 2, t, hd), jnp.int8),
                "v": jnp.zeros((b, 2, t, hd), jnp.int8),
                "k_s": jnp.zeros((b, 2, t), jnp.float32),
                "v_s": jnp.zeros((b, 2, t), jnp.float32),
                "pos": jnp.int32(3)}

    x8 = jnp.zeros((8, 1, h), jnp.bfloat16)
    # b*t = 2560 >= 2048 but t = 320 < 2048: grouped chain, never the kernel
    assert not modules._fused_attn_ok(cfg, p, x8, "auto", int8_cache(8, 320))
    # t = 4096 >= 2048: megakernel (on TPU)
    assert modules._fused_attn_ok(
        cfg, p, x3, "auto", int8_cache(1, 4096)) == on_tpu


def test_fused_attn_int8_cache_matches_grouped(rng, monkeypatch):
    """int8 KV cache through the megakernel (k_scales/v_scales folded
    in-kernel) vs the XLA grouped int8 path — same quantized cache, same
    math, logits must agree tightly and greedy streams exactly."""
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils.synth import random_quantized_params

    cfg = ModelConfig(model_type="llama", vocab_size=128, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=64, max_position_embeddings=128)
    p = jax.device_put(random_quantized_params(cfg, seed=0, fused=True,
                                               fp_dtype=jnp.bfloat16))
    pr = jnp.asarray(rng.integers(0, 128, (1, 8)))
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "force")
    monkeypatch.setenv("AWQ_TPU_FUSED_MLP", "0")
    o1 = np.asarray(gen.generate(cfg, p, pr, 12, method="auto",
                                 dtype=jnp.bfloat16, kv_quant=True))
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "0")
    o2 = np.asarray(gen.generate(cfg, p, pr, 12, method="auto",
                                 dtype=jnp.bfloat16, kv_quant=True))
    # both paths read the same int8 cache; the megakernel keeps the
    # CURRENT token's K/V in fp32 for its diagonal term while the grouped
    # path reads it back quantized — tokens may rarely differ there, so
    # compare streams with a high agreement floor instead of equality
    assert (o1 == o2).mean() > 0.9, (o1, o2)
