"""TP fused attention step: per-chip re-fused qkv stack (nn/fuse.
tp_stack_qkv) through the fused megakernel under custom_partitioning
(ops/tp_attn.py). Decode logits must match the jnp path both on one
device (stack-loop fallback) and sharded over the tensor axis."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import fuse as fuse_mod
from autoawq_tpu.nn import modules
from autoawq_tpu.ops import gemm
from autoawq_tpu.parallel.mesh import build_mesh
from autoawq_tpu.parallel.specs import shard_params
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.utils.synth import random_quantized_params

CFG = ModelConfig(
    model_type="llama", vocab_size=512, hidden_size=256,
    intermediate_size=512, num_hidden_layers=2, num_attention_heads=8,
    num_key_value_heads=4, head_dim=32, max_position_embeddings=128)


def _params(tp):
    params = random_quantized_params(CFG, seed=0, group_size=64,
                                     fp_dtype=jnp.float32)
    return fuse_mod.tp_stack_qkv(CFG, params, tp)


def _deq(lin, n):
    return np.asarray(gemm.dequantize_planar(
        jnp.asarray(lin["qweight"]), jnp.asarray(lin["scales"]),
        None if lin.get("qzeros") is None else jnp.asarray(lin["qzeros"]),
        dtype=jnp.float32))[:, :n]


def test_tp_stack_dequant_matches_slices():
    """Each stack entry dequantizes to [q_i | k_i | v_i] for that chip's
    head slices — the surgery is numerically exact."""
    tp = 2
    params = _params(tp)
    attn = params["layers"][0]["self_attn"]
    nh, nkv, hd = 8, 4, 32
    pq, pk = nh * hd // tp, nkv * hd // tp
    wq = _deq(attn["q_proj"], nh * hd)
    wk = _deq(attn["k_proj"], nkv * hd)
    wv = _deq(attn["v_proj"], nkv * hd)
    st = attn["qkv_proj_tp"]
    for i in range(tp):
        entry = {k: (v[i] if v is not None else None)
                 for k, v in st.items()}
        got = _deq(entry, pq + 2 * pk)
        want = np.concatenate([
            wq[:, i * pq:(i + 1) * pq], wk[:, i * pk:(i + 1) * pk],
            wv[:, i * pk:(i + 1) * pk]], axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _decode_logits(params, method, mesh=None, sharded=None):
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)))
    caches = gen.init_kv_cache(CFG, 2, 64, jnp.float32)
    logits, caches = gen.prefill(CFG, params, prompt, caches, "jnp",
                                 jnp.float32)
    tok = jnp.argmax(logits, -1)[:, None]
    p = sharded if sharded is not None else params
    if mesh is not None:
        with mesh:
            out, _ = jax.jit(lambda p, t, c: gen.decode_step(
                CFG, p, t, c, jnp.int32(16), method, jnp.float32))(
                p, tok, caches)
    else:
        out, _ = gen.decode_step(CFG, p, tok, caches, jnp.int32(16),
                                 method, jnp.float32)
    return np.asarray(out)


def test_tp_fused_attn_single_device_matches_jnp(monkeypatch):
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "force")
    params = _params(tp=2)
    ref = _decode_logits(params, "jnp")
    got = _decode_logits(params, "auto")
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_tp_fused_attn_sharded_matches_jnp(monkeypatch):
    if jax.device_count() < 4:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "force")
    params = _params(tp=2)
    ref = _decode_logits(params, "jnp")
    mesh = build_mesh(tensor=2, data=jax.device_count() // 2)
    with mesh:
        sharded = shard_params(params, mesh, dtype=jnp.float32)
        st = sharded["layers"][0]["self_attn"]["qkv_proj_tp"]["qweight"]
        assert st.sharding.spec == jax.sharding.PartitionSpec(
            "tensor", None, None), st.sharding
    got = _decode_logits(params, "auto", mesh=mesh, sharded=sharded)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_tp_stack_rejects_indivisible_heads():
    params = random_quantized_params(CFG, seed=0, group_size=64,
                                     fp_dtype=jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        fuse_mod.tp_stack_qkv(CFG, params, tp=3)


def test_tp_path_actually_engages(monkeypatch):
    """Guard against the eligibility gate silently falling back to the
    per-linear path (numbers would still match)."""
    from autoawq_tpu.ops import tp_attn

    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "force")
    calls = []
    orig = tp_attn.fused_attention_step_tp

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(tp_attn, "fused_attention_step_tp", spy)
    gen.decode_step.clear_cache()  # force a retrace so the spy runs
    params = _params(tp=2)
    _decode_logits(params, "auto")
    assert calls, "TP fused attention path was never taken"


def test_api_shard_builds_tp_stack(monkeypatch):
    """AwqCausalLM.shard(mesh) builds the stacked layout and generation on
    the mesh matches the unsharded stream."""
    if jax.device_count() < 4:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from autoawq_tpu.api import AwqCausalLM
    from autoawq_tpu.config import AwqConfig

    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "force")
    params = random_quantized_params(CFG, seed=0, group_size=64,
                                     fp_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 8)))
    ref = np.asarray(gen.generate_compiled(CFG, params, prompt, 12,
                                           method="jnp",
                                           dtype=jnp.float32))
    model = AwqCausalLM(CFG, params, AwqConfig())
    mesh = build_mesh(tensor=2, data=jax.device_count() // 2)
    model.shard(mesh, dtype=jnp.float32)
    st = model.params["layers"][0]["self_attn"]["qkv_proj_tp"]
    assert st["qweight"].sharding.spec == jax.sharding.PartitionSpec(
        "tensor", None, None)
    with mesh:
        got = np.asarray(gen.generate_compiled(
            CFG, model.params, prompt, 12, method="auto",
            dtype=jnp.float32))
    np.testing.assert_array_equal(ref, got)


def test_tp_stack_skips_lora_layers(rng):
    """Regression: the stack is built from base weights only; with LoRA
    adapters present it must NOT be built (decode falls back to the
    per-linear sharded kernels where the adapters apply)."""
    from autoawq_tpu.train import lora as lora_mod

    params = random_quantized_params(CFG, seed=0, group_size=64,
                                     fp_dtype=jnp.float32)
    params = lora_mod.add_lora(CFG, params, rank=2, dtype=jnp.float32)
    out = fuse_mod.tp_stack_qkv(CFG, params, 2)
    for lp in out["layers"]:
        assert "qkv_proj_tp" not in lp["self_attn"]


def test_batching_engine_over_tp_sharded_params(rng, monkeypatch):
    """TP serving through the continuous-batching engine: the pool runs
    over Megatron-sharded params (per-linear sharded kernels at vector-pos
    decode; TP fused attention at admission prefill) and streams bit-match
    the unsharded engine."""
    if jax.device_count() < 4:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from autoawq_tpu.serve.batching import BatchingEngine

    monkeypatch.setenv("AWQ_TPU_FUSED_ATTN", "force")
    params = _params(tp=2)
    work = [(i, rng.integers(0, CFG.vocab_size, (4 + i,)), 6)
            for i in range(3)]

    def run(p, method):
        eng = BatchingEngine(CFG, p, max_batch=2, max_seq_len=64,
                             method=method, dtype=jnp.float32)
        for rid, pr, n in work:
            eng.add_request(rid, pr, n)
        return eng.run()

    ref = run(params, "jnp")
    mesh = build_mesh(tensor=2, data=jax.device_count() // 2)
    with mesh:
        sharded = shard_params(params, mesh, dtype=jnp.float32)
        got = run(sharded, "auto")
    assert got == ref
