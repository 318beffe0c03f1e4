"""MLA latent-cache decode (DeepSeek-V2 absorbed formulation) vs the
materialized full per-head K/V cache: same logits, ~100x smaller cache."""

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen

CFG = ModelConfig(
    model_type="deepseek_v2", vocab_size=128, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=4, q_lora_rank=None, kv_lora_rank=32,
    qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
    max_position_embeddings=64,
)


def _roll(params, prompt, n, latent):
    caches = gen.init_kv_cache(CFG, 1, prompt.shape[1] + n, jnp.float32,
                               mla_latent=latent)
    logits, caches = gen.prefill(CFG, params, prompt, caches, "jnp",
                                 jnp.float32)
    outs = [np.asarray(logits)]
    pos = prompt.shape[1]
    tok = jnp.argmax(logits, -1)[:, None]
    for _ in range(n - 1):
        logits, caches = gen.decode_step(CFG, params, tok, caches,
                                         jnp.int32(pos), "jnp", jnp.float32)
        outs.append(np.asarray(logits))
        tok = jnp.argmax(logits, -1)[:, None]
        pos += 1
    return np.stack(outs), caches


def test_latent_matches_materialized(rng):
    params = init_random_params(CFG, seed=9, scale=0.08)
    prompt = jnp.asarray(rng.integers(0, 128, (1, 10)))

    lat, lat_caches = _roll(params, prompt, 6, latent=True)
    mat, mat_caches = _roll(params, prompt, 6, latent=False)

    assert set(lat_caches[0]) == {"c"}
    assert set(mat_caches[0]) == {"k", "v"}
    # latent row per token vs nh full heads: cache bytes shrink accordingly
    lat_bytes = sum(v.nbytes for c in lat_caches for v in c.values())
    mat_bytes = sum(v.nbytes for c in mat_caches for v in c.values())
    assert lat_bytes < mat_bytes / 2
    np.testing.assert_allclose(lat, mat, rtol=2e-4, atol=2e-4)


def test_latent_generate_and_quantized(rng):
    """generate() defaults to the latent cache for MLA models; greedy
    tokens match the materialized roll, including on a quantized model."""
    from autoawq_tpu.config import AwqConfig
    from autoawq_tpu.quantize.quantizer import quantize_linear_params
    from autoawq_tpu.utils.tree import iter_linears, set_by_path

    params = init_random_params(CFG, seed=11, scale=0.08)
    for lp in params["layers"]:
        for path, p in list(iter_linears(lp)):
            set_by_path(lp, path, quantize_linear_params(
                {k: jnp.asarray(v) for k, v in p.items()},
                AwqConfig(q_group_size=16)))
    prompt = jnp.asarray(rng.integers(0, 128, (1, 8)))
    out = gen.generate(CFG, params, prompt, 6, method="jnp",
                       dtype=jnp.float32)
    lat, _ = _roll(params, prompt, 6, latent=True)
    mat, _ = _roll(params, prompt, 6, latent=False)
    np.testing.assert_allclose(lat, mat, rtol=5e-4, atol=5e-4)
    assert np.asarray(out).shape == (1, 14)
