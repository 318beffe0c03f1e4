"""Synthetic quantized models for benchmarks / compile checks.

Generates randomly packed int4 params directly (no calibration) — weight
values are irrelevant for throughput and compile validation.
"""

from __future__ import annotations

import numpy as np

from autoawq_tpu.models.config import ModelConfig


def random_quantized_params(cfg: ModelConfig, seed: int = 0,
                            group_size: int = 128, fp_dtype=None):
    import jax.numpy as jnp

    from autoawq_tpu.core.packing import padded_out_features

    fp_dtype = fp_dtype or jnp.bfloat16
    rng = np.random.default_rng(seed)
    g = group_size

    def qlin(k, n):
        n_pad = padded_out_features(n)
        return {
            "qweight": jnp.asarray(
                rng.integers(-(2**31), 2**31, (k, n_pad // 8), dtype=np.int64)
                .astype(np.int32)
            ),
            "qzeros": jnp.asarray(
                rng.integers(-(2**31), 2**31, (k // g, n_pad // 8),
                             dtype=np.int64).astype(np.int32)
            ),
            "scales": jnp.asarray(
                (rng.random((k // g, n_pad), dtype=np.float32) + 0.5) * 0.01
            ),
        }

    h, hd = cfg.hidden_size, cfg.head_dim_
    nh, nkv, inter = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.intermediate_size)
    params = {
        "embed_tokens": {
            "weight": jnp.asarray(
                rng.standard_normal((cfg.vocab_size, h)) * 0.02, dtype=fp_dtype
            )
        },
        "norm": {"weight": jnp.ones((h,), fp_dtype)},
        "lm_head": None if cfg.tie_word_embeddings else {
            "kernel": jnp.asarray(
                rng.standard_normal((h, cfg.vocab_size)) * 0.02, dtype=fp_dtype
            )
        },
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        lp = {
            "input_layernorm": {"weight": jnp.ones((h,), fp_dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), fp_dtype)},
            "self_attn": {
                "q_proj": qlin(h, nh * hd),
                "k_proj": qlin(h, nkv * hd),
                "v_proj": qlin(h, nkv * hd),
                "o_proj": qlin(nh * hd, h),
            },
        }
        if cfg.qk_norm:
            lp["self_attn"]["q_norm"] = {"weight": jnp.ones((hd,), fp_dtype)}
            lp["self_attn"]["k_norm"] = {"weight": jnp.ones((hd,), fp_dtype)}
        if cfg.is_moe:
            ie = cfg.moe_intermediate_size or inter
            lp["mlp"] = {
                "gate": {"kernel": jnp.asarray(
                    rng.standard_normal((h, cfg.num_experts)) * 0.02,
                    dtype=fp_dtype)},
                "experts": [
                    {"gate_proj": qlin(h, ie), "up_proj": qlin(h, ie),
                     "down_proj": qlin(ie, h)}
                    for _ in range(cfg.num_experts)
                ],
            }
        else:
            lp["mlp"] = {
                "gate_proj": qlin(h, inter),
                "up_proj": qlin(h, inter),
                "down_proj": qlin(inter, h),
            }
        params["layers"].append(lp)
    return params
