"""Synthetic quantized models for benchmarks / compile checks.

Generates randomly packed int4 params directly (no calibration) — weight
values are irrelevant for throughput and compile validation.

Everything here is host-side numpy: device placement is the caller's job
(one batched ``jax.device_put`` of the whole tree beats per-leaf transfers
over a device tunnel by ~2 orders of magnitude).
"""

from __future__ import annotations

import ml_dtypes
import numpy as np

from autoawq_tpu.models.config import ModelConfig


def _np_dtype(dt):
    """Normalize a jnp/np/str dtype-like to a numpy dtype (incl. bfloat16)."""
    if dt is None:
        return np.dtype(np.float32)
    s = dt if isinstance(dt, str) else str(np.dtype(dt) if not hasattr(dt, "dtype") else dt.dtype)
    if "bfloat16" in s:
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(s)


def random_quantized_params(cfg: ModelConfig, seed: int = 0,
                            group_size: int = 128, fp_dtype=None,
                            zero_point: bool = True, fused: bool = False):
    """``fused=True`` emits qkv_proj / gate_up_proj directly (the shapes
    nn/fuse.fuse_model would produce) — for benchmark synthetics this skips
    the host-side unpack/concat/repack entirely, which dominates setup time
    at 13B scale (values are random either way)."""
    from autoawq_tpu.core.packing import (padded_in_features,
                                          padded_out_features)

    fp_dtype = _np_dtype(fp_dtype)
    rng = np.random.default_rng(seed)
    g = group_size

    def qlin(k, n):
        n_pad = padded_out_features(n)
        # K-pad to the kernel's even-group blocking (falcon-7b h=4544 at
        # g64 -> 4608); the dispatcher zero-pads x, values stay random
        # (perf synthetics — x-pad rows contribute nothing either way)
        kp = padded_in_features(k, g)
        p = {
            "qweight": rng.integers(-(2**31), 2**31, (kp // 2, n_pad // 4),
                                    dtype=np.int64).astype(np.int32),
            "scales": ((rng.random((kp // g, n_pad), dtype=np.float32) + 0.5)
                       * 0.01),
        }
        if zero_point:  # symmetric models omit qzeros (constant 8)
            p["qzeros"] = rng.integers(-(2**31), 2**31,
                                       (-(-(kp // g) // 2), n_pad // 4),
                                       dtype=np.int64).astype(np.int32)
        return p

    h, hd = cfg.hidden_size, cfg.head_dim_
    nh, nkv, inter = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.intermediate_size)

    def norm_p(n=None):
        n = h if n is None else n
        p = {"weight": np.ones((n,), fp_dtype)}
        if cfg.norm_kind == "ln":
            p["bias"] = np.zeros((n,), fp_dtype)
        return p

    def mla_attn():
        dq = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
        attn = {
            "kv_a_proj_with_mqa": qlin(
                h, cfg.kv_lora_rank + cfg.qk_rope_head_dim),
            "kv_a_layernorm": {
                "weight": np.ones((cfg.kv_lora_rank,), fp_dtype)},
            "kv_b_proj": qlin(cfg.kv_lora_rank,
                              nh * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
            "o_proj": qlin(nh * cfg.v_head_dim, h),
        }
        if cfg.q_lora_rank:
            attn["q_a_proj"] = qlin(h, cfg.q_lora_rank)
            attn["q_a_layernorm"] = {
                "weight": np.ones((cfg.q_lora_rank,), fp_dtype)}
            attn["q_b_proj"] = qlin(cfg.q_lora_rank, nh * dq)
        else:
            attn["q_proj"] = qlin(h, nh * dq)
        return attn
    params = {
        "embed_tokens": {
            "weight": (rng.standard_normal((cfg.vocab_size, h)) * 0.02)
            .astype(fp_dtype)
        },
        "norm": norm_p(),
        "lm_head": None if cfg.tie_word_embeddings else {
            "kernel": (rng.standard_normal((h, cfg.vocab_size)) * 0.02)
            .astype(fp_dtype)
        },
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        lp = {
            "input_layernorm": norm_p(),
            "self_attn": (
                mla_attn() if cfg.is_mla else
                {"qkv_proj": qlin(h, (nh + 2 * nkv) * hd),
                 "o_proj": qlin(nh * hd, h)}
                if fused else
                {"q_proj": qlin(h, nh * hd),
                 "k_proj": qlin(h, nkv * hd),
                 "v_proj": qlin(h, nkv * hd),
                 "o_proj": qlin(nh * hd, h)}
            ),
        }
        if not (cfg.parallel_residual and cfg.shared_input_norm):
            # falcon-7b's single shared input norm never reads a
            # post-attention norm; emitting one would only pad the
            # device_put tree vs a real converted checkpoint
            lp["post_attention_layernorm"] = norm_p()
        if cfg.qk_norm:
            lp["self_attn"]["q_norm"] = {"weight": np.ones((hd,), fp_dtype)}
            lp["self_attn"]["k_norm"] = {"weight": np.ones((hd,), fp_dtype)}
        if cfg.is_moe:
            ie = cfg.moe_intermediate_size or inter
            lp["mlp"] = {
                "gate": {"kernel": (
                    rng.standard_normal((h, cfg.num_experts)) * 0.02
                ).astype(fp_dtype)},
                "experts": [
                    {"gate_proj": qlin(h, ie), "up_proj": qlin(h, ie),
                     "down_proj": qlin(ie, h)}
                    for _ in range(cfg.num_experts)
                ],
            }
            if cfg.n_shared_experts:  # deepseek: always-on shared MLP
                si = ie * cfg.n_shared_experts
                lp["mlp"]["shared_experts"] = {
                    "gate_proj": qlin(h, si), "up_proj": qlin(h, si),
                    "down_proj": qlin(si, h)}
            if cfg.shared_expert_intermediate_size:  # qwen2-moe (gated)
                si = cfg.shared_expert_intermediate_size
                lp["mlp"]["shared_expert"] = {
                    "gate_proj": qlin(h, si), "up_proj": qlin(h, si),
                    "down_proj": qlin(si, h)}
                lp["mlp"]["shared_expert_gate"] = {"kernel": (
                    rng.standard_normal((h, 1)) * 0.02).astype(fp_dtype)}
        elif not cfg.gated_mlp:  # fc1 -> act -> fc2 (mpt/falcon-shaped
            # blocks; NOT opt/bloom — those also need embed_positions /
            # embed_ln / bias leaves this synthesizer does not emit)
            lp["mlp"] = {
                "fc1": qlin(h, inter),
                "fc2": qlin(inter, h),
            }
        elif fused:
            lp["mlp"] = {
                "gate_up_proj": qlin(h, 2 * inter),
                "down_proj": qlin(inter, h),
            }
        else:
            lp["mlp"] = {
                "gate_proj": qlin(h, inter),
                "up_proj": qlin(h, inter),
                "down_proj": qlin(inter, h),
            }
        params["layers"].append(lp)
    return params
