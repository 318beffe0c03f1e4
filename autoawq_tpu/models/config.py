"""Model architecture config, parsed from HF ``config.json``.

Unlike the reference (which mutates HuggingFace's model graph in place,
awq/models/base.py:634-685), this framework owns its model definitions — a
single functional decoder parameterized by this config covers the Llama
family and its variants via feature knobs (GQA, q/k-norm, norm offset,
softcaps, partial rotary, ...). Per-arch plugins (autoawq_tpu/models/*.py)
map an HF ``model_type`` onto these knobs.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    model_type: str = "llama"
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_hidden_layers: int = 22
    num_attention_heads: int = 32
    num_key_value_heads: int = 4
    head_dim: Optional[int] = None
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    hidden_act: str = "silu"
    # ---- architecture variant knobs ----
    qk_norm: bool = False  # qwen3-style per-head RMSNorm on q/k
    norm_offset: bool = False  # gemma-style (1 + weight) RMSNorm
    embed_scale: Optional[float] = None  # gemma: sqrt(hidden_size)
    logit_softcap: Optional[float] = None  # gemma2 final logits
    attn_softcap: Optional[float] = None  # gemma2 attention scores
    sliding_window: Optional[int] = None
    partial_rotary_factor: float = 1.0
    post_norms: bool = False  # gemma2: post-attn / post-ffn norms
    attn_scale: Optional[float] = None  # override 1/sqrt(head_dim)
    # ---- MoE knobs (mixtral / qwen3-moe) ----
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: Optional[int] = None
    shared_expert_intermediate_size: Optional[int] = None
    norm_topk_prob: bool = False

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        r = int(self.head_dim_ * self.partial_rotary_factor)
        return r - (r % 2)

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        known = set(cls.__dataclass_fields__)
        kwargs = {k: v for k, v in d.items() if k in known and v is not None}
        cfg = cls(**kwargs)
        # per-arch knob defaults, applied on top of raw HF fields
        mt = d.get("model_type", "llama")
        if mt == "qwen3":
            cfg = replace(cfg, qk_norm=True)
        elif mt == "qwen3_moe":
            cfg = replace(
                cfg,
                qk_norm=True,
                num_experts=d.get("num_experts", 0),
                num_experts_per_tok=d.get("num_experts_per_tok", 0),
                moe_intermediate_size=d.get("moe_intermediate_size"),
                norm_topk_prob=d.get("norm_topk_prob", False),
            )
        elif mt == "mixtral":
            cfg = replace(
                cfg,
                num_experts=d.get("num_local_experts", 8),
                num_experts_per_tok=d.get("num_experts_per_tok", 2),
            )
        elif mt == "gemma":
            cfg = replace(
                cfg,
                norm_offset=True,
                embed_scale=float(cfg.hidden_size) ** 0.5,
                hidden_act=d.get("hidden_activation", d.get("hidden_act", "gelu_pytorch_tanh")),
            )
        elif mt == "gemma2":
            cfg = replace(
                cfg,
                norm_offset=True,
                embed_scale=float(cfg.hidden_size) ** 0.5,
                post_norms=True,
                logit_softcap=d.get("final_logit_softcapping"),
                attn_softcap=d.get("attn_logit_softcapping"),
                hidden_act=d.get("hidden_activation", "gelu_pytorch_tanh"),
                attn_scale=(
                    d["query_pre_attn_scalar"] ** -0.5
                    if d.get("query_pre_attn_scalar")
                    else None
                ),
            )
        return cfg

    @classmethod
    def from_pretrained(cls, path: str) -> "ModelConfig":
        with open(os.path.join(path, "config.json")) as f:
            return cls.from_hf_dict(json.load(f))

    def to_hf_dict(self) -> Dict[str, Any]:
        d = {
            "model_type": self.model_type,
            "architectures": [ARCHITECTURES.get(self.model_type, "LlamaForCausalLM")],
            "vocab_size": self.vocab_size,
            "hidden_size": self.hidden_size,
            "intermediate_size": self.intermediate_size,
            "num_hidden_layers": self.num_hidden_layers,
            "num_attention_heads": self.num_attention_heads,
            "num_key_value_heads": self.num_key_value_heads,
            "head_dim": self.head_dim_,
            "max_position_embeddings": self.max_position_embeddings,
            "rms_norm_eps": self.rms_norm_eps,
            "rope_theta": self.rope_theta,
            "tie_word_embeddings": self.tie_word_embeddings,
            "attention_bias": self.attention_bias,
            "hidden_act": self.hidden_act,
            "torch_dtype": "float16",
        }
        if self.is_moe:
            if self.model_type == "mixtral":
                d["num_local_experts"] = self.num_experts
            else:
                d["num_experts"] = self.num_experts
                d["moe_intermediate_size"] = self.moe_intermediate_size
                d["norm_topk_prob"] = self.norm_topk_prob
            d["num_experts_per_tok"] = self.num_experts_per_tok
        if self.sliding_window:
            d["sliding_window"] = self.sliding_window
        return d


ARCHITECTURES = {
    "llama": "LlamaForCausalLM",
    "mistral": "MistralForCausalLM",
    "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM",
    "qwen3_moe": "Qwen3MoeForCausalLM",
    "mixtral": "MixtralForCausalLM",
    "gemma": "GemmaForCausalLM",
    "gemma2": "Gemma2ForCausalLM",
}
