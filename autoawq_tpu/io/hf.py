"""HF-checkpoint interop: state-dict <-> functional param pytree.

Reads fp16 HF checkpoints (safetensors) and AutoAWQ-quantized checkpoints
(qweight/qzeros/scales in the AWQ GEMM layout, awq/modules/linear/gemm.py),
converting to/from this framework's planar layout. Write path emits
checkpoints loadable by AutoAWQ / transformers / vLLM
(reference save path: awq/models/base.py:274-319).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.core import packing
from autoawq_tpu.models.config import ModelConfig

LN_KEYS = (
    "input_layernorm",
    "post_attention_layernorm",
    "pre_feedforward_layernorm",
    "post_feedforward_layernorm",
)


ATTN_CANDIDATES = ("q_proj", "k_proj", "v_proj", "qkv_proj", "o_proj")
MLP_CANDIDATES = ("gate_proj", "up_proj", "gate_up_proj", "down_proj")


def _attn_names(cfg: ModelConfig) -> List[str]:
    return list(ATTN_CANDIDATES)


def _mlp_names(cfg: ModelConfig) -> List[str]:
    return list(MLP_CANDIDATES)


def _expert_prefix(cfg: ModelConfig, i: int, e: int) -> str:
    if cfg.model_type == "mixtral":
        return f"model.layers.{i}.block_sparse_moe.experts.{e}."
    return f"model.layers.{i}.mlp.experts.{e}."


def _gate_key(cfg: ModelConfig, i: int) -> str:
    if cfg.model_type == "mixtral":
        return f"model.layers.{i}.block_sparse_moe.gate"
    return f"model.layers.{i}.mlp.gate"


# mixtral expert weights use w1/w3/w2 names for gate/up/down
_MIXTRAL_EXPERT = {"gate_proj": "w1", "up_proj": "w3", "down_proj": "w2"}


def _lin_from_sd(sd: Dict[str, np.ndarray], prefix: str) -> Optional[Dict[str, Any]]:
    """Build a LIN param dict from HF tensors at ``prefix`` (no trailing dot).

    Handles both fp (``.weight`` [N, K] -> kernel [K, N]) and AutoAWQ
    quantized (``.qweight/.qzeros/.scales`` -> planar layout).
    """
    if prefix + ".qweight" in sd:
        qw, qz, s = packing.awq_to_planar(
            sd[prefix + ".qweight"], sd[prefix + ".qzeros"], sd[prefix + ".scales"]
        )
        p = {"qweight": qw, "qzeros": qz, "scales": s}
        if prefix + ".bias" in sd:
            p["bias"] = np.asarray(sd[prefix + ".bias"])
        return p
    if prefix + ".weight" in sd:
        p = {"kernel": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)}
        if prefix + ".bias" in sd:
            p["bias"] = np.asarray(sd[prefix + ".bias"])
        return p
    return None


def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, np.ndarray]) -> Dict:
    """HF (or AutoAWQ-quantized HF) state dict -> functional param pytree."""
    params: Dict[str, Any] = {
        "embed_tokens": {"weight": np.asarray(sd["model.embed_tokens.weight"])},
        "norm": {"weight": np.asarray(sd["model.norm.weight"])},
        "layers": [],
    }
    params["lm_head"] = (
        _lin_from_sd(sd, "lm_head") if "lm_head.weight" in sd or "lm_head.qweight" in sd else None
    )
    for i in range(cfg.num_hidden_layers):
        lp: Dict[str, Any] = {}
        base = f"model.layers.{i}."
        for ln in LN_KEYS:
            if base + ln + ".weight" in sd:
                lp[ln] = {"weight": np.asarray(sd[base + ln + ".weight"])}
        attn: Dict[str, Any] = {}
        for name in _attn_names(cfg):
            lin = _lin_from_sd(sd, base + "self_attn." + name)
            if lin is not None:
                attn[name] = lin
        if cfg.qk_norm:
            attn["q_norm"] = {"weight": np.asarray(sd[base + "self_attn.q_norm.weight"])}
            attn["k_norm"] = {"weight": np.asarray(sd[base + "self_attn.k_norm.weight"])}
        lp["self_attn"] = attn
        if cfg.is_moe:
            mlp: Dict[str, Any] = {"gate": _lin_from_sd(sd, _gate_key(cfg, i))}
            experts = []
            for e in range(cfg.num_experts):
                ep = {}
                for name in _mlp_names(cfg):
                    if cfg.model_type == "mixtral":
                        if name not in _MIXTRAL_EXPERT:
                            continue
                        hf_name = _MIXTRAL_EXPERT[name]
                    else:
                        hf_name = name
                    lin = _lin_from_sd(sd, _expert_prefix(cfg, i, e) + hf_name)
                    if lin is not None:
                        ep[name] = lin
                experts.append(ep)
            mlp["experts"] = experts
            lp["mlp"] = mlp
        else:
            lp["mlp"] = {
                name: lin
                for name in _mlp_names(cfg)
                if (lin := _lin_from_sd(sd, base + "mlp." + name)) is not None
            }
        params["layers"].append(lp)
    return params


def _lin_to_sd(sd: Dict[str, np.ndarray], prefix: str, p: Dict[str, Any],
               dtype=np.float16):
    if p is None:
        return
    if "qweight" in p:
        n = _lin_out_features(p)
        qw, qz, s = packing.planar_to_awq(
            np.asarray(p["qweight"]), np.asarray(p["qzeros"]),
            np.asarray(p["scales"]), n,
        )
        sd[prefix + ".qweight"] = qw
        sd[prefix + ".qzeros"] = qz
        sd[prefix + ".scales"] = s
    else:
        sd[prefix + ".weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"]).T.astype(dtype)
        )
    if p.get("bias") is not None:
        sd[prefix + ".bias"] = np.asarray(p["bias"]).astype(dtype)


def _lin_out_features(p: Dict[str, Any]) -> int:
    """Logical out_features of a quantized LIN (strip lane padding)."""
    n = int(np.asarray(p["out_features"])) if "out_features" in p else None
    if n is not None:
        return n
    if p.get("bias") is not None:
        return p["bias"].shape[0]
    raise ValueError("quantized linear missing out_features metadata")


def state_dict_from_params(cfg: ModelConfig, params: Dict,
                           out_features_map: Dict[str, int],
                           dtype=np.float16) -> Dict[str, np.ndarray]:
    """Param pytree -> HF-layout state dict (AutoAWQ format for quant LINs).

    ``out_features_map``: role name (e.g. "self_attn.q_proj") -> logical N,
    from :func:`role_out_features`.
    """
    sd: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed_tokens"]["weight"]).astype(dtype),
        "model.norm.weight": np.asarray(params["norm"]["weight"]).astype(dtype),
    }

    def put(prefix: str, p: Dict[str, Any], role: str):
        if p is None:
            return
        if "qweight" in p:
            n = out_features_map[role]
            qw, qz, s = packing.planar_to_awq(
                np.asarray(p["qweight"]), np.asarray(p["qzeros"]),
                np.asarray(p["scales"]), n,
            )
            sd[prefix + ".qweight"] = qw
            sd[prefix + ".qzeros"] = qz
            sd[prefix + ".scales"] = s
        else:
            sd[prefix + ".weight"] = np.ascontiguousarray(
                np.asarray(p["kernel"]).T.astype(dtype)
            )
        if p.get("bias") is not None:
            sd[prefix + ".bias"] = np.asarray(p["bias"]).astype(dtype)

    if params.get("lm_head") is not None:
        put("lm_head", params["lm_head"], "lm_head")
    for i, lp in enumerate(params["layers"]):
        base = f"model.layers.{i}."
        for ln in LN_KEYS:
            if ln in lp:
                sd[base + ln + ".weight"] = np.asarray(lp[ln]["weight"]).astype(dtype)
        for name in _attn_names(cfg):
            if name in lp["self_attn"]:
                put(base + "self_attn." + name, lp["self_attn"][name],
                    "self_attn." + name)
        if cfg.qk_norm:
            sd[base + "self_attn.q_norm.weight"] = np.asarray(
                lp["self_attn"]["q_norm"]["weight"]).astype(dtype)
            sd[base + "self_attn.k_norm.weight"] = np.asarray(
                lp["self_attn"]["k_norm"]["weight"]).astype(dtype)
        if cfg.is_moe:
            put(_gate_key(cfg, i), lp["mlp"]["gate"], "mlp.gate")
            for e, ep in enumerate(lp["mlp"]["experts"]):
                for name in _mlp_names(cfg):
                    if name not in ep:
                        continue
                    if cfg.model_type == "mixtral":
                        if name not in _MIXTRAL_EXPERT:
                            continue
                        hf_name = _MIXTRAL_EXPERT[name]
                    else:
                        hf_name = name
                    put(_expert_prefix(cfg, i, e) + hf_name, ep[name],
                        "mlp.experts." + name)
        else:
            for name in _mlp_names(cfg):
                if name in lp["mlp"]:
                    put(base + "mlp." + name, lp["mlp"][name], "mlp." + name)
    return sd


def role_out_features(cfg: ModelConfig) -> Dict[str, int]:
    """Logical out_features by layer role (needed to strip lane padding)."""
    hd, nh, nkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads
    inter = cfg.moe_intermediate_size or cfg.intermediate_size
    return {
        "self_attn.qkv_proj": (nh + 2 * nkv) * hd,
        "mlp.gate_up_proj": 2 * cfg.intermediate_size,
        "self_attn.q_proj": nh * hd,
        "self_attn.k_proj": nkv * hd,
        "self_attn.v_proj": nkv * hd,
        "self_attn.o_proj": cfg.hidden_size,
        "mlp.gate_proj": cfg.intermediate_size,
        "mlp.up_proj": cfg.intermediate_size,
        "mlp.down_proj": cfg.hidden_size,
        "mlp.gate": cfg.num_experts,
        "mlp.experts.gate_proj": inter,
        "mlp.experts.up_proj": inter,
        "mlp.experts.down_proj": cfg.hidden_size,
        "lm_head": cfg.vocab_size,
    }


def load_state_dict_from_dir(path: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors shards in an HF checkpoint directory."""
    from safetensors.numpy import load_file

    sd: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    for f in files:
        sd.update(load_file(os.path.join(path, f)))
    return sd


def init_random_params(cfg: ModelConfig, seed: int = 0,
                       dtype=np.float32, scale: float = 0.05) -> Dict:
    """Random fp param pytree for tests and synthetic benchmarks."""
    rng = np.random.default_rng(seed)

    def lin(k, n, bias=False):
        p = {"kernel": (rng.standard_normal((k, n)) * scale).astype(dtype)}
        if bias:
            p["bias"] = np.zeros((n,), dtype=dtype)
        return p

    h, hd = cfg.hidden_size, cfg.head_dim_
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    params: Dict[str, Any] = {
        "embed_tokens": {
            "weight": (rng.standard_normal((cfg.vocab_size, h)) * scale).astype(dtype)
        },
        "norm": {"weight": np.ones((h,), dtype=dtype)},
        "lm_head": None if cfg.tie_word_embeddings else lin(h, cfg.vocab_size),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        attn = {
            "q_proj": lin(h, nh * hd, cfg.attention_bias),
            "k_proj": lin(h, nkv * hd, cfg.attention_bias),
            "v_proj": lin(h, nkv * hd, cfg.attention_bias),
            "o_proj": lin(nh * hd, h),
        }
        if cfg.qk_norm:
            attn["q_norm"] = {"weight": np.ones((hd,), dtype=dtype)}
            attn["k_norm"] = {"weight": np.ones((hd,), dtype=dtype)}
        lp: Dict[str, Any] = {
            "input_layernorm": {"weight": np.ones((h,), dtype=dtype)},
            "post_attention_layernorm": {"weight": np.ones((h,), dtype=dtype)},
            "self_attn": attn,
        }
        if cfg.post_norms:
            lp["pre_feedforward_layernorm"] = {"weight": np.ones((h,), dtype=dtype)}
            lp["post_feedforward_layernorm"] = {"weight": np.ones((h,), dtype=dtype)}
        if cfg.is_moe:
            inter = cfg.moe_intermediate_size or cfg.intermediate_size
            lp["mlp"] = {
                "gate": lin(h, cfg.num_experts),
                "experts": [
                    {
                        "gate_proj": lin(h, inter),
                        "up_proj": lin(h, inter),
                        "down_proj": lin(inter, h),
                    }
                    for _ in range(cfg.num_experts)
                ],
            }
        else:
            lp["mlp"] = {
                "gate_proj": lin(h, cfg.intermediate_size, cfg.mlp_bias),
                "up_proj": lin(h, cfg.intermediate_size, cfg.mlp_bias),
                "down_proj": lin(cfg.intermediate_size, h, cfg.mlp_bias),
            }
        params["layers"].append(lp)
    return params
