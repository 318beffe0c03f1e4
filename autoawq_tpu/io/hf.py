"""HF-checkpoint interop: state-dict <-> functional param pytree.

Reads fp16 HF checkpoints (safetensors) and AutoAWQ-quantized checkpoints
(qweight/qzeros/scales in the AWQ GEMM layout, awq/modules/linear/gemm.py),
converting to/from this framework's planar layout. Write path emits
checkpoints loadable by AutoAWQ / transformers / vLLM
(reference save path: awq/models/base.py:274-319).

Unlike the reference — which mutates HuggingFace's module tree in place and
therefore inherits each architecture's naming for free — this framework owns
its model definition, so the per-architecture naming lives here in
``ArchLayout`` tables (one per reference plugin, awq/models/*.py). Fused
query_key_value projections whose HF column order interleaves heads
(bloom/gpt_neox: [h, 3, d]; falcon: kv-groups) are permuted at load into the
plain q|k|v concatenation the runtime slices, and permuted back at save —
per-output-column int4 quantization commutes with column permutation, so
saved checkpoints remain bit-compatible with AutoAWQ's layout.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

from autoawq_tpu.core import packing
from autoawq_tpu.models.config import ModelConfig


# --------------------------------------------------------------------------
# Arch layout tables
# --------------------------------------------------------------------------

def _perm_head_interleaved(cfg: ModelConfig) -> np.ndarray:
    """bloom / gpt_neox fused qkv: HF columns [h, (q, k, v), d] -> q|k|v."""
    nh, hd = cfg.num_attention_heads, cfg.head_dim_
    idx = np.arange(nh * 3 * hd).reshape(nh, 3, hd)
    return np.concatenate(
        [idx[:, 0].ravel(), idx[:, 1].ravel(), idx[:, 2].ravel()]
    )


def _perm_falcon(cfg: ModelConfig) -> Optional[np.ndarray]:
    """falcon fused qkv: new arch groups [nkv, (q*per + k + v), d]."""
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    if nkv == 1:  # falcon-7b multi-query: already [q..., k, v]
        return None
    per = nh // nkv
    idx = np.arange(nkv * (per + 2) * hd).reshape(nkv, per + 2, hd)
    return np.concatenate(
        [idx[:, :per].ravel(), idx[:, per].ravel(), idx[:, per + 1].ravel()]
    )


@dataclass(frozen=True)
class ArchLayout:
    layer_prefix: str  # format string with {i}
    embed: str
    final_norm: str
    lm_head: Optional[str] = "lm_head"  # None => always tied
    pos_embed: Optional[str] = None  # learned-position table
    embed_ln: Optional[str] = None
    # internal name -> HF name (relative to the layer prefix)
    norms: Dict[str, str] = field(default_factory=dict)
    linears: Dict[str, str] = field(default_factory=dict)
    # permutation builder for a fused qkv projection's output columns
    qkv_perm: Optional[Callable[[ModelConfig], Optional[np.ndarray]]] = None


LLAMA_LAYOUT = ArchLayout(
    layer_prefix="model.layers.{i}.",
    embed="model.embed_tokens",
    final_norm="model.norm",
    norms={
        "input_layernorm": "input_layernorm",
        "post_attention_layernorm": "post_attention_layernorm",
        "pre_feedforward_layernorm": "pre_feedforward_layernorm",
        "post_feedforward_layernorm": "post_feedforward_layernorm",
        "self_attn.q_norm": "self_attn.q_norm",
        "self_attn.k_norm": "self_attn.k_norm",
    },
    linears={
        "self_attn.q_proj": "self_attn.q_proj",
        "self_attn.k_proj": "self_attn.k_proj",
        "self_attn.v_proj": "self_attn.v_proj",
        "self_attn.qkv_proj": "self_attn.qkv_proj",  # phi3-style fused
        "self_attn.o_proj": "self_attn.o_proj",
        "mlp.gate_proj": "mlp.gate_proj",
        "mlp.up_proj": "mlp.up_proj",
        "mlp.gate_up_proj": "mlp.gate_up_proj",
        "mlp.down_proj": "mlp.down_proj",
    },
)

DEEPSEEK_LAYOUT = ArchLayout(
    layer_prefix="model.layers.{i}.",
    embed="model.embed_tokens",
    final_norm="model.norm",
    norms={
        "input_layernorm": "input_layernorm",
        "post_attention_layernorm": "post_attention_layernorm",
        "self_attn.q_a_layernorm": "self_attn.q_a_layernorm",
        "self_attn.kv_a_layernorm": "self_attn.kv_a_layernorm",
    },
    linears={
        "self_attn.q_proj": "self_attn.q_proj",
        "self_attn.q_a_proj": "self_attn.q_a_proj",
        "self_attn.q_b_proj": "self_attn.q_b_proj",
        "self_attn.kv_a_proj_with_mqa": "self_attn.kv_a_proj_with_mqa",
        "self_attn.kv_b_proj": "self_attn.kv_b_proj",
        "self_attn.o_proj": "self_attn.o_proj",
        "mlp.gate_proj": "mlp.gate_proj",
        "mlp.up_proj": "mlp.up_proj",
        "mlp.down_proj": "mlp.down_proj",
    },
)

ARCH_LAYOUTS: Dict[str, ArchLayout] = {
    "deepseek_v2": DEEPSEEK_LAYOUT,
    "deepseek_v3": DEEPSEEK_LAYOUT,
    "minicpm3": DEEPSEEK_LAYOUT,
    "opt": ArchLayout(
        layer_prefix="model.decoder.layers.{i}.",
        embed="model.decoder.embed_tokens",
        pos_embed="model.decoder.embed_positions",
        final_norm="model.decoder.final_layer_norm",
        norms={
            "input_layernorm": "self_attn_layer_norm",
            "post_attention_layernorm": "final_layer_norm",
        },
        linears={
            "self_attn.q_proj": "self_attn.q_proj",
            "self_attn.k_proj": "self_attn.k_proj",
            "self_attn.v_proj": "self_attn.v_proj",
            "self_attn.o_proj": "self_attn.out_proj",
            "mlp.fc1": "fc1",
            "mlp.fc2": "fc2",
        },
    ),
    "bloom": ArchLayout(
        layer_prefix="transformer.h.{i}.",
        embed="transformer.word_embeddings",
        embed_ln="transformer.word_embeddings_layernorm",
        final_norm="transformer.ln_f",
        norms={
            "input_layernorm": "input_layernorm",
            "post_attention_layernorm": "post_attention_layernorm",
        },
        linears={
            "self_attn.qkv_proj": "self_attention.query_key_value",
            "self_attn.o_proj": "self_attention.dense",
            "mlp.fc1": "mlp.dense_h_to_4h",
            "mlp.fc2": "mlp.dense_4h_to_h",
        },
        qkv_perm=_perm_head_interleaved,
    ),
    "gptj": ArchLayout(
        layer_prefix="transformer.h.{i}.",
        embed="transformer.wte",
        final_norm="transformer.ln_f",
        norms={"input_layernorm": "ln_1"},
        linears={
            "self_attn.q_proj": "attn.q_proj",
            "self_attn.k_proj": "attn.k_proj",
            "self_attn.v_proj": "attn.v_proj",
            "self_attn.o_proj": "attn.out_proj",
            "mlp.fc1": "mlp.fc_in",
            "mlp.fc2": "mlp.fc_out",
        },
    ),
    "gpt_neox": ArchLayout(
        layer_prefix="gpt_neox.layers.{i}.",
        embed="gpt_neox.embed_in",
        final_norm="gpt_neox.final_layer_norm",
        lm_head="embed_out",
        norms={
            "input_layernorm": "input_layernorm",
            "post_attention_layernorm": "post_attention_layernorm",
        },
        linears={
            "self_attn.qkv_proj": "attention.query_key_value",
            "self_attn.o_proj": "attention.dense",
            "mlp.fc1": "mlp.dense_h_to_4h",
            "mlp.fc2": "mlp.dense_4h_to_h",
        },
        qkv_perm=_perm_head_interleaved,
    ),
    "gpt_bigcode": ArchLayout(
        layer_prefix="transformer.h.{i}.",
        embed="transformer.wte",
        pos_embed="transformer.wpe",
        final_norm="transformer.ln_f",
        norms={
            "input_layernorm": "ln_1",
            "post_attention_layernorm": "ln_2",
        },
        linears={
            "self_attn.qkv_proj": "attn.c_attn",
            "self_attn.o_proj": "attn.c_proj",
            "mlp.fc1": "mlp.c_fc",
            "mlp.fc2": "mlp.c_proj",
        },
    ),
    "starcoder2": ArchLayout(
        layer_prefix="model.layers.{i}.",
        embed="model.embed_tokens",
        final_norm="model.norm",
        norms={
            "input_layernorm": "input_layernorm",
            "post_attention_layernorm": "post_attention_layernorm",
        },
        linears={
            "self_attn.q_proj": "self_attn.q_proj",
            "self_attn.k_proj": "self_attn.k_proj",
            "self_attn.v_proj": "self_attn.v_proj",
            "self_attn.o_proj": "self_attn.o_proj",
            "mlp.fc1": "mlp.c_fc",
            "mlp.fc2": "mlp.c_proj",
        },
    ),
    "mpt": ArchLayout(
        layer_prefix="transformer.blocks.{i}.",
        embed="transformer.wte",
        final_norm="transformer.norm_f",
        norms={
            "input_layernorm": "norm_1",
            "post_attention_layernorm": "norm_2",
        },
        linears={
            "self_attn.qkv_proj": "attn.Wqkv",
            "self_attn.o_proj": "attn.out_proj",
            "mlp.fc1": "ffn.up_proj",
            "mlp.fc2": "ffn.down_proj",
        },
    ),
    "falcon": ArchLayout(
        layer_prefix="transformer.h.{i}.",
        embed="transformer.word_embeddings",
        final_norm="transformer.ln_f",
        norms={
            # falcon-7b: single input_layernorm; 40b+: ln_attn / ln_mlp
            "input_layernorm": "input_layernorm",
            "post_attention_layernorm": "ln_mlp",
        },
        linears={
            "self_attn.qkv_proj": "self_attention.query_key_value",
            "self_attn.o_proj": "self_attention.dense",
            "mlp.fc1": "mlp.dense_h_to_4h",
            "mlp.fc2": "mlp.dense_4h_to_h",
        },
        qkv_perm=_perm_falcon,
    ),
    "cohere": ArchLayout(
        layer_prefix="model.layers.{i}.",
        embed="model.embed_tokens",
        final_norm="model.norm",
        norms={"input_layernorm": "input_layernorm"},
        linears={
            "self_attn.q_proj": "self_attn.q_proj",
            "self_attn.k_proj": "self_attn.k_proj",
            "self_attn.v_proj": "self_attn.v_proj",
            "self_attn.o_proj": "self_attn.o_proj",
            "mlp.gate_proj": "mlp.gate_proj",
            "mlp.up_proj": "mlp.up_proj",
            "mlp.down_proj": "mlp.down_proj",
        },
    ),
    "baichuan": ArchLayout(
        # reference awq/models/baichuan.py:43 — fused W_pack is a plain
        # q|k|v concatenation (MHA), so no column permutation is needed
        layer_prefix="model.layers.{i}.",
        embed="model.embed_tokens",
        final_norm="model.norm",
        norms={
            "input_layernorm": "input_layernorm",
            "post_attention_layernorm": "post_attention_layernorm",
        },
        linears={
            "self_attn.qkv_proj": "self_attn.W_pack",
            "self_attn.o_proj": "self_attn.o_proj",
            "mlp.gate_proj": "mlp.gate_proj",
            "mlp.up_proj": "mlp.up_proj",
            "mlp.down_proj": "mlp.down_proj",
        },
    ),
    "internlm2": ArchLayout(
        # reference awq/models/internlm2.py:34-70. wqkv's HF column order
        # groups [nkv, (per q-heads, k, v), hd] — the falcon permutation —
        # and is rearranged into plain q|k|v at load (inverted at save, so
        # quantized checkpoints stay bit-compatible with AutoAWQ's).
        layer_prefix="model.layers.{i}.",
        embed="model.tok_embeddings",
        final_norm="model.norm",
        lm_head="output",
        norms={
            "input_layernorm": "attention_norm",
            "post_attention_layernorm": "ffn_norm",
        },
        linears={
            "self_attn.qkv_proj": "attention.wqkv",
            "self_attn.o_proj": "attention.wo",
            "mlp.gate_proj": "feed_forward.w1",
            "mlp.up_proj": "feed_forward.w3",
            "mlp.down_proj": "feed_forward.w2",
        },
        qkv_perm=_perm_falcon,
    ),
    "exaone": ArchLayout(
        # reference awq/models/exaone.py:74-83 — llama math under GPT-style
        # names (c_fc_0=gate, c_fc_1=up)
        layer_prefix="transformer.h.{i}.",
        embed="transformer.wte",
        final_norm="transformer.ln_f",
        norms={
            "input_layernorm": "ln_1",
            "post_attention_layernorm": "ln_2",
        },
        linears={
            "self_attn.q_proj": "attn.attention.q_proj",
            "self_attn.k_proj": "attn.attention.k_proj",
            "self_attn.v_proj": "attn.attention.v_proj",
            "self_attn.o_proj": "attn.attention.out_proj",
            "mlp.gate_proj": "mlp.c_fc_0",
            "mlp.up_proj": "mlp.c_fc_1",
            "mlp.down_proj": "mlp.c_proj",
        },
    ),
    "qwen": ArchLayout(
        layer_prefix="transformer.h.{i}.",
        embed="transformer.wte",
        final_norm="transformer.ln_f",
        norms={
            "input_layernorm": "ln_1",
            "post_attention_layernorm": "ln_2",
        },
        linears={
            "self_attn.qkv_proj": "attn.c_attn",
            "self_attn.o_proj": "attn.c_proj",
            "mlp.gate_proj": "mlp.w2",
            "mlp.up_proj": "mlp.w1",
            "mlp.down_proj": "mlp.c_proj",
        },
    ),
}


def get_layout(model_type: str) -> ArchLayout:
    return ARCH_LAYOUTS.get(model_type, LLAMA_LAYOUT)


def _falcon_norm_fix(cfg: ModelConfig, internal: str, hf: str) -> str:
    """falcon 40b+ names the attention norm ln_attn instead of
    input_layernorm (awq/models/falcon.py:44-82)."""
    if (cfg.model_type == "falcon" and not cfg.shared_input_norm
            and internal == "input_layernorm"):
        return "ln_attn"
    return hf


# --------------------------------------------------------------------------
# LIN <-> state-dict tensors (with optional output-column permutation)
# --------------------------------------------------------------------------

def _lin_from_sd(sd: Dict[str, np.ndarray], prefix: str,
                 perm: Optional[np.ndarray] = None) -> Optional[Dict[str, Any]]:
    """Build a LIN param dict from HF tensors at ``prefix`` (no trailing dot).

    Handles both fp (``.weight`` [N, K] -> kernel [K, N]) and AutoAWQ
    quantized (``.qweight/.qzeros/.scales`` -> planar layout). ``perm``
    reorders output columns (ours[:, j] = hf[:, perm[j]]).
    """
    if prefix + ".qweight" in sd:
        q4 = packing.unpack_awq(np.asarray(sd[prefix + ".qweight"]))
        sc = np.asarray(sd[prefix + ".scales"]).astype(np.float32)
        z4 = packing.unpack_awq(np.asarray(sd[prefix + ".qzeros"]),
                                sc.shape[1])
        q4 = q4[:, : sc.shape[1]]
        if perm is not None:
            q4, z4, sc = q4[:, perm], z4[:, perm], sc[:, perm]
        sym = not (z4 != 8).any()  # all-8 == symmetric: zeros-free path
        # K not a multiple of 2*group (falcon-7b h=4544 @ g64): zero-pad
        # K so the fused kernel's even-group blocking applies (exact —
        # see core/packing.pad_k_nibbles)
        q4, sc, z4 = packing.pad_k_nibbles(
            q4, sc, None if sym else z4, q4.shape[0] // sc.shape[0])
        p = {
            "qweight": packing.pack_planar(q4),
            "scales": packing.pad_scales_planar(sc),
        }
        if not sym:
            p["qzeros"] = packing.pack_planar(z4)
        if prefix + ".bias" in sd:
            b = np.asarray(sd[prefix + ".bias"])
            p["bias"] = b[perm] if perm is not None else b
        return p
    if prefix + ".weight" in sd:
        w = np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)
        if perm is not None:
            w = w[:, perm]
        p = {"kernel": w}
        if prefix + ".bias" in sd:
            b = np.asarray(sd[prefix + ".bias"])
            p["bias"] = b[perm] if perm is not None else b
        return p
    return None


def _lin_to_sd(sd: Dict[str, np.ndarray], prefix: str, p: Dict[str, Any],
               out_features: int, perm: Optional[np.ndarray] = None,
               dtype=np.float16, in_features: Optional[int] = None):
    """Write a LIN back in HF/AutoAWQ layout (inverting ``perm``).
    ``in_features`` strips the kernel's K padding (pad_k_nibbles) so the
    written AutoAWQ tensors carry the model's logical K."""
    if p is None:
        return
    inv = None
    if perm is not None:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
    if "qweight" in p:
        qw = np.asarray(p["qweight"])
        scales = np.asarray(p["scales"])
        g = scales.shape[0]
        rows = None
        if in_features is not None and 2 * qw.shape[0] != in_features:
            rows = in_features
            g = in_features // (2 * qw.shape[0] // scales.shape[0])
        q4 = packing.unpack_planar(qw, out_features, rows=rows)
        if "qzeros" in p:
            z4 = packing.unpack_planar(np.asarray(p["qzeros"]), out_features,
                                       rows=g)
        else:  # symmetric: regenerate the constant-8 zeros AutoAWQ expects
            z4 = np.full((g, out_features), 8, np.int32)
        sc = scales[:g, :out_features]
        if inv is not None:
            q4, z4, sc = q4[:, inv], z4[:, inv], sc[:, inv]
        sd[prefix + ".qweight"] = packing.pack_awq(q4)
        sd[prefix + ".qzeros"] = packing.pack_awq(z4)
        sd[prefix + ".scales"] = sc.astype(np.float16)
    else:
        w = np.asarray(p["kernel"])
        if inv is not None:
            w = w[:, inv]
        sd[prefix + ".weight"] = np.ascontiguousarray(w.T.astype(dtype))
    if p.get("bias") is not None:
        b = np.asarray(p["bias"])
        if inv is not None:
            b = b[inv]
        sd[prefix + ".bias"] = b.astype(dtype)


def _norm_from_sd(sd: Dict[str, np.ndarray], prefix: str) -> Optional[Dict]:
    if prefix + ".weight" not in sd:
        return None
    p = {"weight": np.asarray(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = np.asarray(sd[prefix + ".bias"])
    return p


def _norm_to_sd(sd: Dict[str, np.ndarray], prefix: str, p: Dict, dtype):
    sd[prefix + ".weight"] = np.asarray(p["weight"]).astype(dtype)
    if p.get("bias") is not None:
        sd[prefix + ".bias"] = np.asarray(p["bias"]).astype(dtype)


# --------------------------------------------------------------------------
# MoE helpers (mixtral / qwen3_moe / deepseek) — llama-layout models only
# --------------------------------------------------------------------------

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
_MLP_EXPERT_NAMES = ("gate_proj", "up_proj", "down_proj")


def _expert_hf_name(cfg: ModelConfig, name: str) -> Optional[str]:
    if cfg.model_type == "mixtral":
        return _MIXTRAL_EXPERT.get(name)
    return name


# --------------------------------------------------------------------------
# state dict -> params
# --------------------------------------------------------------------------

def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, np.ndarray]) -> Dict:
    """HF (or AutoAWQ-quantized HF) state dict -> functional param pytree."""
    layout = get_layout(cfg.model_type)
    params: Dict[str, Any] = {
        "embed_tokens": {"weight": np.asarray(sd[layout.embed + ".weight"])},
        "norm": _norm_from_sd(sd, layout.final_norm),
        "layers": [],
    }
    if layout.pos_embed:
        params["embed_positions"] = {
            "weight": np.asarray(sd[layout.pos_embed + ".weight"])
        }
    if layout.embed_ln:
        params["embed_ln"] = _norm_from_sd(sd, layout.embed_ln)
    lm_key = layout.lm_head
    params["lm_head"] = (
        _lin_from_sd(sd, lm_key)
        if lm_key and (lm_key + ".weight" in sd or lm_key + ".qweight" in sd)
        else None
    )
    qkv_perm = layout.qkv_perm(cfg) if layout.qkv_perm else None

    for i in range(cfg.num_hidden_layers):
        base = layout.layer_prefix.format(i=i)
        lp: Dict[str, Any] = {}
        for internal, hf in layout.norms.items():
            hf = _falcon_norm_fix(cfg, internal, hf)
            p = _norm_from_sd(sd, base + hf)
            if p is not None:
                _set_nested(lp, internal, p)
        attn: Dict[str, Any] = lp.setdefault("self_attn", {})
        mlp_p: Dict[str, Any] = {}
        for internal, hf in layout.linears.items():
            perm = qkv_perm if internal == "self_attn.qkv_proj" else None
            lin = _lin_from_sd(sd, base + hf, perm)
            if lin is None:
                continue
            _set_nested(lp, internal, lin)
        # structural MoE detection: deepseek keeps the first k layers dense
        if cfg.is_moe and _gate_key(cfg, i) + ".weight" in sd:
            mlp_p = {"gate": _lin_from_sd(sd, _gate_key(cfg, i))}
            bias_key = _gate_key(cfg, i) + ".e_score_correction_bias"
            if bias_key in sd:  # deepseek_v3 router bias buffer
                mlp_p["gate"]["e_score_correction_bias"] = np.asarray(sd[bias_key])
            experts = []
            for e in range(cfg.num_experts):
                ep = {}
                for name in _MLP_EXPERT_NAMES:
                    hf_name = _expert_hf_name(cfg, name)
                    if hf_name is None:
                        continue
                    lin = _lin_from_sd(sd, _expert_prefix(cfg, i, e) + hf_name)
                    if lin is not None:
                        ep[name] = lin
                experts.append(ep)
            mlp_p["experts"] = experts
            shared = {
                name: lin for name in _MLP_EXPERT_NAMES
                if (lin := _lin_from_sd(
                    sd, base + "mlp.shared_experts." + name)) is not None
            }
            if shared:
                mlp_p["shared_experts"] = shared
            lp["mlp"] = mlp_p
        params["layers"].append(lp)
    return params


def _set_nested(tree: Dict, path: str, value):
    parts = path.split(".")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def _get_nested(tree: Dict, path: str):
    for p in path.split("."):
        if not isinstance(tree, dict) or p not in tree:
            return None
        tree = tree[p]
    return tree


# --------------------------------------------------------------------------
# params -> state dict
# --------------------------------------------------------------------------

def state_dict_from_params(cfg: ModelConfig, params: Dict,
                           out_features_map: Dict[str, int],
                           dtype=np.float16) -> Dict[str, np.ndarray]:
    """Param pytree -> HF-layout state dict (AutoAWQ format for quant LINs).

    ``out_features_map``: role name (e.g. "self_attn.q_proj") -> logical N,
    from :func:`role_out_features`.
    """
    layout = get_layout(cfg.model_type)
    sd: Dict[str, np.ndarray] = {
        layout.embed + ".weight": np.asarray(
            params["embed_tokens"]["weight"]).astype(dtype),
    }
    _norm_to_sd(sd, layout.final_norm, params["norm"], dtype)
    if layout.pos_embed and "embed_positions" in params:
        sd[layout.pos_embed + ".weight"] = np.asarray(
            params["embed_positions"]["weight"]).astype(dtype)
    if layout.embed_ln and "embed_ln" in params:
        _norm_to_sd(sd, layout.embed_ln, params["embed_ln"], dtype)
    in_map = role_in_features(cfg)
    if params.get("lm_head") is not None and layout.lm_head:
        _lin_to_sd(sd, layout.lm_head, params["lm_head"],
                   out_features_map["lm_head"], dtype=dtype,
                   in_features=in_map["lm_head"])
    qkv_perm = layout.qkv_perm(cfg) if layout.qkv_perm else None

    for i, lp in enumerate(params["layers"]):
        base = layout.layer_prefix.format(i=i)
        for internal, hf in layout.norms.items():
            hf = _falcon_norm_fix(cfg, internal, hf)
            p = _get_nested(lp, internal)
            if p is not None:
                _norm_to_sd(sd, base + hf, p, dtype)
        for internal, hf in layout.linears.items():
            p = _get_nested(lp, internal)
            if p is None:
                continue
            perm = qkv_perm if internal == "self_attn.qkv_proj" else None
            _lin_to_sd(sd, base + hf, p, out_features_map[internal], perm,
                       dtype, in_features=in_map.get(internal))
        if cfg.is_moe and "experts" in lp.get("mlp", {}):
            gate = dict(lp["mlp"]["gate"])
            bias = gate.pop("e_score_correction_bias", None)
            _lin_to_sd(sd, _gate_key(cfg, i), gate,
                       out_features_map["mlp.gate"], dtype=dtype,
                       in_features=in_map["mlp.gate"])
            if bias is not None:
                sd[_gate_key(cfg, i) + ".e_score_correction_bias"] = (
                    np.asarray(bias).astype(np.float32))
            for e, ep in enumerate(lp["mlp"]["experts"]):
                for name in _MLP_EXPERT_NAMES:
                    if name not in ep:
                        continue
                    hf_name = _expert_hf_name(cfg, name)
                    _lin_to_sd(sd, _expert_prefix(cfg, i, e) + hf_name,
                               ep[name],
                               out_features_map["mlp.experts." + name],
                               dtype=dtype,
                               in_features=in_map["mlp.experts." + name])
            for name, p in lp["mlp"].get("shared_experts", {}).items():
                _lin_to_sd(sd, base + "mlp.shared_experts." + name, p,
                           out_features_map["mlp.shared_experts." + name],
                           dtype=dtype,
                           in_features=in_map[
                               "mlp.shared_experts." + name])
    return sd


def role_in_features(cfg: ModelConfig) -> Dict[str, int]:
    """Logical in_features (K) by layer role — lets the writer strip the
    kernel's K padding (core/packing.pad_k_nibbles; e.g. falcon-7b's
    h=4544 padded to 4608 at group 64) from saved AutoAWQ tensors."""
    h = cfg.hidden_size
    hd, nh = cfg.head_dim_, cfg.num_attention_heads
    inter = cfg.moe_intermediate_size or cfg.intermediate_size
    shared_inter = (cfg.moe_intermediate_size or 0) * max(
        1, cfg.n_shared_experts)
    o_in = nh * (cfg.v_head_dim if cfg.is_mla else hd)
    return {
        "self_attn.qkv_proj": h,
        "self_attn.q_proj": h if not cfg.is_mla else h,
        "self_attn.k_proj": h,
        "self_attn.v_proj": h,
        "self_attn.o_proj": o_in,
        "self_attn.q_a_proj": h,
        "self_attn.q_b_proj": cfg.q_lora_rank or 0,
        "self_attn.kv_a_proj_with_mqa": h,
        "self_attn.kv_b_proj": cfg.kv_lora_rank or 0,
        "mlp.gate_up_proj": h,
        "mlp.gate_proj": h,
        "mlp.up_proj": h,
        "mlp.down_proj": cfg.intermediate_size,
        "mlp.fc1": h,
        "mlp.fc2": cfg.intermediate_size,
        "mlp.gate": h,
        "mlp.experts.gate_proj": h,
        "mlp.experts.up_proj": h,
        "mlp.experts.down_proj": inter,
        "mlp.shared_experts.gate_proj": h,
        "mlp.shared_experts.up_proj": h,
        "mlp.shared_experts.down_proj": shared_inter,
        "lm_head": h,
    }


def role_out_features(cfg: ModelConfig) -> Dict[str, int]:
    """Logical out_features by layer role (needed to strip lane padding)."""
    hd, nh, nkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads
    inter = cfg.moe_intermediate_size or cfg.intermediate_size
    shared_inter = (cfg.moe_intermediate_size or 0) * max(1, cfg.n_shared_experts)
    mla = {
        "self_attn.q_a_proj": cfg.q_lora_rank or 0,
        "self_attn.q_b_proj": nh * (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim),
        "self_attn.kv_a_proj_with_mqa": (cfg.kv_lora_rank or 0) + cfg.qk_rope_head_dim,
        "self_attn.kv_b_proj": nh * (cfg.qk_nope_head_dim + cfg.v_head_dim),
        "mlp.shared_experts.gate_proj": shared_inter,
        "mlp.shared_experts.up_proj": shared_inter,
        "mlp.shared_experts.down_proj": cfg.hidden_size,
    }
    q_out = (nh * (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
             if cfg.is_mla else nh * hd)
    return mla | {
        "self_attn.qkv_proj": (nh + 2 * nkv) * hd,
        "mlp.gate_up_proj": 2 * cfg.intermediate_size,
        "self_attn.q_proj": q_out,
        "self_attn.k_proj": nkv * hd,
        "self_attn.v_proj": nkv * hd,
        "self_attn.o_proj": cfg.hidden_size,
        "mlp.gate_proj": cfg.intermediate_size,
        "mlp.up_proj": cfg.intermediate_size,
        "mlp.down_proj": cfg.hidden_size,
        "mlp.fc1": cfg.intermediate_size,
        "mlp.fc2": cfg.hidden_size,
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
    """Random fp param pytree for tests and synthetic benchmarks
    (llama-family shapes)."""
    rng = np.random.default_rng(seed)

    def randn(shape):
        # sample straight into f32: the default f64 draw + astype would
        # allocate 2x-size temporaries (56 GB of churn at 7B scale, ~24
        # min wall; f32-native is ~3x faster and half the peak RSS)
        a = rng.standard_normal(shape, dtype=np.float32)
        a *= scale
        return a.astype(dtype, copy=False)

    def lin(k, n, bias=False):
        p = {"kernel": randn((k, n))}
        if bias:
            p["bias"] = np.zeros((n,), dtype=dtype)
        return p

    h, hd = cfg.hidden_size, cfg.head_dim_
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    params: Dict[str, Any] = {
        "embed_tokens": {
            "weight": randn((cfg.vocab_size, h))
        },
        "norm": {"weight": np.ones((h,), dtype=dtype)},
        "lm_head": None if cfg.tie_word_embeddings else lin(h, cfg.vocab_size),
        "layers": [],
    }
    for _ in range(cfg.num_hidden_layers):
        if cfg.is_mla:
            dq = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
            attn = {
                "kv_a_proj_with_mqa": lin(
                    h, cfg.kv_lora_rank + cfg.qk_rope_head_dim),
                "kv_a_layernorm": {
                    "weight": np.ones((cfg.kv_lora_rank,), dtype=dtype)},
                "kv_b_proj": lin(
                    cfg.kv_lora_rank,
                    nh * (cfg.qk_nope_head_dim + cfg.v_head_dim)),
                "o_proj": lin(nh * cfg.v_head_dim, h),
            }
            if cfg.q_lora_rank:
                attn["q_a_proj"] = lin(h, cfg.q_lora_rank)
                attn["q_a_layernorm"] = {
                    "weight": np.ones((cfg.q_lora_rank,), dtype=dtype)}
                attn["q_b_proj"] = lin(cfg.q_lora_rank, nh * dq)
            else:
                attn["q_proj"] = lin(h, nh * dq)
        else:
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
