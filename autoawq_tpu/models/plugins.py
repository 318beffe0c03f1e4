"""Per-architecture quantization plugins.

The reference's 5-hook plugin protocol (awq/models/base.py:97 +
awq/models/llama.py:14-85) maps onto three hooks here, since the model graph
is ours and taps replace forward hooks:

* ``scale_groups(cfg, layer_params)`` — which linears to scale against which
  preceding op (the analogue of ``get_layers_for_scaling``).
* ``quantizable(cfg, layer_params)`` — linear paths to quantize
  (``get_named_linears`` + ``modules_to_not_convert``).
* ``inspect_fn(cfg, group)`` — the functional module whose output the scale
  grid-search minimizes against (``module2inspect``).

One generic llama-family plugin covers llama / mistral / qwen2 / qwen3 /
gemma / gemma2 / yi / tinyllama / ... via ModelConfig knobs; MoE models get
their own group layout (cf. awq/models/mixtral.py:33-82).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import jax

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.utils.tree import get_by_path


@dataclass(frozen=True)
class ScaleGroup:
    prev_op: str  # path of the op the scale folds into
    prev_kind: str  # "norm" | "fc" | "act"
    layers: tuple  # paths of target linears
    inp: str  # tap name carrying the input features
    inspect: str  # "attn" | "mlp" | "moe" | single-layer path


# reference avoid-list (awq/quantize/quantizer.py:481): q/k projections are
# excluded from clip search because of the q@k bmm
CLIP_AVOID = ("q_", "k_", "query", "key", "Wqkv")


class LlamaFamilyPlugin:
    model_types = (
        "llama", "mistral", "qwen2", "qwen3", "gemma", "gemma2", "yi",
        "aquila", "stablelm", "exaone", "minicpm",
        # VLM language models quantize exactly like their text base; the
        # vision tower is never converted (reference qwen2vl.py:11
        # modules_to_not_convert=["visual"], here structural: the tower
        # lives outside the LM pytree / in params["_extra"])
        "qwen2_vl", "qwen2_5_vl",
        "qwen2_5_omni", "qwen2_5_omni_thinker", "qwen2_5_omni_text",
    )

    @staticmethod
    def scale_groups(cfg: ModelConfig, layer_params: Dict) -> List[ScaleGroup]:
        groups = [
            ScaleGroup(
                prev_op="input_layernorm",
                prev_kind="norm",
                layers=("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"),
                inp="self_attn.q_proj",
                inspect="attn",
            )
        ]
        # v -> o only when shapes match (GQA guard, awq/models/llama.py:57)
        v = get_by_path(layer_params, "self_attn.v_proj")["kernel"]
        o = get_by_path(layer_params, "self_attn.o_proj")["kernel"]
        if v.shape == o.shape:
            groups.append(
                ScaleGroup(
                    prev_op="self_attn.v_proj",
                    prev_kind="fc",
                    layers=("self_attn.o_proj",),
                    inp="self_attn.o_proj",
                    inspect="self_attn.o_proj",
                )
            )
        post = (
            "pre_feedforward_layernorm" if cfg.post_norms
            else "post_attention_layernorm"
        )
        groups.append(
            ScaleGroup(
                prev_op=post,
                prev_kind="norm",
                layers=("mlp.gate_proj", "mlp.up_proj"),
                inp="mlp.gate_proj",
                inspect="mlp",
            )
        )
        groups.append(
            ScaleGroup(
                prev_op="mlp.up_proj",
                prev_kind="fc",
                layers=("mlp.down_proj",),
                inp="mlp.down_proj",
                inspect="mlp.down_proj",
            )
        )
        return groups

    @staticmethod
    def quantizable(cfg: ModelConfig, layer_params: Dict) -> List[str]:
        return [
            "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
            "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
            "mlp.down_proj",
        ]


class FusedQkvLlamaPlugin:
    """baichuan (W_pack, awq/models/baichuan.py:43) and internlm2
    (attention.wqkv, awq/models/internlm2.py:34-70): llama math with a
    natively fused qkv projection. io/hf.py loads the fused columns into
    plain q|k|v order, so the qkv->o trailing-rows fold always lands
    exactly on the v block — valid even under GQA (the reference applies
    the fold in wqkv's interleaved order, where the trailing rows are not
    v; we deviate for correctness). down_proj scales against up_proj
    (exact through the silu gate), where the reference's internlm2 plugin
    uses w1=gate (inexact through the nonlinearity)."""

    model_types = ("baichuan", "internlm2")
    extra_clip_avoid = ("qkv",)

    @staticmethod
    def scale_groups(cfg: ModelConfig, layer_params: Dict) -> List[ScaleGroup]:
        return [
            ScaleGroup("input_layernorm", "norm", ("self_attn.qkv_proj",),
                       "self_attn.qkv_proj", "attn"),
            ScaleGroup("self_attn.qkv_proj", "fc", ("self_attn.o_proj",),
                       "self_attn.o_proj", "self_attn.o_proj"),
            ScaleGroup("post_attention_layernorm", "norm",
                       ("mlp.gate_proj", "mlp.up_proj"),
                       "mlp.gate_proj", "mlp"),
            ScaleGroup("mlp.up_proj", "fc", ("mlp.down_proj",),
                       "mlp.down_proj", "mlp.down_proj"),
        ]

    @staticmethod
    def quantizable(cfg: ModelConfig, layer_params: Dict) -> List[str]:
        return ["self_attn.qkv_proj", "self_attn.o_proj", "mlp.gate_proj",
                "mlp.up_proj", "mlp.down_proj"]


class MoEFamilyPlugin:
    """mixtral / qwen3_moe: expert w1/w3 scale against the post-attn norm
    using router-input features (awq/models/mixtral.py:70-82); each expert's
    w2 scales against its w3; the router gate itself is never quantized
    (modules_to_not_convert=["gate"], awq/models/mixtral.py:20)."""

    model_types = ("mixtral", "qwen3_moe")

    @staticmethod
    def scale_groups(cfg: ModelConfig, layer_params: Dict) -> List[ScaleGroup]:
        groups = LlamaFamilyPlugin.scale_groups(cfg, layer_params)[:-2]
        expert_gates = []
        for e in range(cfg.num_experts):
            expert_gates += [
                f"mlp.experts.{e}.gate_proj",
                f"mlp.experts.{e}.up_proj",
            ]
        groups.append(
            ScaleGroup(
                prev_op="post_attention_layernorm",
                prev_kind="norm",
                layers=tuple(expert_gates),
                inp="mlp.gate",  # router input == experts input
                inspect="moe",
            )
        )
        for e in range(cfg.num_experts):
            groups.append(
                ScaleGroup(
                    prev_op=f"mlp.experts.{e}.up_proj",
                    prev_kind="fc",
                    layers=(f"mlp.experts.{e}.down_proj",),
                    inp=f"mlp.experts.{e}.down_proj",
                    inspect=f"mlp.experts.{e}.down_proj",
                )
            )
        return groups

    @staticmethod
    def quantizable(cfg: ModelConfig, layer_params: Dict) -> List[str]:
        paths = [
            "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
            "self_attn.o_proj",
        ]
        for e in range(cfg.num_experts):
            paths += [
                f"mlp.experts.{e}.gate_proj",
                f"mlp.experts.{e}.up_proj",
                f"mlp.experts.{e}.down_proj",
            ]
        return paths


class Phi3Plugin:
    """phi3 / phi3.5: natively fused qkv_proj and gate_up_proj
    (reference awq/models/phi3.py:14-85). The fused-prev scale groups rely
    on scale_fc_fcs dividing only the *trailing* len(s) output columns —
    the v part of qkv, the up part of gate_up."""

    model_types = ("phi3", "phi3_v", "phimoe")

    @staticmethod
    def scale_groups(cfg: ModelConfig, layer_params: Dict) -> List[ScaleGroup]:
        groups = [
            ScaleGroup("input_layernorm", "norm", ("self_attn.qkv_proj",),
                       "self_attn.qkv_proj", "attn"),
        ]
        # qkv->o folds into the *last* o_in columns of qkv; only valid when
        # those columns are exactly the v block (MHA). GQA would scale part
        # of k, so skip (mirrors the llama v->o shape guard).
        if cfg.num_attention_heads == cfg.num_key_value_heads:
            groups.append(
                ScaleGroup("self_attn.qkv_proj", "fc", ("self_attn.o_proj",),
                           "self_attn.o_proj", "self_attn.o_proj")
            )
        groups += [
            ScaleGroup("post_attention_layernorm", "norm",
                       ("mlp.gate_up_proj",), "mlp.gate_up_proj", "mlp"),
            ScaleGroup("mlp.gate_up_proj", "fc", ("mlp.down_proj",),
                       "mlp.down_proj", "mlp.down_proj"),
        ]
        return groups

    @staticmethod
    def quantizable(cfg: ModelConfig, layer_params: Dict) -> List[str]:
        return ["self_attn.qkv_proj", "self_attn.o_proj",
                "mlp.gate_up_proj", "mlp.down_proj"]


class OptPlugin:
    """OPT: separate q/k/v, non-gated relu MLP, LayerNorms
    (reference awq/models/opt.py)."""

    model_types = ("opt",)

    @staticmethod
    def scale_groups(cfg, layer_params):
        return [
            ScaleGroup("input_layernorm", "norm",
                       ("self_attn.q_proj", "self_attn.k_proj",
                        "self_attn.v_proj"),
                       "self_attn.q_proj", "attn"),
            ScaleGroup("self_attn.v_proj", "fc", ("self_attn.o_proj",),
                       "self_attn.o_proj", "self_attn.o_proj"),
            ScaleGroup("post_attention_layernorm", "norm", ("mlp.fc1",),
                       "mlp.fc1", "mlp.fc1"),
            ScaleGroup("mlp.fc1", "fc", ("mlp.fc2",), "mlp.fc2", "mlp.fc2"),
        ]

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                "self_attn.o_proj", "mlp.fc1", "mlp.fc2"]


class BloomPlugin:
    """bloom: fused qkv scaled against the input LN with the whole block as
    module2inspect; GELU act scaling on fc2 (reference awq/models/bloom.py).
    Attention-out scaling intentionally omitted (upstream issue #2)."""

    model_types = ("bloom",)
    extra_clip_avoid = ("qkv",)  # HF name query_key_value matches "query"

    @staticmethod
    def scale_groups(cfg, layer_params):
        return [
            ScaleGroup("input_layernorm", "norm", ("self_attn.qkv_proj",),
                       "self_attn.qkv_proj", "block"),
            ScaleGroup("post_attention_layernorm", "norm", ("mlp.fc1",),
                       "mlp.fc1", "block"),
            ScaleGroup("mlp", "act", ("mlp.fc2",), "mlp.fc2", "mlp.fc2"),
        ]

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.qkv_proj", "self_attn.o_proj", "mlp.fc1",
                "mlp.fc2"]


class GptjPlugin:
    """gptj: shared-LN parallel block — one group scales q/k/v AND fc_in
    against ln_1 with the whole block inspected (awq/models/gptj.py)."""

    model_types = ("gptj",)

    @staticmethod
    def scale_groups(cfg, layer_params):
        return [
            ScaleGroup("input_layernorm", "norm",
                       ("self_attn.q_proj", "self_attn.k_proj",
                        "self_attn.v_proj", "mlp.fc1"),
                       "self_attn.q_proj", "block"),
            ScaleGroup("self_attn.v_proj", "fc", ("self_attn.o_proj",),
                       "self_attn.o_proj", "self_attn.o_proj"),
            ScaleGroup("mlp", "act", ("mlp.fc2",), "mlp.fc2", "mlp.fc2"),
        ]

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                "self_attn.o_proj", "mlp.fc1", "mlp.fc2"]


class GptNeoxPlugin:
    """gpt_neox (awq/models/gpt_neox.py); attention-out scaling omitted
    upstream."""

    model_types = ("gpt_neox",)
    extra_clip_avoid = ("qkv",)

    @staticmethod
    def scale_groups(cfg, layer_params):
        return [
            ScaleGroup("input_layernorm", "norm", ("self_attn.qkv_proj",),
                       "self_attn.qkv_proj", "self_attn.qkv_proj"),
            ScaleGroup("post_attention_layernorm", "norm", ("mlp.fc1",),
                       "mlp.fc1", "mlp.fc1"),
            ScaleGroup("mlp", "act", ("mlp.fc2",), "mlp.fc2", "mlp.fc2"),
        ]

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.qkv_proj", "self_attn.o_proj", "mlp.fc1",
                "mlp.fc2"]


class GptBigcodePlugin:
    """gpt_bigcode / starcoder (awq/models/gpt_bigcode.py)."""

    model_types = ("gpt_bigcode",)

    @staticmethod
    def scale_groups(cfg, layer_params):
        return [
            ScaleGroup("input_layernorm", "norm", ("self_attn.qkv_proj",),
                       "self_attn.qkv_proj", "attn"),
            ScaleGroup("post_attention_layernorm", "norm", ("mlp.fc1",),
                       "mlp.fc1", "mlp"),
            ScaleGroup("mlp", "act", ("mlp.fc2",), "mlp.fc2", "mlp.fc2"),
        ]

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.qkv_proj", "self_attn.o_proj", "mlp.fc1",
                "mlp.fc2"]


class Starcoder2Plugin:
    """starcoder2 (awq/models/starcoder2.py)."""

    model_types = ("starcoder2",)

    @staticmethod
    def scale_groups(cfg, layer_params):
        groups = [
            ScaleGroup("input_layernorm", "norm",
                       ("self_attn.q_proj", "self_attn.k_proj",
                        "self_attn.v_proj"),
                       "self_attn.q_proj", "attn"),
        ]
        v = get_by_path(layer_params, "self_attn.v_proj")["kernel"]
        o = get_by_path(layer_params, "self_attn.o_proj")["kernel"]
        if v.shape == o.shape:
            groups.append(
                ScaleGroup("self_attn.v_proj", "fc", ("self_attn.o_proj",),
                           "self_attn.o_proj", "self_attn.o_proj"))
        groups += [
            ScaleGroup("post_attention_layernorm", "norm", ("mlp.fc1",),
                       "mlp.fc1", "mlp"),
            ScaleGroup("mlp", "act", ("mlp.fc2",), "mlp.fc2", "mlp.fc2"),
        ]
        return groups

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                "self_attn.o_proj", "mlp.fc1", "mlp.fc2"]


class MptPlugin:
    """mpt: fused Wqkv; qkv->out uses the trailing-rows fc-fc fold; GELU act
    scaling (awq/models/mpt.py)."""

    model_types = ("mpt",)
    extra_clip_avoid = ("qkv",)  # HF name Wqkv is in the reference avoid list

    @staticmethod
    def scale_groups(cfg, layer_params):
        return [
            ScaleGroup("input_layernorm", "norm", ("self_attn.qkv_proj",),
                       "self_attn.qkv_proj", "attn"),
            ScaleGroup("self_attn.qkv_proj", "fc", ("self_attn.o_proj",),
                       "self_attn.o_proj", "self_attn.o_proj"),
            ScaleGroup("post_attention_layernorm", "norm", ("mlp.fc1",),
                       "mlp.fc1", "mlp"),
            ScaleGroup("mlp", "act", ("mlp.fc2",), "mlp.fc2", "mlp.fc2"),
        ]

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.qkv_proj", "self_attn.o_proj", "mlp.fc1",
                "mlp.fc2"]


class FalconPlugin:
    """falcon: 7B (shared LN) scales fc1+qkv together; 40B+ scales each
    against its own LN; whole-block inspection (awq/models/falcon.py)."""

    model_types = ("falcon",)
    extra_clip_avoid = ("qkv",)

    @staticmethod
    def scale_groups(cfg, layer_params):
        if cfg.shared_input_norm:  # 7B-style old decoder arch
            return [
                ScaleGroup("input_layernorm", "norm",
                           ("mlp.fc1", "self_attn.qkv_proj"),
                           "self_attn.qkv_proj", "block"),
            ]
        return [
            ScaleGroup("input_layernorm", "norm", ("self_attn.qkv_proj",),
                       "self_attn.qkv_proj", "block"),
            ScaleGroup("post_attention_layernorm", "norm", ("mlp.fc1",),
                       "mlp.fc1", "block"),
        ]

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.qkv_proj", "self_attn.o_proj", "mlp.fc1",
                "mlp.fc2"]


class CoherePlugin:
    """cohere: shared-LN parallel block — q/k/v + gate/up all scale against
    the single input LN (awq/models/cohere.py)."""

    model_types = ("cohere",)

    @staticmethod
    def scale_groups(cfg, layer_params):
        groups = [
            ScaleGroup("input_layernorm", "norm",
                       ("self_attn.q_proj", "self_attn.k_proj",
                        "self_attn.v_proj", "mlp.gate_proj", "mlp.up_proj"),
                       "self_attn.q_proj", "block"),
        ]
        v = get_by_path(layer_params, "self_attn.v_proj")["kernel"]
        o = get_by_path(layer_params, "self_attn.o_proj")["kernel"]
        if v.shape == o.shape:
            groups.append(
                ScaleGroup("self_attn.v_proj", "fc", ("self_attn.o_proj",),
                           "self_attn.o_proj", "self_attn.o_proj"))
        groups.append(
            ScaleGroup("mlp.up_proj", "fc", ("mlp.down_proj",),
                       "mlp.down_proj", "mlp.down_proj"))
        return groups

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
                "mlp.down_proj"]


class QwenV1Plugin:
    """qwen (v1): fused c_attn; gated MLP with w2=gate, w1=up
    (awq/models/qwen.py)."""

    model_types = ("qwen",)

    @staticmethod
    def scale_groups(cfg, layer_params):
        return [
            ScaleGroup("input_layernorm", "norm", ("self_attn.qkv_proj",),
                       "self_attn.qkv_proj", "attn"),
            ScaleGroup("post_attention_layernorm", "norm",
                       ("mlp.gate_proj", "mlp.up_proj"),
                       "mlp.gate_proj", "mlp"),
            ScaleGroup("mlp.up_proj", "fc", ("mlp.down_proj",),
                       "mlp.down_proj", "mlp.down_proj"),
        ]

    @staticmethod
    def quantizable(cfg, layer_params):
        return ["self_attn.qkv_proj", "self_attn.o_proj", "mlp.gate_proj",
                "mlp.up_proj", "mlp.down_proj"]


class DeepseekPlugin:
    """deepseek_v2 / v3 / minicpm3 — MLA attention: q_a/kv_a scale against
    the input LN, q_b against q_a_layernorm, kv_b against kv_a_layernorm;
    MoE layers scale all routed+shared gate/up experts against the post-attn
    LN with router-input features (awq/models/deepseek_v2.py:20-115)."""

    model_types = ("deepseek_v2", "deepseek_v3", "minicpm3")

    @staticmethod
    def scale_groups(cfg, layer_params):
        attn = layer_params["self_attn"]
        groups = []
        if "q_proj" in attn:  # lite
            groups.append(
                ScaleGroup("input_layernorm", "norm",
                           ("self_attn.q_proj",
                            "self_attn.kv_a_proj_with_mqa"),
                           "self_attn.q_proj", "attn"))
        else:
            groups.append(
                ScaleGroup("input_layernorm", "norm",
                           ("self_attn.q_a_proj",
                            "self_attn.kv_a_proj_with_mqa"),
                           "self_attn.q_a_proj", "attn"))
            groups.append(
                ScaleGroup("self_attn.q_a_layernorm", "norm",
                           ("self_attn.q_b_proj",),
                           "self_attn.q_b_proj", "self_attn.q_b_proj"))
        groups.append(
            ScaleGroup("self_attn.kv_a_layernorm", "norm",
                       ("self_attn.kv_b_proj",),
                       "self_attn.kv_b_proj", "self_attn.kv_b_proj"))
        if "experts" in layer_params["mlp"]:
            targets = []
            for e in range(cfg.num_experts):
                targets += [f"mlp.experts.{e}.gate_proj",
                            f"mlp.experts.{e}.up_proj"]
            if "shared_experts" in layer_params["mlp"]:
                targets += ["mlp.shared_experts.gate_proj",
                            "mlp.shared_experts.up_proj"]
            groups.append(
                ScaleGroup("post_attention_layernorm", "norm",
                           tuple(targets), "mlp.gate", "moe"))
            for e in range(cfg.num_experts):
                groups.append(
                    ScaleGroup(f"mlp.experts.{e}.up_proj", "fc",
                               (f"mlp.experts.{e}.down_proj",),
                               f"mlp.experts.{e}.down_proj",
                               f"mlp.experts.{e}.down_proj"))
            if "shared_experts" in layer_params["mlp"]:
                groups.append(
                    ScaleGroup("mlp.shared_experts.up_proj", "fc",
                               ("mlp.shared_experts.down_proj",),
                               "mlp.shared_experts.down_proj",
                               "mlp.shared_experts.down_proj"))
        else:  # first_k_dense layers
            groups.append(
                ScaleGroup("post_attention_layernorm", "norm",
                           ("mlp.gate_proj", "mlp.up_proj"),
                           "mlp.gate_proj", "mlp"))
            groups.append(
                ScaleGroup("mlp.up_proj", "fc", ("mlp.down_proj",),
                           "mlp.down_proj", "mlp.down_proj"))
        return groups

    @staticmethod
    def quantizable(cfg, layer_params):
        attn = layer_params["self_attn"]
        paths = [
            "self_attn." + n
            for n in ("q_proj", "q_a_proj", "q_b_proj",
                      "kv_a_proj_with_mqa", "kv_b_proj", "o_proj")
            if n in attn
        ]
        if "experts" in layer_params["mlp"]:
            for e in range(cfg.num_experts):
                paths += [f"mlp.experts.{e}.{n}"
                          for n in ("gate_proj", "up_proj", "down_proj")]
            if "shared_experts" in layer_params["mlp"]:
                paths += [f"mlp.shared_experts.{n}"
                          for n in ("gate_proj", "up_proj", "down_proj")]
        else:
            paths += ["mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"]
        return paths


PLUGINS: Dict[str, type] = {}
for plugin in (LlamaFamilyPlugin, FusedQkvLlamaPlugin, MoEFamilyPlugin,
               Phi3Plugin, OptPlugin, BloomPlugin, GptjPlugin, GptNeoxPlugin,
               GptBigcodePlugin, Starcoder2Plugin, MptPlugin, FalconPlugin,
               CoherePlugin, QwenV1Plugin, DeepseekPlugin):
    for mt in plugin.model_types:
        PLUGINS[mt] = plugin


def get_plugin(model_type: str):
    if model_type not in PLUGINS:
        raise KeyError(
            f"no quantization plugin for model_type={model_type!r}; "
            f"known: {sorted(PLUGINS)}"
        )
    return PLUGINS[model_type]


def make_inspect_fn(cfg: ModelConfig, group: ScaleGroup,
                    out_features_map: Dict[str, int]) -> Callable:
    """Build the functional ``module2inspect`` for a scale group.

    Returns f(layer_params, inp, cos, sin, mask) -> output.
    """
    if group.inspect == "attn":
        attn_fn = modules.mla_attention if cfg.is_mla else modules.attention

        def f(lp, x, cos, sin, mask):
            return attn_fn(cfg, lp["self_attn"], x, cos, sin, mask,
                           method="jnp")[0]
        return f
    if group.inspect == "block":
        # whole-decoder-block inspection (reference module2inspect=module,
        # e.g. awq/models/bloom.py:34-41) — fed the post-LN features, same
        # quirk as upstream
        def f(lp, x, cos, sin, mask):
            return modules.block(cfg, lp, x, cos, sin, mask,
                                 method="jnp")[0]
        return f
    if group.inspect == "mlp":
        def f(lp, x, cos, sin, mask):
            return modules.mlp(cfg, lp["mlp"], x, method="jnp")
        return f
    if group.inspect == "moe":
        def f(lp, x, cos, sin, mask):
            return modules.moe_block(cfg, lp["mlp"], x, method="jnp")
        return f
    path = group.inspect

    def role_of(p: str) -> str:
        parts = p.split(".")
        if parts[0] == "mlp" and parts[1] == "experts":
            return "mlp.experts." + parts[-1]
        return p

    n = out_features_map[role_of(path)]

    def f(lp, x, cos, sin, mask):
        return modules.linear(get_by_path(lp, path), x, n, method="jnp")

    return f
