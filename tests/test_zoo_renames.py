"""baichuan / internlm2 / exaone parity via rename-from-llama oracles.

These are trust_remote_code architectures (no transformers class to use as
an oracle), but all three are llama math under different names / qkv
packing (reference: awq/models/baichuan.py:43, internlm2.py:34-70,
exaone.py:74-83). So the oracle is a tiny HF Llama: take its state dict,
re-key (and re-pack wqkv) into each architecture's checkpoint format, load
through io/hf, and demand the llama logits back.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from autoawq_tpu.io.hf import params_from_state_dict, role_out_features, \
    state_dict_from_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules

B, S = 2, 12
H, NH, HD, INTER, V, LAYERS = 64, 4, 16, 128, 128, 2


def _llama(nkv):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaConfig(vocab_size=V, hidden_size=H, intermediate_size=INTER,
                     num_hidden_layers=LAYERS, num_attention_heads=NH,
                     num_key_value_heads=nkv, max_position_embeddings=64)
    model = LlamaForCausalLM(hf).eval()
    ids = torch.randint(0, V, (B, S))
    with torch.no_grad():
        ref = model(ids).logits.float().numpy()
    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    return sd, np.asarray(ids.numpy()), ref


def _check(cfg_dict, sd, ids, ref, atol=2e-3):
    cfg = ModelConfig.from_hf_dict(cfg_dict)
    params = params_from_state_dict(cfg, sd)
    ours = np.asarray(modules.forward(cfg, params, ids, method="jnp",
                                      dtype=np.float32))
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(ours / scale, ref / scale, atol=atol,
                               rtol=atol)
    return cfg, params


def _internlm2_sd(sd, nkv):
    """Llama sd -> internlm2 names, with wqkv packed in the HF grouped
    order [nkv, (per q-heads, k, v), head_dim]."""
    per = NH // nkv
    out = {
        "model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
        "model.norm.weight": sd["model.norm.weight"],
        "output.weight": sd["lm_head.weight"],
    }
    for i in range(LAYERS):
        p = f"model.layers.{i}."
        q = sd[p + "self_attn.q_proj.weight"]
        k = sd[p + "self_attn.k_proj.weight"]
        v = sd[p + "self_attn.v_proj.weight"]
        rows = []
        for g in range(nkv):
            rows.append(q[g * per * HD:(g + 1) * per * HD])
            rows.append(k[g * HD:(g + 1) * HD])
            rows.append(v[g * HD:(g + 1) * HD])
        out[p + "attention.wqkv.weight"] = np.concatenate(rows, axis=0)
        out[p + "attention.wo.weight"] = sd[p + "self_attn.o_proj.weight"]
        out[p + "feed_forward.w1.weight"] = sd[p + "mlp.gate_proj.weight"]
        out[p + "feed_forward.w3.weight"] = sd[p + "mlp.up_proj.weight"]
        out[p + "feed_forward.w2.weight"] = sd[p + "mlp.down_proj.weight"]
        out[p + "attention_norm.weight"] = sd[p + "input_layernorm.weight"]
        out[p + "ffn_norm.weight"] = sd[p + "post_attention_layernorm.weight"]
    return out


def test_baichuan_wpack_parity():
    sd, ids, ref = _llama(nkv=NH)  # baichuan is MHA
    new = {k: v for k, v in sd.items() if "_proj" not in k}
    for i in range(LAYERS):
        p = f"model.layers.{i}.self_attn."
        new[p + "W_pack.weight"] = np.concatenate(
            [sd[p + "q_proj.weight"], sd[p + "k_proj.weight"],
             sd[p + "v_proj.weight"]], axis=0)
        new[p + "o_proj.weight"] = sd[p + "o_proj.weight"]
        for n in ("gate_proj", "up_proj", "down_proj"):
            new[f"model.layers.{i}.mlp.{n}.weight"] = sd[
                f"model.layers.{i}.mlp.{n}.weight"]
    _check({"model_type": "baichuan", "vocab_size": V, "hidden_size": H,
            "intermediate_size": INTER, "num_hidden_layers": LAYERS,
            "num_attention_heads": NH, "rms_norm_eps": 1e-6,
            "model_max_length": 64}, new, ids, ref)


def test_internlm2_wqkv_parity():
    nkv = 2
    sd, ids, ref = _llama(nkv=nkv)
    new = _internlm2_sd(sd, nkv)
    _check({"model_type": "internlm2", "vocab_size": V, "hidden_size": H,
            "intermediate_size": INTER, "num_hidden_layers": LAYERS,
            "num_attention_heads": NH, "num_key_value_heads": nkv,
            "rms_norm_eps": 1e-6, "max_position_embeddings": 64,
            "bias": False}, new, ids, ref)


def test_exaone_parity():
    nkv = 2
    sd, ids, ref = _llama(nkv=nkv)
    ren = {
        "model.embed_tokens.weight": "transformer.wte.weight",
        "model.norm.weight": "transformer.ln_f.weight",
        "lm_head.weight": "lm_head.weight",
    }
    for i in range(LAYERS):
        src, dst = f"model.layers.{i}.", f"transformer.h.{i}."
        ren |= {
            src + "input_layernorm.weight": dst + "ln_1.weight",
            src + "post_attention_layernorm.weight": dst + "ln_2.weight",
            src + "self_attn.q_proj.weight": dst + "attn.attention.q_proj.weight",
            src + "self_attn.k_proj.weight": dst + "attn.attention.k_proj.weight",
            src + "self_attn.v_proj.weight": dst + "attn.attention.v_proj.weight",
            src + "self_attn.o_proj.weight": dst + "attn.attention.out_proj.weight",
            src + "mlp.gate_proj.weight": dst + "mlp.c_fc_0.weight",
            src + "mlp.up_proj.weight": dst + "mlp.c_fc_1.weight",
            src + "mlp.down_proj.weight": dst + "mlp.c_proj.weight",
        }
    new = {ren[k]: v for k, v in sd.items() if k in ren}
    _check({"model_type": "exaone", "vocab_size": V, "hidden_size": H,
            "intermediate_size": INTER, "num_layers": LAYERS,
            "num_attention_heads": NH, "num_key_value_heads": nkv,
            "activation_function": "silu", "layer_norm_epsilon": 1e-6,
            "max_position_embeddings": 64, "head_dim": HD}, new, ids, ref)


def test_internlm2_quantized_save_roundtrip():
    """Quantize an internlm2-named model, write the AutoAWQ-layout state
    dict (wqkv columns inverted back to the HF grouped order), reload, and
    demand bit-identical nibbles — proves the qkv permutation commutes
    with int4 packing in both directions."""
    from autoawq_tpu.config import AwqConfig
    from autoawq_tpu.quantize.quantizer import quantize_linear_params
    from autoawq_tpu.utils.tree import iter_linears, set_by_path

    nkv = 2
    sd, ids, ref = _llama(nkv=nkv)
    new = _internlm2_sd(sd, nkv)
    cfg = ModelConfig.from_hf_dict(
        {"model_type": "internlm2", "vocab_size": V, "hidden_size": H,
         "intermediate_size": INTER, "num_hidden_layers": LAYERS,
         "num_attention_heads": NH, "num_key_value_heads": nkv,
         "rms_norm_eps": 1e-6, "max_position_embeddings": 64})
    params = params_from_state_dict(cfg, new)
    qcfg = AwqConfig(q_group_size=32)
    for lp in params["layers"]:
        for path, p in list(iter_linears(lp)):
            set_by_path(lp, path, quantize_linear_params(p, qcfg))

    out_sd = state_dict_from_params(cfg, params, role_out_features(cfg))
    assert "model.layers.0.attention.wqkv.qweight" in out_sd
    params2 = params_from_state_dict(cfg, out_sd)

    a = params["layers"][0]["self_attn"]["qkv_proj"]
    b = params2["layers"][0]["self_attn"]["qkv_proj"]
    np.testing.assert_array_equal(np.asarray(a["qweight"]),
                                  np.asarray(b["qweight"]))
    np.testing.assert_allclose(np.asarray(a["scales"]),
                               np.asarray(b["scales"]), atol=1e-3)


def test_reference_registry_coverage():
    """Every model_type the reference registers (awq/models/auto.py:9-47)
    either has a quantization plugin here (after alias normalization) or is
    a multimodal wrapper dispatched at the api level."""
    import re

    from autoawq_tpu.api import MULTIMODAL_TYPES
    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.models.plugins import PLUGINS

    ref_types = [
        "RefinedWeb", "RefinedWebModel", "Yi", "aquila", "baichuan",
        "bloom", "cohere", "deepseek_v2", "deepseek_v3", "exaone", "falcon",
        "gemma", "gemma2", "gpt_bigcode", "gpt_neox", "gptj", "internlm2",
        "llama", "llava", "llava_next", "minicpm", "minicpm3", "mistral",
        "mixtral", "mpt", "opt", "phi3", "phi3_v", "qwen", "qwen2",
        "qwen2_5_vl", "qwen2_vl", "qwen3", "qwen3_moe", "stablelm",
        "starcoder2",
    ]
    alias = {"RefinedWeb": "falcon", "RefinedWebModel": "falcon", "Yi": "yi"}
    for mt in ref_types:
        norm = alias.get(mt, mt)
        assert norm in PLUGINS or norm in MULTIMODAL_TYPES, mt


def test_baichuan_quantize_end_to_end(rng):
    """FusedQkvLlamaPlugin is registered: a W_pack-style model runs the
    full AWQ search + pack (regression: the plugin existed but was missing
    from the registry, so quantize() raised for baichuan/internlm2)."""
    import jax.numpy as jnp

    from autoawq_tpu.config import AwqConfig
    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.models.plugins import get_plugin
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.nn import fuse
    from autoawq_tpu.quantize.quantizer import AwqQuantizer
    from autoawq_tpu.utils.tree import iter_linears

    assert get_plugin("baichuan").__name__ == "FusedQkvLlamaPlugin"
    assert get_plugin("internlm2").__name__ == "FusedQkvLlamaPlugin"

    cfg = ModelConfig(model_type="baichuan", vocab_size=96, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=1,
                      num_attention_heads=4, num_key_value_heads=4,
                      head_dim=16, max_position_embeddings=32)
    # baichuan loads with ONLY W_pack fused -> qkv_proj (io/hf.py layout);
    # gate/up stay separate like any llama checkpoint
    params = init_random_params(cfg, seed=2, scale=0.08)
    for lp in params["layers"]:
        attn = lp["self_attn"]
        attn["qkv_proj"] = fuse._fuse(
            [attn.pop("q_proj"), attn.pop("k_proj"), attn.pop("v_proj")],
            [64, 64, 64])
    calib = rng.integers(0, 96, (2, 16))
    q = AwqQuantizer(cfg, AwqConfig(q_group_size=32), params, calib,
                     progress=False)
    out = q.quantize()
    lins = dict(iter_linears(out["layers"][0]))
    assert "qweight" in lins["self_attn.qkv_proj"]
    assert "qweight" in lins["mlp.down_proj"]
