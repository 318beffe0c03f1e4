"""Multimodal (LLaVA-family) support: functional CLIP vision tower,
projector, and image-feature splicing.

The reference treats vision models by quantizing only the language model and
leaving the vision tower fp16 (awq/models/llava.py:26-27,
modules_to_not_convert=["visual"] for qwen2-vl). Since this framework owns
its model graph, the vision tower is implemented here as a functional JAX
CLIP ViT (numerics-matched to transformers' CLIPVisionModel) so quantized
LLaVA checkpoints run end-to-end — prompt + pixels -> logits.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules


def _ln(p: Dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    return modules.layer_norm(x, p["weight"], p.get("bias"), eps)


def _lin(p: Dict, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def clip_vision_features(
    vcfg: Dict[str, Any],
    vp: Dict[str, Any],
    pixel_values: jax.Array,  # [B, 3, H, W]
    feature_layer: int = -2,
) -> jax.Array:
    """CLIP ViT forward returning the hidden state at ``feature_layer``
    (counted like HF's output_hidden_states list: index 0 = embeddings,
    -1 = last layer). No post_layernorm — matches LLaVA feature extraction.
    """
    h = vcfg["hidden_size"]
    ps = vcfg["patch_size"]
    nh = vcfg["num_attention_heads"]
    eps = vcfg.get("layer_norm_eps", 1e-5)
    act = vcfg.get("hidden_act", "quick_gelu")

    b, c, hh, ww = pixel_values.shape
    # patch conv == unfold + matmul: [B, nP, C*ps*ps] @ [C*ps*ps, H]
    x = pixel_values.reshape(b, c, hh // ps, ps, ww // ps, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, c * ps * ps)
    pw = np.asarray(vp["patch_embedding"]["weight"])  # [H, C, ps, ps]
    x = jnp.dot(x, jnp.asarray(pw.reshape(h, -1).T, x.dtype))
    cls = jnp.broadcast_to(
        jnp.asarray(vp["class_embedding"], x.dtype)[None, None, :],
        (b, 1, h))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + jnp.asarray(vp["position_embedding"]["weight"], x.dtype)[None]
    x = _ln(vp["pre_layernorm"], x, eps)

    hidden = [x]
    for lp in vp["layers"]:
        r = x
        y = _ln(lp["layer_norm1"], x, eps)
        s = y.shape[1]
        q = _lin(lp["q_proj"], y).reshape(b, s, nh, h // nh)
        k = _lin(lp["k_proj"], y).reshape(b, s, nh, h // nh)
        v = _lin(lp["v_proj"], y).reshape(b, s, nh, h // nh)
        scores = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (h // nh) ** -0.5
        probs = jax.nn.softmax(scores, axis=-1).astype(y.dtype)
        attn = jnp.einsum("bhst,bthd->bshd", probs, v).reshape(b, s, h)
        x = r + _lin(lp["out_proj"], attn)
        r = x
        y = _ln(lp["layer_norm2"], x, eps)
        y = _lin(lp["fc1"], y)
        y = quick_gelu(y) if act == "quick_gelu" else modules.act_fn(act, y)
        x = r + _lin(lp["fc2"], y)
        hidden.append(x)
    return hidden[feature_layer]


def llava_project(pp: Dict[str, Any], feats: jax.Array,
                  act: str = "gelu") -> jax.Array:
    y = _lin(pp["linear_1"], feats)
    y = modules.act_fn(act, y)
    return _lin(pp["linear_2"], y)


def merge_image_features(
    input_embeds: jax.Array,  # [B, S, H]
    input_ids: jax.Array,  # [B, S]
    image_features: jax.Array,  # [B*n_img, n_patch, H] flattened
    image_token_index: int,
) -> jax.Array:
    """Scatter projected image features into the image-token positions
    (HF LlavaForConditionalGeneration.get_placeholder_mask semantics:
    positions are filled in raster order)."""
    b, s, h = input_embeds.shape
    flat = image_features.reshape(-1, h).astype(input_embeds.dtype)
    mask = (input_ids == image_token_index).reshape(-1)
    # k-th image token overall <- k-th image feature row
    idx = jnp.cumsum(mask) - 1
    gathered = flat[jnp.clip(idx, 0, flat.shape[0] - 1)]
    out = jnp.where(mask[:, None], gathered, input_embeds.reshape(-1, h))
    return out.reshape(b, s, h)


def llava_input_embeds(
    cfg: ModelConfig,
    vcfg: Dict[str, Any],
    params: Dict[str, Any],
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    image_token_index: int = 32000,
    vision_feature_layer: int = -2,
    vision_feature_select_strategy: str = "default",
    dtype=jnp.float32,
) -> jax.Array:
    """Prompt input embeds [B, S, H]: text embeddings with projected
    vision features spliced at the image-token positions — the
    multimodal PROMPT a text-only engine can prefill from (decode
    continues on token ids; serve/generate.prefill ``embeds=``)."""
    lm = params["language_model"]
    b, s = input_ids.shape
    positions = jnp.arange(s)[None, :]
    x = modules.embed(cfg, lm, input_ids, dtype, positions)
    if pixel_values is not None:
        feats = clip_vision_features(vcfg, params["vision_tower"],
                                     pixel_values.astype(dtype),
                                     vision_feature_layer)
        if vision_feature_select_strategy == "default":
            feats = feats[:, 1:]  # drop CLS
        feats = llava_project(params["projector"], feats)
        x = merge_image_features(x, input_ids, feats, image_token_index)
    return x


def llava_forward(
    cfg: ModelConfig,  # text config
    vcfg: Dict[str, Any],
    params: Dict[str, Any],  # {"language_model", "vision_tower", "projector"}
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,
    image_token_index: int = 32000,
    vision_feature_layer: int = -2,
    vision_feature_select_strategy: str = "default",
    method: str = "auto",
    dtype=jnp.float32,
) -> jax.Array:
    """Full multimodal forward -> logits [B, S, V]."""
    lm = params["language_model"]
    b, s = input_ids.shape
    positions = jnp.arange(s)[None, :]
    x = llava_input_embeds(
        cfg, vcfg, params, input_ids, pixel_values,
        image_token_index=image_token_index,
        vision_feature_layer=vision_feature_layer,
        vision_feature_select_strategy=vision_feature_select_strategy,
        dtype=dtype)
    cos, sin = modules.rope_tables(cfg, positions)
    mask = modules.causal_mask(s, sliding_window=cfg.sliding_window)
    for lp in lm["layers"]:
        x, _ = modules.block(cfg, lp, x, cos, sin, mask, None, None, method,
                             causal_prefill=False)
    return modules.logits_fn(cfg, lm, x, method)


# --------------------------------------------------------------------------
# HF state-dict conversion
# --------------------------------------------------------------------------

_LLAVA_LM_PREFIXES = ("model.language_model.", "language_model.model.")
_LLAVA_VT_PREFIXES = ("model.vision_tower.", "vision_tower.")
_LLAVA_PJ_PREFIXES = ("model.multi_modal_projector.", "multi_modal_projector.")


def _strip(sd: Dict[str, np.ndarray], prefixes) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                out[k[len(p):]] = v
                break
    return out


def llava_state_dict_from_params(
    text_cfg: ModelConfig,
    params: Dict[str, Any],
    dtype=np.float16,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`llava_params_from_state_dict` (current HF layout:
    ``model.language_model.*`` / ``model.vision_tower.*`` + top-level
    lm_head). Quantized LM linears come out in AutoAWQ format."""
    from autoawq_tpu.io.hf import role_out_features, state_dict_from_params

    lm_sd = state_dict_from_params(text_cfg, params["language_model"],
                                   role_out_features(text_cfg), dtype)
    sd: Dict[str, np.ndarray] = {}
    for k, v in lm_sd.items():
        if k.startswith("lm_head"):
            sd[k] = v
        elif k.startswith("model."):
            sd["model.language_model." + k[len("model."):]] = v
        else:
            sd["model.language_model." + k] = v

    vp = params["vision_tower"]
    vm = "model.vision_tower.vision_model."

    def put_norm(name, p):
        sd[name + ".weight"] = np.asarray(p["weight"]).astype(dtype)
        if p.get("bias") is not None:
            sd[name + ".bias"] = np.asarray(p["bias"]).astype(dtype)

    def put_lin(name, p):
        sd[name + ".weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"]).T.astype(dtype))
        if p.get("bias") is not None:
            sd[name + ".bias"] = np.asarray(p["bias"]).astype(dtype)

    sd[vm + "embeddings.class_embedding"] = np.asarray(
        vp["class_embedding"]).astype(dtype)
    sd[vm + "embeddings.patch_embedding.weight"] = np.asarray(
        vp["patch_embedding"]["weight"]).astype(dtype)
    sd[vm + "embeddings.position_embedding.weight"] = np.asarray(
        vp["position_embedding"]["weight"]).astype(dtype)
    put_norm(vm + "pre_layrnorm", vp["pre_layernorm"])
    put_norm(vm + "post_layernorm", vp["post_layernorm"])
    for i, lp in enumerate(vp["layers"]):
        base = f"{vm}encoder.layers.{i}."
        put_norm(base + "layer_norm1", lp["layer_norm1"])
        put_norm(base + "layer_norm2", lp["layer_norm2"])
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_lin(base + "self_attn." + n, lp[n])
        put_lin(base + "mlp.fc1", lp["fc1"])
        put_lin(base + "mlp.fc2", lp["fc2"])
    pp = params["projector"]
    put_lin("model.multi_modal_projector.linear_1", pp["linear_1"])
    put_lin("model.multi_modal_projector.linear_2", pp["linear_2"])
    return sd


def llava_params_from_state_dict(
    text_cfg: ModelConfig, sd: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """LLaVA HF state dict -> {"language_model", "vision_tower", "projector"}.

    Handles both the legacy (language_model.model.*) and current
    (model.language_model.*) transformers layouts.
    """
    from autoawq_tpu.io.hf import params_from_state_dict

    lm_sd = {"model." + k: v for k, v in _strip(sd, _LLAVA_LM_PREFIXES).items()}
    for k in ("lm_head.weight", "lm_head.qweight", "lm_head.qzeros",
              "lm_head.scales", "lm_head.bias"):
        if k in sd:
            lm_sd[k] = sd[k]
        elif "language_model." + k in sd:
            lm_sd[k] = sd["language_model." + k]
    lm = params_from_state_dict(text_cfg, lm_sd)

    vt_sd = _strip(sd, _LLAVA_VT_PREFIXES)
    nlayers = 1 + max(
        int(k.split(".")[3]) for k in vt_sd if ".encoder.layers." in k
    )
    vm = "vision_model."

    def norm_p(name):
        p = {"weight": np.asarray(vt_sd[name + ".weight"])}
        if name + ".bias" in vt_sd:
            p["bias"] = np.asarray(vt_sd[name + ".bias"])
        return p

    def lin_p(name):
        p = {"kernel": np.ascontiguousarray(
            np.asarray(vt_sd[name + ".weight"]).T)}
        if name + ".bias" in vt_sd:
            p["bias"] = np.asarray(vt_sd[name + ".bias"])
        return p

    vp: Dict[str, Any] = {
        "class_embedding": np.asarray(vt_sd[vm + "embeddings.class_embedding"]),
        "patch_embedding": {
            "weight": np.asarray(vt_sd[vm + "embeddings.patch_embedding.weight"])
        },
        "position_embedding": {
            "weight": np.asarray(vt_sd[vm + "embeddings.position_embedding.weight"])
        },
        # HF ships the typo'd name "pre_layrnorm"
        "pre_layernorm": norm_p(
            vm + ("pre_layrnorm" if vm + "pre_layrnorm.weight" in vt_sd
                  else "pre_layernorm")),
        "post_layernorm": norm_p(vm + "post_layernorm"),
        "layers": [],
    }
    for i in range(nlayers):
        base = f"{vm}encoder.layers.{i}."
        vp["layers"].append({
            "layer_norm1": norm_p(base + "layer_norm1"),
            "layer_norm2": norm_p(base + "layer_norm2"),
            "q_proj": lin_p(base + "self_attn.q_proj"),
            "k_proj": lin_p(base + "self_attn.k_proj"),
            "v_proj": lin_p(base + "self_attn.v_proj"),
            "out_proj": lin_p(base + "self_attn.out_proj"),
            "fc1": lin_p(base + "mlp.fc1"),
            "fc2": lin_p(base + "mlp.fc2"),
        })

    pj_sd = _strip(sd, _LLAVA_PJ_PREFIXES)
    pp = {
        "linear_1": {"kernel": np.ascontiguousarray(
            np.asarray(pj_sd["linear_1.weight"]).T),
            "bias": np.asarray(pj_sd.get("linear_1.bias"))},
        "linear_2": {"kernel": np.ascontiguousarray(
            np.asarray(pj_sd["linear_2.weight"]).T),
            "bias": np.asarray(pj_sd.get("linear_2.bias"))},
    }
    out = {"language_model": lm, "vision_tower": vp, "projector": pp}
    for k in ("model.image_newline", "image_newline"):  # llava_next only
        if k in sd:
            out["image_newline"] = np.asarray(sd[k])
            break
    return out


# --------------------------------------------------------------------------
# LLaVA-Next (anyres multi-crop) — reference awq/models/llava_next.py:89-160
# --------------------------------------------------------------------------

def select_best_resolution(original_size, possible_resolutions):
    """HF ``select_best_resolution`` semantics: maximize effective
    resolution, tie-break on least padding waste."""
    oh, ow = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = h * w - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (h, w), eff, waste
    return best


def _unpad_hw(feat: jax.Array, original_size) -> jax.Array:
    """feat [H_emb, gh, gw] -> strip the aspect-preserving resize padding
    (HF ``unpad_image``)."""
    oh, ow = original_size
    ch, cw = feat.shape[1:]
    if ow / oh > cw / ch:
        new_h = int(round(oh * (cw / ow), 7))
        pad = (ch - new_h) // 2
        return feat[:, pad:ch - pad, :]
    new_w = int(round(ow * (ch / oh), 7))
    pad = (cw - new_w) // 2
    return feat[:, :, pad:cw - pad]


def llava_next_pack_features(
    feats: jax.Array,  # [n_crops, n_tok, H] projected features of ONE image
    image_size,  # (orig_h, orig_w) python ints
    vcfg: Dict[str, Any],
    grid_pinpoints,
    image_newline: Optional[jax.Array],
) -> jax.Array:
    """Multi-crop anyres merge (HF ``pack_image_features``): crop 0 is the
    resized base image; the rest tile the anyres grid, get re-rastered to
    full resolution, unpadded, and a newline embedding terminates each
    row. Returns [L, H]."""
    side = vcfg["image_size"] // vcfg["patch_size"]
    base, crops = feats[0], feats[1:]
    if crops.shape[0] == 0:
        return base
    gh, gw = select_best_resolution(tuple(image_size), grid_pinpoints)
    nph, npw = gh // vcfg["image_size"], gw // vcfg["image_size"]
    h_emb = feats.shape[-1]
    f = crops.reshape(nph, npw, side, side, h_emb)
    f = f.transpose(4, 0, 2, 1, 3).reshape(h_emb, nph * side, npw * side)
    f = _unpad_hw(f, image_size)
    if image_newline is not None:
        nl = jnp.broadcast_to(
            jnp.asarray(image_newline, f.dtype)[:, None, None],
            (h_emb, f.shape[1], 1))
        f = jnp.concatenate([f, nl], axis=2)
    f = f.reshape(h_emb, -1).T
    return jnp.concatenate([base, f], axis=0)


def llava_next_forward(
    cfg: ModelConfig,
    vcfg: Dict[str, Any],
    params: Dict[str, Any],  # llava params (+ "image_newline")
    input_ids: jax.Array,
    pixel_values: Optional[jax.Array] = None,  # [n_crops_total, 3, H, W]
    image_sizes=None,  # [(h, w)] python ints per image
    crops_per_image: Optional[Tuple[int, ...]] = None,
    image_token_index: int = 32000,
    vision_feature_layer: int = -2,
    vision_feature_select_strategy: str = "default",
    method: str = "auto",
    dtype=jnp.float32,
) -> jax.Array:
    """LLaVA-Next multimodal forward -> logits [B, S, V]."""
    lm = params["language_model"]
    b, s = input_ids.shape
    positions = jnp.arange(s)[None, :]
    x = modules.embed(cfg, lm, input_ids, dtype, positions)
    if pixel_values is not None:
        feats = clip_vision_features(vcfg, params["vision_tower"],
                                     pixel_values.astype(dtype),
                                     vision_feature_layer)
        if vision_feature_select_strategy == "default":
            feats = feats[:, 1:]
        feats = llava_project(params["projector"], feats)
        if crops_per_image is None:
            crops_per_image = (feats.shape[0],) if len(image_sizes) == 1 \
                else (feats.shape[0] // len(image_sizes),) * len(image_sizes)
        packed, off = [], 0
        for size, n in zip(image_sizes, crops_per_image):
            packed.append(llava_next_pack_features(
                feats[off:off + n], size, vcfg,
                vcfg.get("image_grid_pinpoints") or [],
                params.get("image_newline")))
            off += n
        allf = jnp.concatenate(packed, axis=0)
        x = merge_image_features(x, input_ids, allf[None], image_token_index)
    cos, sin = modules.rope_tables(cfg, positions)
    mask = modules.causal_mask(s, sliding_window=cfg.sliding_window)
    for lp in lm["layers"]:
        x, _ = modules.block(cfg, lp, x, cos, sin, mask, None, None, method,
                             causal_prefill=False)
    return modules.logits_fn(cfg, lm, x, method)
