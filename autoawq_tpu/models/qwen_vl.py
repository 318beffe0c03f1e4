"""Qwen2-VL / Qwen2.5-VL: functional vision tower + M-RoPE language model.

Reference counterparts: awq/models/qwen2vl.py:8-75 and qwen2_5_vl.py:11 —
there the HF graph is reused and only the LM is quantized
(``modules_to_not_convert=["visual"]``). Here the tower is a functional JAX
re-implementation numerics-matched to HF's ``Qwen2VisionTransformer`` /
``Qwen2_5_VisionTransformer``, and M-RoPE folds into the generic decoder:

* the 3-D (temporal/height/width) position ids are computed host-side
  (:func:`mrope_position_ids`, the analogue of HF ``get_rope_index``);
* the per-section channel interleave of ``apply_multimodal_rotary_pos_emb``
  is applied to the COS/SIN TABLES once (:func:`mrope_tables`), after which
  the standard neox rotation in nn/modules.py is bit-identical to HF's —
  so quantization, fusion, TP sharding and the serving runtime all reuse
  the text-model code paths unchanged.

For text-only inputs all three position streams coincide and M-RoPE
degenerates to 1-D RoPE, which is why AWQ calibration on text uses the
plain qwen2 path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules


def _lin(p: Dict, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def _act(name: str, x: jax.Array) -> jax.Array:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return modules.act_fn(name, x)


# --------------------------------------------------------------------------
# Vision tower
# --------------------------------------------------------------------------

def _vision_rot_tables(grid_thw: Sequence[Tuple[int, int, int]],
                       head_dim: int, spatial_merge_size: int,
                       theta: float = 10000.0) -> np.ndarray:
    """2-D rotary table [seq, head_dim/2] (HF ``rot_pos_emb``): per patch,
    the first half of the rotary channels encodes its height index, the
    second its width index, with indices walked in spatial-merge-block
    order. Static given the (python) grid sizes."""
    dim = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    tables = []
    for t, h, w in grid_thw:
        s = spatial_merge_size
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = hpos.reshape(h // s, s, w // s, s).transpose(0, 2, 1, 3).ravel()
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = wpos.reshape(h // s, s, w // s, s).transpose(0, 2, 1, 3).ravel()
        freqs_h = hpos[:, None] * inv_freq[None, :]
        freqs_w = wpos[:, None] * inv_freq[None, :]
        per_t = np.concatenate([freqs_h, freqs_w], axis=1)  # [h*w, hd/2]
        tables.append(np.tile(per_t, (t, 1)))
    return np.concatenate(tables, axis=0).astype(np.float32)


def _block_diag_mask(lengths: Sequence[int]) -> np.ndarray:
    """Additive [1, 1, S, S] mask allowing attention only within each
    image's patch run (HF splits on cu_seqlens instead)."""
    total = int(sum(lengths))
    m = np.full((total, total), -1e30, np.float32)
    off = 0
    for n in lengths:
        m[off:off + n, off:off + n] = 0.0
        off += n
    return m[None, None]


def qwen2vl_vision_features(
    vcfg: Dict[str, Any],
    vp: Dict[str, Any],
    patches: jax.Array,  # [N, C*tps*ps*ps] flattened patches (HF processor)
    grid_thw: Sequence[Tuple[int, int, int]],  # python ints (static)
) -> jax.Array:
    """Qwen2-VL vision tower -> merged features [N / sms^2, hidden_size].

    Numerics-matched to HF ``Qwen2VisionTransformerPretrainedModel``:
    full-stride Conv3d patch embed == one matmul; 2-D rotary on h/w
    indices; full attention within each image; spatial PatchMerger.
    """
    embed = vcfg["embed_dim"]
    nh = vcfg["num_heads"]
    hd = embed // nh
    sms = vcfg.get("spatial_merge_size", 2)
    act = vcfg.get("hidden_act", "quick_gelu")

    x = jnp.dot(patches, vp["patch_embed"]["kernel"].astype(patches.dtype),
                preferred_element_type=jnp.float32).astype(patches.dtype)

    rot = _vision_rot_tables(grid_thw, hd, sms)  # [seq, hd/2]
    cos = jnp.asarray(np.cos(rot))[None]  # [1, seq, hd/2]
    sin = jnp.asarray(np.sin(rot))[None]
    lengths = [t * h * w for t, h, w in grid_thw]
    mask = jnp.asarray(_block_diag_mask(lengths))

    seq = x.shape[0]
    for bp in vp["blocks"]:
        h = modules.layer_norm(x, bp["norm1"]["weight"], bp["norm1"]["bias"],
                               1e-6)
        qkv = _lin(bp["qkv"], h).reshape(seq, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # [seq, nh, hd]
        q = modules.apply_rope(q[None], cos, sin, hd, style="neox")
        k = modules.apply_rope(k[None], cos, sin, hd, style="neox")
        scores = jnp.einsum("bshd,bthd->bhst", q, k[None][0],
                            preferred_element_type=jnp.float32) * hd**-0.5
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhst,bthd->bshd", probs, v[None]).reshape(seq, embed)
        x = x + _lin(bp["proj"], attn)
        h = modules.layer_norm(x, bp["norm2"]["weight"], bp["norm2"]["bias"],
                               1e-6)
        x = x + _lin(bp["fc2"], _act(act, _lin(bp["fc1"], h)))

    # PatchMerger: LN then concat sms^2 neighbors then 2-layer MLP
    m = vp["merger"]
    h = modules.layer_norm(x, m["ln_q"]["weight"], m["ln_q"]["bias"], 1e-6)
    h = h.reshape(-1, embed * sms * sms)
    return _lin(m["mlp2"], jax.nn.gelu(_lin(m["mlp0"], h), approximate=False))


# --------------------------------------------------------------------------
# M-RoPE (language side)
# --------------------------------------------------------------------------

def mrope_position_ids(
    input_ids: np.ndarray,  # [B, S] host-side (concrete) ids
    grid_thw: Sequence[Tuple[int, int, int]],  # per vision block, in order
    *,
    image_token_id: int,
    spatial_merge_size: int,
    video_token_id: Optional[int] = None,
    second_per_grid_ts: Optional[Sequence[float]] = None,
    tokens_per_second: Optional[float] = None,
) -> np.ndarray:
    """3-D position ids [3, B, S] (HF ``get_rope_index``): vision runs get
    (temporal, height, width) grids, text runs advance all three streams
    together from max(previous)+1. grid h/w are in patches; the LLM sees
    them divided by the spatial merge size.

    Video placeholders (``video_token_id``) are handled like image runs
    except for the temporal stream: Qwen2.5-VL scales it to absolute time
    (HF ``Qwen2_5_VLModel.get_rope_index``:
    ``t_index = arange(t) * second_per_grid_t * tokens_per_second``) when
    ``tokens_per_second`` is given; Qwen2-VL (``tokens_per_second=None``)
    keeps the raw frame index. ``second_per_grid_ts`` aligns with
    ``grid_thw`` (entries for image blocks are ignored; HF uses 0 there,
    which coincides with arange(1) for t=1 images)."""
    input_ids = np.asarray(input_ids)
    b, s = input_ids.shape
    out = np.zeros((3, b, s), np.int64)
    vision_ids = [image_token_id]
    if video_token_id is not None:
        vision_ids.append(video_token_id)
    gi = 0
    for i in range(b):
        ids = input_ids[i]
        pos_chunks: List[np.ndarray] = []
        st = 0
        nxt = 0  # next free position value
        while True:
            img = np.nonzero(np.isin(ids[st:], vision_ids))[0]
            if img.size == 0:
                break
            ed = st + int(img[0])
            if ed > st:  # leading text
                text = np.arange(ed - st) + nxt
                pos_chunks.append(np.broadcast_to(text, (3, ed - st)))
                nxt = int(text[-1]) + 1
            t, h, w = grid_thw[gi]
            is_video = (video_token_id is not None
                        and ids[ed] == video_token_id)
            lh, lw = h // spatial_merge_size, w // spatial_merge_size
            if tokens_per_second is not None and is_video:
                spg = (second_per_grid_ts[gi]
                       if second_per_grid_ts is not None else 1.0)
                # HF quirk preserved: get_rope_index casts second_per_grid_t
                # to range_tensor's int64 dtype BEFORE multiplying
                # (modeling_qwen2_5_vl.py ``torch.as_tensor(second_per_grid_t,
                # dtype=range_tensor.dtype)``), so fractional grid intervals
                # truncate (2.5 -> 2, 0.5 -> 0). Parity > prettiness.
                t_index = (np.arange(t) * int(spg)
                           * float(tokens_per_second)).astype(np.int64)
            else:
                t_index = np.arange(t)
            gi += 1
            tt = np.repeat(t_index, lh * lw)
            hh = np.tile(np.repeat(np.arange(lh), lw), t)
            ww = np.tile(np.arange(lw), t * lh)
            pos_chunks.append(np.stack([tt, hh, ww]) + nxt)
            nxt = nxt + max(int(t_index[-1]) + 1 if t else 1, lh, lw)
            st = ed + t * lh * lw
        if st < s:
            text = np.arange(s - st) + nxt
            pos_chunks.append(np.broadcast_to(text, (3, s - st)))
        out[:, i] = np.concatenate(pos_chunks, axis=1)
    return out


def mrope_tables(cfg: ModelConfig, positions3,
                 mrope_section: Sequence[int]) -> Tuple[jax.Array, jax.Array]:
    """cos/sin [B, S, rot/2] with the M-RoPE channel interleave pre-applied.

    HF's ``apply_multimodal_rotary_pos_emb`` splits the (duplicated-half)
    head_dim into 2x mrope_section chunks and picks stream i%3 for chunk i;
    since both halves repeat the same pattern, mixing the HALF-tables once
    here makes the standard neox rotation exactly equivalent.
    """
    inv_freq, attention_scaling = modules.rope_params(cfg)
    pos = jnp.asarray(positions3, jnp.float32)  # [3, B, S]
    angles = pos[..., None] * jnp.asarray(inv_freq)  # [3, B, S, rot/2]
    sections = list(mrope_section)
    assert sum(sections) == angles.shape[-1], (sections, angles.shape)
    pieces = []
    off = 0
    for i, n in enumerate(sections):
        pieces.append(angles[i % 3, ..., off:off + n])
        off += n
    mixed = jnp.concatenate(pieces, axis=-1)  # [B, S, rot/2]
    return jnp.cos(mixed) * attention_scaling, jnp.sin(mixed) * attention_scaling


def multimodal_calib_inputs(
    cfg: ModelConfig,
    vcfg: Dict[str, Any],
    params: Dict[str, Any],  # {"visual", "language_model"}
    input_ids,
    patches: Optional[jax.Array] = None,
    grid_thw: Sequence[Tuple[int, int, int]] = (),
    *,
    image_token_id: int,
    video_token_id: Optional[int] = None,
    second_per_grid_ts: Optional[Sequence[float]] = None,
    is_25: bool = False,
    dtype=jnp.float32,
):
    """The multimodal LM prelude -> (x [B, S, H], cos, sin).

    Embeds tokens, runs the vision tower, splices features at the
    image/video placeholder positions, and builds the M-RoPE tables. Both
    the forwards below and image-conditioned AWQ calibration
    (AwqQuantizer(calib_inputs=..., calib_rope=...); reference recipe
    docs/examples.md:267-420) consume it."""
    ids_np = np.asarray(input_ids)
    lm = params["language_model"]
    x = modules.embed(cfg, lm, jnp.asarray(ids_np), dtype)

    if patches is not None and len(grid_thw):
        feats_fn = qwen25vl_vision_features if is_25 else \
            qwen2vl_vision_features
        feats = feats_fn(vcfg, params["visual"], patches,
                         grid_thw).astype(x.dtype)
        vis_ids = [image_token_id] + (
            [video_token_id] if video_token_id is not None else [])
        pos = np.nonzero(np.isin(ids_np.reshape(-1), vis_ids))
        b, s, h = x.shape
        x = x.reshape(b * s, h).at[pos[0]].set(feats).reshape(b, s, h)

    positions3 = mrope_position_ids(
        ids_np, grid_thw, image_token_id=image_token_id,
        video_token_id=video_token_id,
        second_per_grid_ts=second_per_grid_ts,
        tokens_per_second=(vcfg.get("tokens_per_second", 2)
                           if is_25 else None),
        spatial_merge_size=vcfg.get("spatial_merge_size", 2))
    section = (cfg.rope_scaling_dict or {}).get("mrope_section")
    if section is None:  # no section config: plain 1-D rope on stream 0
        cos, sin = modules.rope_tables(cfg, jnp.asarray(positions3[0]))
    else:
        cos, sin = mrope_tables(cfg, positions3, section)
    return x, cos, sin


def qwen2vl_forward(
    cfg: ModelConfig,
    vcfg: Dict[str, Any],
    params: Dict[str, Any],  # {"visual", "language_model"}
    input_ids,  # [B, S] host ids (vision splice positions are data-dependent)
    patches: Optional[jax.Array] = None,
    grid_thw: Sequence[Tuple[int, int, int]] = (),
    *,
    image_token_id: int,
    video_token_id: Optional[int] = None,
    method: str = "auto",
    dtype=jnp.float32,
) -> jax.Array:
    """Full multimodal forward -> logits [B, S, V]."""
    ids_np = np.asarray(input_ids)
    lm = params["language_model"]
    x, cos, sin = multimodal_calib_inputs(
        cfg, vcfg, params, ids_np, patches, grid_thw,
        image_token_id=image_token_id, video_token_id=video_token_id,
        dtype=dtype)
    s = ids_np.shape[1]
    mask = modules.causal_mask(s, sliding_window=cfg.sliding_window)
    for lp in lm["layers"]:
        x, _ = modules.block(cfg, lp, x, cos, sin, mask, None, None, method)
    return modules.logits_fn(cfg, lm, x, method)


# --------------------------------------------------------------------------
# state dict <-> params
# --------------------------------------------------------------------------

_VIS_PREFIXES = ("model.visual.", "visual.")  # new / legacy HF key roots
_LM_PREFIXES = ("model.language_model.", "model.")


def _find_prefix(sd, options, probe):
    for p in options:
        if any(k.startswith(p + probe) for k in sd):
            return p
    raise KeyError(f"none of {options} + {probe}* found")


def qwen2vl_params_from_state_dict(cfg: ModelConfig, vcfg: Dict[str, Any],
                                   sd: Dict[str, np.ndarray]) -> Dict:
    """HF Qwen2-VL state dict -> {"visual": ..., "language_model": ...}.
    Handles both the current nesting (model.language_model / model.visual)
    and legacy checkpoints (model. / visual.)."""
    from autoawq_tpu.io.hf import params_from_state_dict

    vis = _find_prefix(sd, _VIS_PREFIXES, "patch_embed")
    lmp = _find_prefix(sd, _LM_PREFIXES, "embed_tokens")

    lm_sd = {}
    for k, v in sd.items():
        if k.startswith(vis):
            continue
        if k.startswith(lmp):
            lm_sd["model." + k[len(lmp):]] = v
        else:
            lm_sd[k] = v  # lm_head
    lm = params_from_state_dict(cfg, lm_sd)

    def norm_p(name):
        return {"weight": np.asarray(sd[vis + name + ".weight"]),
                "bias": np.asarray(sd[vis + name + ".bias"])}

    def lin_p(name):
        p = {"kernel": np.ascontiguousarray(
            np.asarray(sd[vis + name + ".weight"]).T)}
        if vis + name + ".bias" in sd:
            p["bias"] = np.asarray(sd[vis + name + ".bias"])
        return p

    pe = np.asarray(sd[vis + "patch_embed.proj.weight"])  # [E, C, tps, ps, ps]
    visual: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(pe.reshape(pe.shape[0], -1).T)},
        "blocks": [],
        "merger": {
            "ln_q": norm_p("merger.ln_q"),
            "mlp0": lin_p("merger.mlp.0"),
            "mlp2": lin_p("merger.mlp.2"),
        },
    }
    depth = vcfg["depth"]
    for i in range(depth):
        visual["blocks"].append({
            "norm1": norm_p(f"blocks.{i}.norm1"),
            "norm2": norm_p(f"blocks.{i}.norm2"),
            "qkv": lin_p(f"blocks.{i}.attn.qkv"),
            "proj": lin_p(f"blocks.{i}.attn.proj"),
            "fc1": lin_p(f"blocks.{i}.mlp.fc1"),
            "fc2": lin_p(f"blocks.{i}.mlp.fc2"),
        })
    return {"visual": visual, "language_model": lm}


def qwen2vl_state_dict_from_params(cfg: ModelConfig, vcfg: Dict[str, Any],
                                   params: Dict[str, Any],
                                   dtype=np.float16) -> Dict[str, np.ndarray]:
    """Inverse of :func:`qwen2vl_params_from_state_dict` (current HF
    nesting; quantized LM tensors in AutoAWQ layout)."""
    from autoawq_tpu.io.hf import role_out_features, state_dict_from_params

    lm_sd = state_dict_from_params(cfg, params["language_model"],
                                   role_out_features(cfg), dtype)
    sd = {}
    for k, v in lm_sd.items():
        if k.startswith("model."):
            sd["model.language_model." + k[len("model."):]] = v
        else:
            sd[k] = v

    vis = params["visual"]
    vroot = "model.visual."

    def put_norm(name, p):
        sd[vroot + name + ".weight"] = np.asarray(p["weight"]).astype(dtype)
        sd[vroot + name + ".bias"] = np.asarray(p["bias"]).astype(dtype)

    def put_lin(name, p):
        sd[vroot + name + ".weight"] = np.ascontiguousarray(
            np.asarray(p["kernel"]).T).astype(dtype)
        if p.get("bias") is not None:
            sd[vroot + name + ".bias"] = np.asarray(p["bias"]).astype(dtype)

    pe = np.asarray(vis["patch_embed"]["kernel"]).T  # [E, C*tps*ps*ps]
    tps, ps = vcfg.get("temporal_patch_size", 2), vcfg["patch_size"]
    c = vcfg.get("in_channels", 3)
    sd[vroot + "patch_embed.proj.weight"] = np.ascontiguousarray(
        pe.reshape(pe.shape[0], c, tps, ps, ps)).astype(dtype)
    for i, bp in enumerate(vis["blocks"]):
        put_norm(f"blocks.{i}.norm1", bp["norm1"])
        put_norm(f"blocks.{i}.norm2", bp["norm2"])
        put_lin(f"blocks.{i}.attn.qkv", bp["qkv"])
        put_lin(f"blocks.{i}.attn.proj", bp["proj"])
        put_lin(f"blocks.{i}.mlp.fc1", bp["fc1"])
        put_lin(f"blocks.{i}.mlp.fc2", bp["fc2"])
    put_norm("merger.ln_q", vis["merger"]["ln_q"])
    put_lin("merger.mlp.0", vis["merger"]["mlp0"])
    put_lin("merger.mlp.2", vis["merger"]["mlp2"])
    return sd


# --------------------------------------------------------------------------
# Qwen2.5-VL vision tower (window attention + RMSNorm + gated MLP)
# --------------------------------------------------------------------------

def _window_index(grid_thw, window_size: int, spatial_merge_size: int,
                  patch_size: int):
    """HF ``get_window_index``: permutation of spatial-merge units into
    window order + cumulative window lengths (in patches). Host-side."""
    smu = spatial_merge_size * spatial_merge_size
    vit_ws = window_size // spatial_merge_size // patch_size
    index_all: List[np.ndarray] = []
    cu = [0]
    base = 0
    for t, h, w in grid_thw:
        lh, lw = h // spatial_merge_size, w // spatial_merge_size
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_ws
        pad_w = (-lw) % vit_ws
        nwh, nww = (lh + pad_h) // vit_ws, (lw + pad_w) // vit_ws
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = idx
        padded = padded.reshape(t, nwh, vit_ws, nww, vit_ws)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(
            t, nwh * nww, vit_ws, vit_ws)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        index_all.append(flat[flat != -100] + base)
        for s in np.cumsum(seqlens) * smu + cu[-1]:
            cu.append(int(s))
        base += t * lh * lw
    cu_unique = [cu[0]] + [b for a, b in zip(cu, cu[1:]) if b != a]
    return np.concatenate(index_all), cu_unique


def _cu_mask(cu: Sequence[int]) -> np.ndarray:
    lengths = [b - a for a, b in zip(cu, cu[1:])]
    return _block_diag_mask(lengths)


def qwen25vl_vision_features(
    vcfg: Dict[str, Any],
    vp: Dict[str, Any],
    patches: jax.Array,  # [N, C*tps*ps*ps]
    grid_thw: Sequence[Tuple[int, int, int]],
) -> jax.Array:
    """Qwen2.5-VL tower (HF ``Qwen2_5_VisionTransformer``): window
    attention everywhere except ``fullatt_block_indexes``, RMSNorm blocks,
    SwiGLU vision MLP, window-ordered processing with a final inverse
    permutation."""
    embed = vcfg["hidden_size"]
    nh = vcfg["num_heads"]
    hd = embed // nh
    sms = vcfg.get("spatial_merge_size", 2)
    smu = sms * sms
    act = vcfg.get("hidden_act", "silu")
    eps = 1e-6

    x = jnp.dot(patches, vp["patch_embed"]["kernel"].astype(patches.dtype),
                preferred_element_type=jnp.float32).astype(patches.dtype)
    seq = x.shape[0]

    rot = _vision_rot_tables(grid_thw, hd, sms)
    win_idx, cu_win = _window_index(
        grid_thw, vcfg["window_size"], sms, vcfg["patch_size"])
    # reorder patches (and their rotary rows) into window order, at
    # spatial-merge-unit granularity
    perm = (win_idx[:, None] * smu + np.arange(smu)[None, :]).reshape(-1)
    x = x[jnp.asarray(perm)]
    rot = rot[perm]
    cos = jnp.asarray(np.cos(rot))[None]
    sin = jnp.asarray(np.sin(rot))[None]

    lengths = [t * h * w for t, h, w in grid_thw]
    cu_full = np.concatenate([[0], np.cumsum(lengths)])
    full_mask = jnp.asarray(_cu_mask(list(cu_full)))
    win_mask = jnp.asarray(_cu_mask(cu_win))
    fullatt = set(vcfg.get("fullatt_block_indexes", ()))

    for i, bp in enumerate(vp["blocks"]):
        mask = full_mask if i in fullatt else win_mask
        h = modules.rms_norm(x, bp["norm1"]["weight"], eps)
        qkv = _lin(bp["qkv"], h).reshape(seq, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = modules.apply_rope(q[None], cos, sin, hd, style="neox")
        k = modules.apply_rope(k[None], cos, sin, hd, style="neox")
        scores = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhst,bthd->bshd", probs, v[None]).reshape(seq, embed)
        x = x + _lin(bp["proj"], attn)
        h = modules.rms_norm(x, bp["norm2"]["weight"], eps)
        g = _act(act, _lin(bp["gate_proj"], h)) * _lin(bp["up_proj"], h)
        x = x + _lin(bp["down_proj"], g)

    m = vp["merger"]
    h = modules.rms_norm(x, m["ln_q"]["weight"], eps)
    h = h.reshape(-1, embed * smu)
    out = _lin(m["mlp2"], jax.nn.gelu(_lin(m["mlp0"], h), approximate=False))
    inv = np.argsort(win_idx)  # undo the window permutation (merged units)
    return out[jnp.asarray(inv)]


def qwen25vl_params_from_state_dict(cfg: ModelConfig, vcfg: Dict[str, Any],
                                    sd: Dict[str, np.ndarray]) -> Dict:
    """HF Qwen2.5-VL state dict -> {"visual", "language_model"}."""
    from autoawq_tpu.io.hf import params_from_state_dict

    vis = _find_prefix(sd, _VIS_PREFIXES, "patch_embed")
    lmp = _find_prefix(sd, _LM_PREFIXES, "embed_tokens")
    lm_sd = {}
    for k, v in sd.items():
        if k.startswith(vis):
            continue
        if k.startswith(lmp):
            lm_sd["model." + k[len(lmp):]] = v
        else:
            lm_sd[k] = v
    lm = params_from_state_dict(cfg, lm_sd)

    def rms_p(name):
        return {"weight": np.asarray(sd[vis + name + ".weight"])}

    def lin_p(name):
        p = {"kernel": np.ascontiguousarray(
            np.asarray(sd[vis + name + ".weight"]).T)}
        if vis + name + ".bias" in sd:
            p["bias"] = np.asarray(sd[vis + name + ".bias"])
        return p

    pe = np.asarray(sd[vis + "patch_embed.proj.weight"])
    visual: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(pe.reshape(pe.shape[0], -1).T)},
        "blocks": [],
        "merger": {
            "ln_q": rms_p("merger.ln_q"),
            "mlp0": lin_p("merger.mlp.0"),
            "mlp2": lin_p("merger.mlp.2"),
        },
    }
    for i in range(vcfg["depth"]):
        visual["blocks"].append({
            "norm1": rms_p(f"blocks.{i}.norm1"),
            "norm2": rms_p(f"blocks.{i}.norm2"),
            "qkv": lin_p(f"blocks.{i}.attn.qkv"),
            "proj": lin_p(f"blocks.{i}.attn.proj"),
            "gate_proj": lin_p(f"blocks.{i}.mlp.gate_proj"),
            "up_proj": lin_p(f"blocks.{i}.mlp.up_proj"),
            "down_proj": lin_p(f"blocks.{i}.mlp.down_proj"),
        })
    return {"visual": visual, "language_model": lm}


def qwen25vl_forward(
    cfg: ModelConfig,
    vcfg: Dict[str, Any],
    params: Dict[str, Any],
    input_ids,
    patches: Optional[jax.Array] = None,
    grid_thw: Sequence[Tuple[int, int, int]] = (),
    *,
    image_token_id: int,
    video_token_id: Optional[int] = None,
    second_per_grid_ts: Optional[Sequence[float]] = None,
    method: str = "auto",
    dtype=jnp.float32,
) -> jax.Array:
    """Qwen2.5-VL multimodal forward -> logits (same M-RoPE LM as 2.0,
    except the video temporal stream is scaled to absolute time via
    ``tokens_per_second`` from the vision config — HF ``get_rope_index``)."""
    ids_np = np.asarray(input_ids)
    lm = params["language_model"]
    x, cos, sin = multimodal_calib_inputs(
        cfg, vcfg, params, ids_np, patches, grid_thw,
        image_token_id=image_token_id, video_token_id=video_token_id,
        second_per_grid_ts=second_per_grid_ts, is_25=True, dtype=dtype)
    s = ids_np.shape[1]
    mask = modules.causal_mask(s, sliding_window=cfg.sliding_window)
    for lp in lm["layers"]:
        x, _ = modules.block(cfg, lp, x, cos, sin, mask, None, None, method)
    return modules.logits_fn(cfg, lm, x, method)
