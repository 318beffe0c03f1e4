"""Qwen2.5-Omni audio tower: functional JAX Whisper-style encoder.

The reference moves the audio tower to the device during omni calibration
(awq/models/qwen2_5_omni.py:24-33) and leaves it fp16; here the tower's
weights ride ``params["_extra"]`` (io/hf.py) and this module gives them a
forward so audio features can drive multimodal calibration / inference.

Semantics mirror HF ``Qwen2_5OmniAudioEncoder``: mel features are cut into
``n_window*2``-frame chunks, run through two convs (the second stride-2),
given per-chunk sinusoid positions, and attended WITHIN each chunk only
(HF flattens chunks into a ragged sequence with a block-diagonal mask; we
keep chunks batched — identical math, TPU-friendly static shapes). Valid
tokens are then re-flattened, average-pooled in pairs, layer-normed and
projected to the LM width.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _ln(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) / jnp.sqrt(var + eps) * w + b).astype(x.dtype)


def _linear(x, w, b=None):
    y = jnp.dot(x, w.T.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def sinusoid_positions(length: int, channels: int,
                       max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper sinusoid table [length, channels] (sin | cos halves)."""
    inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _attention(x, mask, w, prefix, n_heads):
    n, l, d = x.shape
    hd = d // n_heads
    q = _linear(x, w[f"{prefix}.q_proj.weight"], w[f"{prefix}.q_proj.bias"])
    k = _linear(x, w[f"{prefix}.k_proj.weight"])  # Whisper: k has no bias
    v = _linear(x, w[f"{prefix}.v_proj.weight"], w[f"{prefix}.v_proj.bias"])
    q = q.reshape(n, l, n_heads, hd).swapaxes(1, 2)
    k = k.reshape(n, l, n_heads, hd).swapaxes(1, 2)
    v = v.reshape(n, l, n_heads, hd).swapaxes(1, 2)
    s = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                   preferred_element_type=jnp.float32) * hd ** -0.5
    s = s + mask  # [N, 1, 1, L] padding mask
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("nhqk,nhkd->nhqd", p, v).swapaxes(1, 2).reshape(n, l, d)
    return _linear(o, w[f"{prefix}.out_proj.weight"],
                   w[f"{prefix}.out_proj.bias"])


def audio_encoder(
    acfg: Dict[str, Any],
    weights: Dict[str, jax.Array],  # "audio_tower."-stripped tensor names
    input_features: jax.Array,  # [num_mel_bins, T] mel spectrogram
    feature_len: int,
) -> jax.Array:
    """-> [n_audio_tokens, output_dim] embeddings for the thinker LM."""
    d = int(acfg["d_model"])
    n_heads = int(acfg["encoder_attention_heads"])
    n_layers = int(acfg["encoder_layers"])
    n2 = 2 * int(acfg.get("n_window", 50))
    w = weights

    # chunking (reference: chunk_lengths of n_window*2 mel frames, short tail)
    t = int(feature_len)
    lens = [n2] * (t // n2)
    if t % n2:
        lens.append(t % n2)
    lmax = max(lens)
    chunks = np.zeros((len(lens), input_features.shape[0], lmax), np.float32)
    feats = np.asarray(input_features, np.float32)
    off = 0
    for i, ln_i in enumerate(lens):
        chunks[i, :, :ln_i] = feats[:, off : off + ln_i]
        off += ln_i
    x = jnp.asarray(chunks)
    mask1 = jnp.asarray(
        np.stack([np.arange(lmax) < ln_i for ln_i in lens])[:, None, :]
        .astype(np.float32))

    dn = ("NCH", "OIH", "NCH")
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(w["conv1.weight"]), (1,), [(1, 1)],
        dimension_numbers=dn) + jnp.asarray(w["conv1.bias"])[None, :, None]
    x = jax.nn.gelu(x, approximate=False) * mask1
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(w["conv2.weight"]), (2,), [(1, 1)],
        dimension_numbers=dn) + jnp.asarray(w["conv2.bias"])[None, :, None]
    x = jax.nn.gelu(x, approximate=False).swapaxes(1, 2)  # [N, L2, D]

    l2 = x.shape[1]
    x = x + jnp.asarray(sinusoid_positions(l2, d))[None]
    lens2 = [(ln_i - 1) // 2 + 1 for ln_i in lens]
    amask = jnp.asarray(np.stack(
        [np.where(np.arange(l2) < ln_i, 0.0, -1e30) for ln_i in lens2]
    ).astype(np.float32))[:, None, None, :]

    for i in range(n_layers):
        pre = f"layers.{i}"
        h = _ln(x, w[f"{pre}.self_attn_layer_norm.weight"],
                w[f"{pre}.self_attn_layer_norm.bias"])
        x = x + _attention(h, amask, w, f"{pre}.self_attn", n_heads)
        h = _ln(x, w[f"{pre}.final_layer_norm.weight"],
                w[f"{pre}.final_layer_norm.bias"])
        h = jax.nn.gelu(_linear(h, w[f"{pre}.fc1.weight"],
                                w[f"{pre}.fc1.bias"]), approximate=False)
        x = x + _linear(h, w[f"{pre}.fc2.weight"], w[f"{pre}.fc2.bias"])

    # re-flatten valid tokens, pool pairs across the whole audio, ln, proj
    rows = jnp.concatenate([x[i, :ln_i] for i, ln_i in enumerate(lens2)])
    n_pairs = rows.shape[0] // 2
    pooled = rows[: 2 * n_pairs].reshape(n_pairs, 2, d).mean(axis=1)
    pooled = _ln(pooled, w["ln_post.weight"], w["ln_post.bias"])
    return _linear(pooled, w["proj.weight"], w["proj.bias"])


def extra_audio_weights(params: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Pull the audio tower out of params["_extra"] (prefix-stripped)."""
    extra = params.get("_extra", {})
    return {k[len("audio_tower."):]: v for k, v in extra.items()
            if k.startswith("audio_tower.")}
