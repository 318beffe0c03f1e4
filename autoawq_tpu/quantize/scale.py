"""Folding AWQ scales and clip thresholds into the param pytree.

Functional re-expression of the reference's in-place weight surgery
(awq/quantize/scale.py:24-164): the per-channel scale s is folded into the
*previous* op (divide) and the target linears (multiply), so the quantized
model needs no extra runtime ops. Orientation note: our kernels are [K, N]
(in, out); the reference's torch weights are [O, I]. "Divide prev output
channels" therefore divides prev kernel *columns*; "multiply fc input
channels" multiplies target kernel *rows*.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from autoawq_tpu.utils.tree import get_by_path


def scale_norm_fcs(layer_params: Dict, prev_path: str, fc_paths: List[str],
                   scales: jnp.ndarray, norm_offset: bool = False):
    """prev is an RMSNorm/LayerNorm: w /= s (gemma: (1+w)/s - 1,
    awq/quantize/scale.py:96-99); fcs: kernel rows *= s."""
    norm = get_by_path(layer_params, prev_path)
    w = norm["weight"].astype(jnp.float32)
    if norm_offset:
        norm["weight"] = ((1.0 + w) / scales - 1.0).astype(norm["weight"].dtype)
    else:
        norm["weight"] = (w / scales).astype(norm["weight"].dtype)
    if norm.get("bias") is not None:
        norm["bias"] = (norm["bias"].astype(jnp.float32) / scales).astype(
            norm["bias"].dtype
        )
    _scale_fcs_up(layer_params, fc_paths, scales)


def scale_fc_fcs(layer_params: Dict, prev_path: str, fc_paths: List[str],
                 scales: jnp.ndarray):
    """prev is a linear: its last len(s) output columns /= s
    (awq/quantize/scale.py:123 handles fused qkv->o by scaling only the
    trailing rows); fcs: kernel rows *= s."""
    prev = get_by_path(layer_params, prev_path)
    k = prev["kernel"].astype(jnp.float32)
    n = scales.shape[0]
    prev["kernel"] = k.at[:, -n:].divide(scales[None, :]).astype(prev["kernel"].dtype)
    if prev.get("bias") is not None:
        b = prev["bias"].astype(jnp.float32)
        prev["bias"] = b.at[-n:].divide(scales).astype(prev["bias"].dtype)
    _scale_fcs_up(layer_params, fc_paths, scales)


def scale_act_fcs(layer_params: Dict, act_parent_path: str, fc_paths: List[str],
                  scales: jnp.ndarray):
    """prev is a GELU-family activation: store an act_scale divisor on the
    parent module (ScaledActivation equivalent, awq/modules/act.py:4) and
    multiply the fc rows."""
    parent = get_by_path(layer_params, act_parent_path) if act_parent_path else layer_params
    parent["act_scale"] = scales.astype(jnp.float32)
    _scale_fcs_up(layer_params, fc_paths, scales)


def _scale_fcs_up(layer_params: Dict, fc_paths: List[str], scales: jnp.ndarray):
    for path in fc_paths:
        fc = get_by_path(layer_params, path)
        k = fc["kernel"].astype(jnp.float32)
        fc["kernel"] = (k * scales[:, None]).astype(fc["kernel"].dtype)


def apply_scale(layer_params: Dict, group, scales: jnp.ndarray,
                taps: Optional[Dict] = None, norm_offset: bool = False):
    """Fold one scale group; also rescale cached input features so the clip
    search sees post-scaling activations (awq/quantize/scale.py:74-79)."""
    if group.prev_kind == "norm":
        scale_norm_fcs(layer_params, group.prev_op, group.layers, scales,
                       norm_offset)
    elif group.prev_kind == "fc":
        scale_fc_fcs(layer_params, group.prev_op, group.layers, scales)
    elif group.prev_kind == "act":
        scale_act_fcs(layer_params, group.prev_op, group.layers, scales)
    else:
        raise NotImplementedError(f"prev_kind {group.prev_kind}")
    if taps is not None:
        for path in group.layers:
            if path in taps:
                taps[path] = (taps[path] / scales.astype(taps[path].dtype))


def apply_clip(layer_params: Dict, path: str, max_val: jnp.ndarray):
    """Clamp a linear's weights per group (awq/quantize/scale.py:24-34).
    max_val: [K//g, N] in our orientation."""
    fc = get_by_path(layer_params, path)
    w = fc["kernel"]
    k, n = w.shape
    g = k // max_val.shape[0]
    wg = w.astype(jnp.float32).reshape(-1, g, n)
    mv = max_val[:, None, :]
    fc["kernel"] = jnp.clip(wg, -mv, mv).reshape(k, n).astype(w.dtype)
