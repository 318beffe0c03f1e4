"""Load-time operator fusion: qkv and gate/up weight concatenation.

The reference fuses q/k/v (and MoE expert stacks) by concatenating packed
buffers at ``from_quantized`` time (awq/utils/fused_utils.py:45-142,
``fuse_qkv``) so decode launches one kernel instead of three. Here fusion is
a host-side transform on the param pytree: packed planar weights are
unpacked, concatenated along logical output columns, and repacked (lane
padding is per-tensor, so packed buffers can't just be stacked). Checkpoints
always store the *unfused* AutoAWQ layout; fusion is applied after load.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from autoawq_tpu.core import packing
from autoawq_tpu.models.config import ModelConfig


def _fuse_quant(lins: List[Dict[str, Any]], ns: List[int]) -> Dict[str, Any]:
    q4 = [packing.unpack_planar(np.asarray(p["qweight"]), n)
          for p, n in zip(lins, ns)]
    sc = [np.asarray(p["scales"])[:, :n] for p, n in zip(lins, ns)]
    out = {
        "qweight": packing.pack_planar(np.concatenate(q4, axis=1)),
        "scales": packing.pad_scales_planar(np.concatenate(sc, axis=1)),
    }
    if any("qzeros" in p for p in lins):
        # mixed symmetric/asymmetric members: synthesize constant-8 zeros
        z4 = [
            packing.unpack_planar(np.asarray(p["qzeros"]), n,
                                  rows=np.asarray(p["scales"]).shape[0])
            if "qzeros" in p
            else np.full((np.asarray(p["scales"]).shape[0], n), 8, np.int32)
            for p, n in zip(lins, ns)
        ]
        out["qzeros"] = packing.pack_planar(np.concatenate(z4, axis=1))
    if any(p.get("bias") is not None for p in lins):
        out["bias"] = np.concatenate([
            np.asarray(p["bias"]) if p.get("bias") is not None
            else np.zeros(n, np.float32)
            for p, n in zip(lins, ns)
        ])
    return out


def _fuse_fp(lins: List[Dict[str, Any]], ns: List[int]) -> Dict[str, Any]:
    out = {"kernel": np.concatenate(
        [np.asarray(p["kernel"]) for p in lins], axis=1)}
    if any(p.get("bias") is not None for p in lins):
        out["bias"] = np.concatenate([
            np.asarray(p["bias"]) if p.get("bias") is not None
            else np.zeros(n, np.float32)
            for p, n in zip(lins, ns)
        ])
    return out


def _fuse(lins, ns):
    if any("lora_a" in p for p in lins):
        raise ValueError("fuse before adding LoRA adapters")
    if "qweight" in lins[0]:
        return _fuse_quant(lins, ns)
    return _fuse_fp(lins, ns)


def fuse_model(cfg: ModelConfig, params: Dict[str, Any],
               stack_experts: bool = True) -> Dict[str, Any]:
    """In-place: replace q/k/v with qkv_proj, gate/up with gate_up_proj, and
    (quantized MoE) stack per-expert weights into [E, ...] tensors for the
    grouped Pallas kernel — the analogue of the reference's
    ``fuse_linears(op=torch.stack)`` expert stacking
    (awq/models/mixtral.py:129-158)."""
    hd, nh, nkv = cfg.head_dim_, cfg.num_attention_heads, cfg.num_key_value_heads
    for lp in params["layers"]:
        attn = lp["self_attn"]
        if "q_proj" in attn and not cfg.is_mla:
            attn["qkv_proj"] = _fuse(
                [attn.pop("q_proj"), attn.pop("k_proj"), attn.pop("v_proj")],
                [nh * hd, nkv * hd, nkv * hd],
            )
        m = lp["mlp"]
        if "gate_proj" in m:
            inter = cfg.intermediate_size
            m["gate_up_proj"] = _fuse(
                [m.pop("gate_proj"), m.pop("up_proj")], [inter, inter]
            )
        for e in m.get("experts", []):
            if "gate_proj" in e:
                inter = cfg.moe_intermediate_size or cfg.intermediate_size
                e["gate_up_proj"] = _fuse(
                    [e.pop("gate_proj"), e.pop("up_proj")], [inter, inter]
                )
        experts = m.get("experts")
        if (stack_experts and experts
                and all("qweight" in e.get("gate_up_proj", {})
                        and "qweight" in e.get("down_proj", {})
                        for e in experts)):
            m["experts_stacked"] = {
                name: _stack_expert_lins([e[name] for e in experts])
                for name in ("gate_up_proj", "down_proj")
            }
            del m["experts"]
    return params


def _split_lin(lin: Dict[str, Any], ns: List[int]) -> List[Dict[str, Any]]:
    """Inverse of ``_fuse``: split one fused LIN back into len(ns) LINs
    along logical output columns (unpack -> slice -> repack, since lane
    padding is per-tensor). Members fused without a bias come back with
    the zero bias the fuse synthesized — numerically identical."""
    if "lora_a" in lin:
        raise ValueError("cannot unfuse a LIN carrying LoRA adapters")
    if "qweight" in lin:
        u = _unpack_lin(lin, sum(ns))
        had_z = "qzeros" in lin
        outs = []
        lo = 0
        for n in ns:
            s = _slice_cols(u, lo, lo + n)
            o = {"qweight": packing.pack_planar(s["qweight"]),
                 "scales": packing.pad_scales_planar(s["scales"])}
            if had_z:
                o["qzeros"] = packing.pack_planar(s["qzeros"])
            if s["bias"] is not None:
                o["bias"] = s["bias"]
            outs.append(o)
            lo += n
        return outs
    outs = []
    lo = 0
    for n in ns:
        o = {"kernel": np.asarray(lin["kernel"])[:, lo:lo + n]}
        if lin.get("bias") is not None:
            o["bias"] = np.asarray(lin["bias"])[lo:lo + n]
        outs.append(o)
        lo += n
    return outs


def unfuse_model(cfg: ModelConfig, params: Dict[str, Any]) -> Dict[str, Any]:
    """In-place inverse of ``fuse_model`` for qkv and gate/up (expert
    stacks are left alone; ``qkv_proj_tp`` side-stacks are dropped — they
    are derived data, rebuildable via ``tp_stack_qkv``). Used by
    parallel/pipeline.to_pipeline: fused column layouts cannot be
    head-sliced for stage-internal Megatron TP, but their per-linear
    equivalents shard fine, so pipelining unfuses instead of rejecting."""
    hd, nh, nkv = (cfg.head_dim_, cfg.num_attention_heads,
                   cfg.num_key_value_heads)
    for lp in params["layers"]:
        attn = lp["self_attn"]
        attn.pop("qkv_proj_tp", None)
        if "qkv_proj" in attn and not cfg.is_mla:
            q, k, v = _split_lin(attn.pop("qkv_proj"),
                                 [nh * hd, nkv * hd, nkv * hd])
            attn["q_proj"], attn["k_proj"], attn["v_proj"] = q, k, v
        m = lp["mlp"]
        if "gate_up_proj" in m:
            inter = cfg.intermediate_size
            m["gate_proj"], m["up_proj"] = _split_lin(
                m.pop("gate_up_proj"), [inter, inter])
        for e in m.get("experts", []):
            if "gate_up_proj" in e:
                inter = cfg.moe_intermediate_size or cfg.intermediate_size
                e["gate_proj"], e["up_proj"] = _split_lin(
                    e.pop("gate_up_proj"), [inter, inter])
    return params


def _unpack_lin(lin: Dict[str, Any], n: int) -> Dict[str, Any]:
    """Unpack a quant LIN to its logical integer grid ONCE (per-chip
    slicing then costs nothing — unpacking inside the tp loop would
    multiply host-side shard() time by tp)."""
    g = np.asarray(lin["scales"]).shape[0]
    return {
        "qweight": packing.unpack_planar(np.asarray(lin["qweight"]), n),
        "scales": np.asarray(lin["scales"])[:, :n],
        "qzeros": (packing.unpack_planar(np.asarray(lin["qzeros"]), n,
                                         rows=g)
                   if "qzeros" in lin else np.full((g, n), 8, np.int32)),
        "bias": (np.asarray(lin["bias"])
                 if lin.get("bias") is not None else None),
    }


def _slice_cols(u: Dict[str, Any], lo: int, hi: int) -> Dict[str, Any]:
    return {
        "qweight": u["qweight"][:, lo:hi],
        "scales": u["scales"][:, lo:hi],
        "qzeros": u["qzeros"][:, lo:hi],
        "bias": None if u["bias"] is None else u["bias"][lo:hi],
    }


def tp_stack_qkv(cfg: ModelConfig, params: Dict[str, Any],
                 tp: int) -> Dict[str, Any]:
    """In-place: add ``qkv_proj_tp`` — a [tp, ...]-stacked PER-CHIP fused
    qkv layout — to every attention block with unfused quantized q/k/v.

    The plain fused ``qkv_proj`` layout ([q|k|v] concatenated then packed)
    cannot be column-sharded: a contiguous 1/tp lane slice mixes one
    chip's q columns with another's k. Re-fusing per chip sidesteps the
    packing granularity entirely — chip i's slice is
    [q_i | k_i | v_i] for ITS nh/tp query and nkv/tp kv heads, packed
    independently (identical padded widths, so the stack is rectangular).
    Sharded on the ``tensor`` axis (parallel/specs.py), this feeds the
    fused attention-step megakernel per chip (ops/tp_attn.py) — the
    TP-capable counterpart of the single-chip ``qkv_proj`` path.

    Requires nh % tp == 0 and nkv % tp == 0 (head-aligned shards).
    """
    hd, nh, nkv = (cfg.head_dim_, cfg.num_attention_heads,
                   cfg.num_key_value_heads)
    if nh % tp or nkv % tp:
        raise ValueError(f"heads ({nh}/{nkv}) not divisible by tp={tp}")
    pq, pk = nh * hd // tp, nkv * hd // tp
    for lp in params["layers"]:
        attn = lp["self_attn"]
        if cfg.is_mla or "q_proj" not in attn \
                or "qweight" not in attn["q_proj"]:
            continue
        q, k, v = attn["q_proj"], attn["k_proj"], attn["v_proj"]
        if any("lora_a" in lin for lin in (q, k, v)):
            # the stack is built from base weights only; baking it would
            # silently DROP the adapters on the TP fused path. Skip —
            # decode falls back to the per-linear sharded kernels, where
            # LoRA applies (same policy as _fuse / fused_attn_step).
            continue
        uq = _unpack_lin(q, nh * hd)
        uk = _unpack_lin(k, nkv * hd)
        uv = _unpack_lin(v, nkv * hd)
        chips = []
        for i in range(tp):
            sq = _slice_cols(uq, i * pq, (i + 1) * pq)
            sk = _slice_cols(uk, i * pk, (i + 1) * pk)
            sv = _slice_cols(uv, i * pk, (i + 1) * pk)
            grid = np.concatenate(
                [sq["qweight"], sk["qweight"], sv["qweight"]], axis=1)
            sc = np.concatenate(
                [sq["scales"], sk["scales"], sv["scales"]], axis=1)
            zc = np.concatenate(
                [sq["qzeros"], sk["qzeros"], sv["qzeros"]], axis=1)
            entry = {
                "qweight": packing.pack_planar(grid),
                "scales": packing.pad_scales_planar(sc),
            }
            if any("qzeros" in lin for lin in (q, k, v)):
                entry["qzeros"] = packing.pack_planar(zc)
            if any(lin.get("bias") is not None for lin in (q, k, v)):
                entry["bias"] = np.concatenate([
                    s["bias"] if s["bias"] is not None
                    else np.zeros(w, np.float32)
                    for s, w in ((sq, pq), (sk, pk), (sv, pk))])
            chips.append(entry)
        attn["qkv_proj_tp"] = {
            key: np.stack([c[key] for c in chips]) for key in chips[0]
        }
    return params


def _stack_expert_lins(lins: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack per-expert quant LINs into [E, ...] tensors. Symmetric experts
    (no qzeros) stack zeros-free; a mixed symmetric/asymmetric population
    synthesizes constant-8 zeros for the symmetric members."""
    out = {
        leaf: np.stack([np.asarray(p[leaf]) for p in lins])
        for leaf in ("qweight", "scales")
    }
    if any("qzeros" in p for p in lins):
        def zeros_of(p):
            if "qzeros" in p:
                return np.asarray(p["qzeros"])
            g, n_pad = np.asarray(p["scales"]).shape
            return packing.pack_planar(np.full((g, n_pad), 8, np.int32))

        out["qzeros"] = np.stack([zeros_of(p) for p in lins])
    return out
