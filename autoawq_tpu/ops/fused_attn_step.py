"""Fused decode attention step: qkv GEMM -> RoPE -> attention over the KV
cache -> o GEMM in ONE pallas_call.

Round-2 measurement (STATUS.md): a standalone decode-attention kernel WON
device-busy time but LOST wall-clock — every extra pallas_call boundary
drains Mosaic's DMA pipeline. The remedy is the opposite decomposition:
instead of adding a kernel between the qkv and o projections, absorb the
whole attention step into the projections' kernel so one launch replaces
{int4 qkv GEMM, XLA rope, GQA repeat, einsum-softmax-einsum, int4 o GEMM}.
Together with ops/fused_mlp.py this brings a decoder layer to TWO kernel
launches. Replaces the reference's per-layer chain of
``WQLinear_GEMM.forward`` + ``flash_attn_with_kvcache`` + o-proj
(awq/modules/fused/attn.py:205-301).

Structure (1-D "arbitrary" grid, SA + 1 + SC steps):
* steps < SA: int4 qkv superblock tiles (paired magic-number extraction,
  ops/pallas_gemm.py) into a [BM, NQKV] f32 VMEM scratch;
* step SA: split q/k/v, apply neox RoPE with the prefetched per-batch
  cos/sin row, emit the new K/V rows (cache write stays outside — XLA fuses
  one dynamic_update_slice), then for every (batch, kv-head) group compute
  a FULL softmax against the whole cached [T, hd] K/V slab (held in VMEM —
  decode slabs are sub-MB) plus the current token's diagonal contribution;
* steps > SA: int4 o-proj tiles contracting the attention scratch.

The valid cache length arrives as a prefetched scalar; rows past it (and
outside the sliding window) are masked in-kernel.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autoawq_tpu.ops.fused_mlp import _tile_dot
from autoawq_tpu.ops.pallas_gemm import PAIRS, _lanes

B_MAX = 8  # batch rows (= padded GEMM sublanes)
REP_PAD = 8  # query-head sublane tile inside a kv group
SLAB_MAX = 24 * 1024 * 1024  # whole-cache VMEM residency cap


def _rope_neox(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [rows, hd] f32, cos/sin [hd/2] -> rotated (HF half-split)."""
    half = x.shape[-1] // 2
    x1, x2 = x[:, :half], x[:, half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=1)


def _kernel(vl_ref, x_ref, qwq_ref, scq_ref, qwo_ref, sco_ref, kc_ref,
            vc_ref, cs_ref, *rest, sa: int, lq: int, lo: int, gq: int,
            go: int, b: int, nh: int, nkv: int, hd: int, scale: float,
            window: Optional[int], has_qkv_bias: bool,
            has_kv_scales: bool = False):
    it = iter(rest)
    kcs_ref = next(it) if has_kv_scales else None
    vcs_ref = next(it) if has_kv_scales else None
    qzq_ref = next(it) if gq > 0 else None
    qzo_ref = next(it) if go > 0 else None
    qb_ref = next(it) if has_qkv_bias else None
    y_ref, k_out, v_out, qkv_scr, og_scr, q_scr, k_scr, v_scr, o_scr = it

    t = pl.program_id(0)
    h = x_ref.shape[1]
    sbq = PAIRS * lq
    rep = nh // nkv

    @pl.when(t < sa)
    def _qkv():
        tile = _tile_dot(x_ref[:], qwq_ref[:], scq_ref[0],
                         None if qzq_ref is None else qzq_ref[0],
                         h // scq_ref.shape[1], lq)
        qkv_scr[:, pl.ds(t * sbq, sbq)] = tile

    @pl.when(t == sa)
    def _attend():
        # Mosaic supports neither the lane->sublane shape cast that would
        # view a row's heads as [nh, hd] ([8, 256] -> [32, 64] is an
        # "unsupported shape cast") nor efficient 1-D row slicing (it
        # scalarizes; compile time explodes). So: SCATTER each head's
        # [1, hd] lane-slice onto its own sublane row with tiny 2-D copies,
        # then run rope and the softmax/value contractions as group-batched
        # [rep, hd] / [rep, T] ops — per-head work is two 64-lane copies,
        # the math runs at full tile width. (A purely per-head formulation
        # measured 20% SLOWER end-to-end: ~40 serial matvec chains/layer.)
        vl = vl_ref[0]

        def row(off, bi):  # [1, hd] f32 lane-slice of the GEMM output
            r = qkv_scr[bi : bi + 1, off : off + hd]
            if qb_ref is not None:
                r = r + qb_ref[0:1, off : off + hd]
            return r

        for bi in range(b):
            for hh in range(nh):
                q_scr[bi * nh + hh : bi * nh + hh + 1] = row(hh * hd, bi)
            for j in range(nkv):
                k_scr[bi * nkv + j : bi * nkv + j + 1] = row(
                    nh * hd + j * hd, bi)
                v_scr[bi * nkv + j : bi * nkv + j + 1] = row(
                    (nh + nkv) * hd + j * hd, bi)
        for bi in range(b):
            cos = cs_ref[0, bi : bi + 1]  # [1, hd/2], broadcasts over rows
            sin = cs_ref[1, bi : bi + 1]
            qrot = _rope_neox(q_scr[bi * nh : (bi + 1) * nh], cos, sin)
            krot = _rope_neox(k_scr[bi * nkv : (bi + 1) * nkv], cos, sin)
            vb = v_scr[bi * nkv : (bi + 1) * nkv]
            k_out[bi] = krot.astype(k_out.dtype)
            v_out[bi] = vb.astype(v_out.dtype)
            for j in range(nkv):
                qg = qrot[j * rep : (j + 1) * rep]  # [rep, hd]
                kn = krot[j : j + 1]
                vn = vb[j : j + 1]
                ks = kc_ref[bi, j].astype(jnp.float32)  # [T, hd]
                vs = vc_ref[bi, j].astype(jnp.float32)
                s = jax.lax.dot_general(
                    qg, ks, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # [rep, T]
                if kcs_ref is not None:
                    # int8 cache: fold the per-token absmax K scales into
                    # the score row — the int8 slab is never dequantized
                    s = s * kcs_ref[bi, j]  # [1, T] broadcasts over rep
                idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                ok = idx < vl
                if window is not None:
                    ok &= idx > vl - window
                s = jnp.where(ok, s, -1e30)
                diag = jnp.sum(qg * kn, axis=1, keepdims=True) * scale
                m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), diag)
                p = jnp.where(ok, jnp.exp(s - m), 0.0)
                pd = jnp.exp(diag - m)  # [rep, 1]
                l = jnp.sum(p, axis=1, keepdims=True) + pd
                pv = p if vcs_ref is None else p * vcs_ref[bi, j]
                o = (jax.lax.dot_general(
                    pv, vs, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + pd * vn) / l
                o_scr[bi * nh + j * rep : bi * nh + (j + 1) * rep] = o
        for bi in range(b):
            for hh in range(nh):
                og_scr[bi : bi + 1, hh * hd : (hh + 1) * hd] = \
                    o_scr[bi * nh + hh : bi * nh + hh + 1]

    @pl.when(t > sa)
    def _oproj():
        tile = _tile_dot(og_scr[:].astype(x_ref.dtype), qwo_ref[:],
                         sco_ref[0],
                         None if qzo_ref is None else qzo_ref[0],
                         (nh * hd) // sco_ref.shape[1], lo)
        y_ref[:] = tile.astype(y_ref.dtype)


def supported(cfg, p: Dict[str, Any], x: jax.Array,
              k_cache: jax.Array) -> bool:
    """Eligibility: fused quantized qkv/o, neox full-rotary RoPE, plain
    GQA/MHA causal (softcap/alibi/qk-norm/partial-rotary fall back), decode
    batch rows, whole-cache VMEM residency."""
    qkv, o = p.get("qkv_proj"), p.get("o_proj")
    if qkv is None or o is None or "qweight" not in qkv or "qweight" not in o:
        return False
    if "lora_a" in qkv or "lora_a" in o:
        return False
    if (cfg.pos_embed != "rope" or cfg.rope_style != "neox"
            or cfg.qk_norm or cfg.attn_softcap or cfg.is_mla):
        return False
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim_)
    if cfg.rotary_dim != hd or nh % nkv or nh // nkv > REP_PAD:
        return False
    b, t = k_cache.shape[0], k_cache.shape[2]
    if x.shape[0] * x.shape[1] != b or b > B_MAX:
        return False
    # phase B unrolls one op-chain per query head per batch row; cap the
    # unroll so compile time stays sane. Measured: the kernel still beats
    # the XLA chain at 256 chains (mistral bs8: 960 vs 938 tok/s).
    if b * nh > 256:
        return False
    if hd % 8 or hd > 512 or t % 8:
        return False
    if 4 * b * nkv * t * hd * k_cache.dtype.itemsize > SLAB_MAX:
        return False
    h = x.shape[-1]
    for lin, k in ((qkv, h), (o, nh * hd)):
        g = lin["scales"].shape[0]
        n4 = lin["qweight"].shape[1]
        ln = _lanes(n4)
        if (2 * lin["qweight"].shape[0] != k or k % (2 * g) or g % 2
                or 4 * n4 % (PAIRS * ln) or ln % 8):
            return False
    if o.get("bias") is not None:
        pass  # added outside the kernel
    return (nh + 2 * nkv) * hd <= 4 * qkv["qweight"].shape[1]


@functools.partial(jax.jit, static_argnames=(
    "nh", "nkv", "hd", "scale", "window", "interpret"))
def fused_attention_step(
    x: jax.Array,  # [B, H] current-step hidden rows
    qkv: Dict[str, jax.Array],
    o: Dict[str, jax.Array],
    k_cache: jax.Array,  # [B, nkv, T, hd] (pre-update; bf16/f32 or int8)
    v_cache: jax.Array,
    cos: jax.Array,  # [B, hd/2] fp32 for the current position
    sin: jax.Array,
    valid_len: jax.Array,  # scalar int32 = tokens already cached
    *,
    nh: int, nkv: int, hd: int, scale: float,
    window: Optional[int] = None,
    k_scales: Optional[jax.Array] = None,  # [B, nkv, T] f32 (int8 cache)
    v_scales: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (y [B, H_out], k_new [B, nkv, hd], v_new [B, nkv, hd]).

    ``y`` is the o-projection of the attention output (o bias NOT added);
    k_new/v_new are the post-RoPE FP rows for the caller's cache write
    (the caller quantizes them when the cache is int8). With
    k_scales/v_scales the cache refs are int8 and the per-token absmax
    scales fold into the score/prob matrices in-kernel — attention reads
    HALF the cache bytes and no dequantized slab ever exists.
    """
    b, h = x.shape
    bm = max(8, b)
    if bm != b:
        x = jnp.pad(x, ((0, bm - b), (0, 0)))

    n4q, n4o = qkv["qweight"].shape[1], o["qweight"].shape[1]
    lq, lo = _lanes(n4q), _lanes(n4o)
    sbq, sbo = PAIRS * lq, PAIRS * lo
    sa, sc = 4 * n4q // sbq, 4 * n4o // sbo
    gq, go = qkv["scales"].shape[0], o["scales"].shape[0]
    cs = jnp.stack([cos, sin]).astype(jnp.float32)  # [2, B, hd/2]

    def cq(t):
        return jnp.minimum(t, sa - 1)

    def co(t):
        return jnp.maximum(t - sa - 1, 0)

    in_specs = [
        pl.BlockSpec((bm, h), lambda t, vl: (0, 0)),
        pl.BlockSpec((h // 2, lq), lambda t, vl: (0, cq(t))),
        pl.BlockSpec((1, gq, sbq), lambda t, vl: (0, 0, cq(t))),
        pl.BlockSpec((nh * hd // 2, lo), lambda t, vl: (0, co(t))),
        pl.BlockSpec((1, go, sbo), lambda t, vl: (0, 0, co(t))),
        pl.BlockSpec((b, nkv, k_cache.shape[2], hd),
                     lambda t, vl: (0, 0, 0, 0)),
        pl.BlockSpec((b, nkv, k_cache.shape[2], hd),
                     lambda t, vl: (0, 0, 0, 0)),
        pl.BlockSpec((2, b, hd // 2), lambda t, vl: (0, 0, 0)),
    ]
    operands = [
        x, qkv["qweight"],
        qkv["scales"].astype(jnp.float32).reshape(1, gq, 4 * n4q),
        o["qweight"],
        o["scales"].astype(jnp.float32).reshape(1, go, 4 * n4o),
        k_cache, v_cache, cs,
    ]
    has_kvs = k_scales is not None
    if has_kvs:
        t_len = k_cache.shape[2]
        for s_arr in (k_scales, v_scales):
            in_specs.append(pl.BlockSpec((b, nkv, 1, t_len),
                                         lambda t, vl: (0, 0, 0, 0)))
            operands.append(s_arr.astype(jnp.float32)
                            .reshape(b, nkv, 1, t_len))
    if qkv.get("qzeros") is not None:
        in_specs.append(pl.BlockSpec((1, gq // 2, lq),
                                     lambda t, vl: (0, 0, cq(t))))
        operands.append(qkv["qzeros"].reshape(1, gq // 2, n4q))
    if o.get("qzeros") is not None:
        in_specs.append(pl.BlockSpec((1, go // 2, lo),
                                     lambda t, vl: (0, 0, co(t))))
        operands.append(o["qzeros"].reshape(1, go // 2, n4o))
    has_qb = qkv.get("bias") is not None
    if has_qb:
        nq_pad = 4 * n4q
        qb = jnp.zeros((1, nq_pad), jnp.float32).at[0, : qkv["bias"].shape[0]]\
            .set(qkv["bias"].astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, nq_pad), lambda t, vl: (0, 0)))
        operands.append(qb)

    out = pl.pallas_call(
        functools.partial(
            _kernel, sa=sa, lq=lq, lo=lo,
            gq=gq if qkv.get("qzeros") is not None else 0,
            go=go if o.get("qzeros") is not None else 0,
            b=b, nh=nh, nkv=nkv, hd=hd, scale=scale, window=window,
            has_qkv_bias=has_qb, has_kv_scales=has_kvs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(sa + 1 + sc,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bm, sbo), lambda t, vl: (0, co(t))),
                pl.BlockSpec((b, nkv, hd), lambda t, vl: (0, 0, 0)),
                pl.BlockSpec((b, nkv, hd), lambda t, vl: (0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bm, 4 * n4q), jnp.float32),
                pltpu.VMEM((bm, nh * hd), jnp.float32),
                pltpu.VMEM((b * nh, hd), jnp.float32),   # heads-on-sublanes
                pltpu.VMEM((b * nkv, hd), jnp.float32),
                pltpu.VMEM((b * nkv, hd), jnp.float32),
                pltpu.VMEM((b * nh, hd), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bm, 4 * n4o), x.dtype),
            jax.ShapeDtypeStruct((b, nkv, hd), k_cache.dtype),
            jax.ShapeDtypeStruct((b, nkv, hd), v_cache.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(valid_len, jnp.int32).reshape(1), *operands)
    y, k_new, v_new = out
    return y[:b], k_new, v_new
