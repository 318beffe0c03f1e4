"""Tensor-parallel fused decode attention step.

The single-chip megakernel (ops/fused_attn_step.py: int4 qkv GEMM -> RoPE
-> softmax over the VMEM cache slab -> int4 o GEMM in ONE pallas_call)
requires the load-time-fused ``[q|k|v]`` packed layout, which cannot be
column-sharded (a contiguous lane slice mixes one chip's q with another's
k). Instead of a new kernel, TP reuses the SAME kernel on a per-chip
re-fused stack (nn/fuse.tp_stack_qkv): ``qkv_proj_tp`` leaves carry a
leading [tp] dim sharded on the ``tensor`` axis, each entry the fused
layout for that chip's nh/tp query + nkv/tp kv heads. Under
custom_partitioning each chip squeezes its entry, runs the megakernel on
its local heads against its cache shard ([B, nkv/tp, T, hd]), and one
psum finishes the row-parallel o projection. This closes the
device_count==1 gate on the fused attention step (STATUS r2 gap #1 /
round-2 VERDICT #5 second half); the reference's counterpart is the
single-GPU fused attention chain (awq/modules/fused/attn.py:205-301)
hopped between devices by the accelerate layer pipeline.

Replicated fallback (no tensor axis / indivisible shapes): loop the stack
entries locally — chip-equivalent math, summed o partials.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from autoawq_tpu.ops import fused_attn_step
from autoawq_tpu.ops.pallas_gemm import PAIRS, _lanes


def _entry_shapes_ok(b: int, t: int, nh_l: int, nkv_l: int, hd: int,
                     h: int, qkv: Dict[str, Any], o: Dict[str, Any],
                     cache_itemsize: int) -> bool:
    """Shape gate for ONE stack entry (= one chip's local work) — the
    shape-level subset of fused_attn_step.supported (model-level gates
    live in nn/modules._tp_fused_attn_ok)."""
    if nh_l % nkv_l or nh_l // nkv_l > fused_attn_step.REP_PAD:
        return False
    if b > fused_attn_step.B_MAX or b * nh_l > 256:
        return False
    if hd % 8 or hd > 512 or t % 8:
        return False
    if 4 * b * nkv_l * t * hd * cache_itemsize > fused_attn_step.SLAB_MAX:
        return False
    for lin, k in ((qkv, h), (o, nh_l * hd)):
        g = lin["scales"].shape[-2]
        n4 = lin["qweight"].shape[-1]
        ln = _lanes(n4)
        if (2 * lin["qweight"].shape[-2] != k or k % (2 * g) or g % 2
                or 4 * n4 % (PAIRS * ln) or ln % 8):
            return False
    return (nh_l + 2 * nkv_l) * hd <= 4 * qkv["qweight"].shape[-1]


def _local_step(x, st_qw, st_sc, o_qw, o_sc, kc, vc, cos, sin, vl,
                st_qz, o_qz, st_b, *, nh, nkv, hd, scale, window,
                interpret):
    """Run the megakernel once per local stack entry. Under the tensor
    sharding the local stack is ONE entry (the chip's heads); the
    replicated fallback loops all entries — each sees its own head slice
    of the cache and its own o row block — and sums the o partials."""
    L = st_qw.shape[0]
    nh_l, nkv_l = nh // L, nkv // L
    orows, og = o_qw.shape[0] // L, o_sc.shape[0] // L
    y_total = None
    k_rows, v_rows = [], []
    for i in range(L):
        qkv = {"qweight": st_qw[i], "scales": st_sc[i]}
        if st_qz is not None:
            qkv["qzeros"] = st_qz[i]
        if st_b is not None:
            qkv["bias"] = st_b[i]
        o = {"qweight": o_qw[i * orows:(i + 1) * orows],
             "scales": o_sc[i * og:(i + 1) * og]}
        if o_qz is not None:
            o["qzeros"] = o_qz[i * og // 2:(i + 1) * og // 2]
        y, k_new, v_new = fused_attn_step.fused_attention_step(
            x, qkv, o,
            jax.lax.dynamic_slice_in_dim(kc, i * nkv_l, nkv_l, 1),
            jax.lax.dynamic_slice_in_dim(vc, i * nkv_l, nkv_l, 1),
            cos, sin, vl, nh=nh_l, nkv=nkv_l, hd=hd, scale=scale,
            window=window, interpret=interpret)
        y_total = y if y_total is None else y_total + y
        k_rows.append(k_new)
        v_rows.append(v_new)
    return (y_total, jnp.concatenate(k_rows, axis=1),
            jnp.concatenate(v_rows, axis=1))


def _norm_spec(sharding, ndim: int) -> Tuple:
    spec = tuple(getattr(sharding, "spec", ()) or ())
    return spec + (None,) * (ndim - len(spec))


def _unpack(args, zflags):
    base = list(args[:10])
    it = iter(args[10:])
    for present in zflags:
        base.append(next(it) if present else None)
    return base


def _partition_impl(zflags, nh, nkv, hd, scale, window, interpret,
                    mesh, arg_shapes, result_shape):
    st_spec = _norm_spec(arg_shapes[1].sharding, 3)
    axis = st_spec[0]
    tp = mesh.shape[axis] if axis is not None else 1
    L = arg_shapes[1].shape[0]
    o2, go = arg_shapes[3].shape[0], arg_shapes[4].shape[0]
    # contract: the stack dim splits exactly one entry per chip; the o
    # projection row-shards at the same head boundaries (scales groups
    # and packed zero rows must divide too)
    if axis is not None and (
            L != tp or nh % tp or nkv % tp or o2 % tp or go % tp
            or (go // tp) % 2):
        axis = None
        tp = 1

    rep = NamedSharding(mesh, P())
    if axis is None:
        st_sh = NamedSharding(mesh, P(None, None, None))
        o_sh = NamedSharding(mesh, P(None, None))
        cache_sh = NamedSharding(mesh, P(None, None, None, None))
        kv_out = NamedSharding(mesh, P(None, None, None))

        def finish(y):
            return y
    else:
        st_sh = NamedSharding(mesh, P(axis, None, None))
        o_sh = NamedSharding(mesh, P(axis, None))
        cache_sh = NamedSharding(mesh, P(None, axis, None, None))
        kv_out = NamedSharding(mesh, P(None, axis, None))

        def finish(y):
            return jax.lax.psum(y, axis)

    def lower(*args):
        # under the tensor sharding each chip's local stack is ONE entry
        # covering nh/tp heads (_local_step divides by the local stack
        # length L=1, so pass the per-chip head counts); the replicated
        # fallback (tp=1) loops all L entries over global heads.
        (x, st_qw, st_sc, o_qw, o_sc, kc, vc, cos, sin, vl,
         st_qz, o_qz, st_b) = _unpack(args, zflags)
        y, k_new, v_new = _local_step(
            x, st_qw, st_sc, o_qw, o_sc, kc, vc, cos, sin, vl,
            st_qz, o_qz, st_b, nh=nh // tp, nkv=nkv // tp, hd=hd,
            scale=scale, window=window, interpret=interpret)
        return finish(y), k_new, v_new

    row_sh = NamedSharding(mesh, P(axis, None) if axis else P(None, None))
    arg_shardings = [rep, st_sh, st_sh, o_sh, o_sh, cache_sh, cache_sh,
                     rep, rep, rep]
    for present, sh in zip(zflags, (st_sh, row_sh, row_sh)):
        if present:
            arg_shardings.append(sh)
    out_shardings = (NamedSharding(mesh, P(None, None)), kv_out, kv_out)
    return mesh, lower, out_shardings, tuple(arg_shardings)


def _infer_impl(zflags, nh, nkv, hd, scale, window, interpret, mesh,
                arg_shapes, result_shape):
    st_spec = _norm_spec(arg_shapes[1].sharding, 3)
    axis = st_spec[0]
    kv = NamedSharding(mesh, P(None, axis, None))
    return (NamedSharding(mesh, P(None, None)), kv, kv)


@functools.lru_cache(maxsize=None)
def _build(zflags: Tuple[bool, bool, bool], nh: int, nkv: int, hd: int,
           scale: float, window: Optional[int], interpret: bool):
    def fn(*args):
        (x, st_qw, st_sc, o_qw, o_sc, kc, vc, cos, sin, vl,
         st_qz, o_qz, st_b) = _unpack(args, zflags)
        return _local_step(x, st_qw, st_sc, o_qw, o_sc, kc, vc, cos, sin,
                           vl, st_qz, o_qz, st_b, nh=nh, nkv=nkv, hd=hd,
                           scale=scale, window=window, interpret=interpret)

    dims = ["b h", "l k2 nq4", "l gq nq", "o2 no4", "go no", "b j t d",
            "b j t d", "b hc", "b hc", "sv"]
    extra = ["l gq2 nq42", "go2 no42", "l nb"]
    for present, d in zip(zflags, extra):
        if present:
            dims.append(d)
    rule = ", ".join(dims) + " -> b no, b j d, b j d"

    op = custom_partitioning(fn)
    op.def_partition(
        partition=functools.partial(_partition_impl, zflags, nh, nkv, hd,
                                    scale, window, interpret),
        infer_sharding_from_operands=functools.partial(
            _infer_impl, zflags, nh, nkv, hd, scale, window, interpret),
        sharding_rule=rule,
    )
    return op


def fused_attention_step_tp(
    x: jax.Array,  # [B, H]
    qkv_tp: Dict[str, jax.Array],  # stacked per-chip fused layout [tp, ...]
    o: Dict[str, jax.Array],
    k_cache: jax.Array,  # [B, nkv, T, hd]
    v_cache: jax.Array,
    cos: jax.Array,  # [B, hd/2]
    sin: jax.Array,
    valid_len: jax.Array,
    *,
    nh: int, nkv: int, hd: int, scale: float,
    window: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Partitioner-aware fused attention step over the [tp, ...]-stacked
    qkv layout. Returns (y [B, N_o_pad] — o bias NOT added, slice to
    hidden_size outside —, k_new [B, nkv, hd], v_new [B, nkv, hd])."""
    zflags = ("qzeros" in qkv_tp, "qzeros" in o, "bias" in qkv_tp)
    op = _build(zflags, nh, nkv, hd, float(scale), window, interpret)
    args = [x, qkv_tp["qweight"], qkv_tp["scales"], o["qweight"],
            o["scales"], k_cache, v_cache, cos, sin,
            jnp.asarray(valid_len, jnp.int32).reshape(1)]
    if zflags[0]:
        args.append(qkv_tp["qzeros"])
    if zflags[1]:
        args.append(o["qzeros"])
    if zflags[2]:
        args.append(qkv_tp["bias"])
    return op(*args)
