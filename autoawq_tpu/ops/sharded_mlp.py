"""Tensor-parallel fused decode-MLP: gate -> up -> act·mul -> down in ONE
pallas_call per chip, GSPMD-aware.

The single-chip megakernel (ops/fused_mlp.py) takes the load-time-fused
``[gate|up]`` packed layout — which cannot be column-sharded: a contiguous
1/tp slice of the concatenated width holds gate columns for one chip and up
columns for another, so no chip can form act(g)*u locally. Instead of
repacking, this variant keeps gate and up as SEPARATE operands (the
checkpoint layout) with ordinary Megatron shardings:

  gate/up qweight [H/2, N4]  column-parallel  P(None, tensor)
  down    qweight [I/2, H4]  row-parallel     P(tensor, None)
  x       [M, H]             replicated (or M-sharded on another axis)

Each chip then runs a three-phase kernel — gate superblocks, up
superblocks, act·mul + down superblocks — over its OWN I/tp slice of the
intermediate (gate columns c·I/tp.., up columns c·I/tp.., down rows
c·I/tp..), and one psum over the tensor axis finishes down's contraction.
This closes STATUS round-2 gap #1 (the fused-MLP win previously vanished
under TP, nn/modules.py device_count==1 gate) and replaces the reference's
single-GPU-only fused MLP (awq/modules/fused/mlp.py:46-70 +
fused/model.py:98-100 layer-pipeline hops) with XLA collectives over ICI.

Phase layout mirrors ops/fused_mlp.py: clamped index maps give phase-local
operands, "arbitrary" 1-D grid, VMEM scratch for g/u and the activated
intermediate.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from autoawq_tpu.ops.fused_mlp import M_MAX, QW_SLAB_MAX, _act, _tile_dot
from autoawq_tpu.ops.pallas_gemm import PAIRS, _lanes


def _kernel(x_ref, g_qw, g_sc, u_qw, u_sc, d_qw, d_sc, *rest,
            sg: int, su: int, zg: bool, zu: bool, zd: bool,
            lg: int, lu: int, ld: int, npg: int, inter: int, act: str):
    """Grid: sg gate steps | su up steps | sd down steps. The g/u scratch is
    [M, npg + npu]: gate tiles land at [0, npg) (padded gate width), up
    tiles at [npg, npg + npu), and the activation reads the LOGICAL inter
    columns of each region."""
    it = iter(rest)
    g_qz = next(it) if zg else None
    u_qz = next(it) if zu else None
    d_qz = next(it) if zd else None
    out_ref, gu_scr, h_scr = it

    t = pl.program_id(0)
    sbg, sbu = PAIRS * lg, PAIRS * lu

    @pl.when(t < sg)
    def _gate():
        tile = _tile_dot(x_ref[:], g_qw[:], g_sc[0],
                         None if g_qz is None else g_qz[0],
                         x_ref.shape[1] // g_sc.shape[1], lg)
        gu_scr[:, pl.ds(t * sbg, sbg)] = tile

    @pl.when(jnp.logical_and(t >= sg, t < sg + su))
    def _up():
        tu = t - sg
        tile = _tile_dot(x_ref[:], u_qw[:], u_sc[0],
                         None if u_qz is None else u_qz[0],
                         x_ref.shape[1] // u_sc.shape[1], lu)
        gu_scr[:, pl.ds(npg + tu * sbu, sbu)] = tile

    @pl.when(t >= sg + su)
    def _down():
        @pl.when(t == sg + su)
        def _activate():
            g = gu_scr[:, :inter]
            u = gu_scr[:, npg: npg + inter]
            h_scr[:] = _act(act, g) * u

        tile = _tile_dot(h_scr[:].astype(x_ref.dtype), d_qw[:], d_sc[0],
                         None if d_qz is None else d_qz[0],
                         inter // d_sc.shape[1], ld)
        out_ref[:] = tile.astype(out_ref.dtype)


def supported(x: jax.Array, gate: Dict[str, Any], up: Dict[str, Any],
              down: Dict[str, Any], inter: int, hidden_act: str) -> bool:
    """Shape gate for the three-operand fused MLP (pass SHARD-local shapes
    and the shard-local inter under TP)."""
    for lin in (gate, up, down):
        if "qweight" not in lin or "lora_a" in lin:
            return False
    if gate.get("bias") is not None or up.get("bias") is not None:
        return False
    if hidden_act not in ("silu", "gelu", "gelu_new", "gelu_pytorch_tanh",
                          "gelu_fast"):
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    h = x.shape[-1]
    ok = m <= M_MAX and inter % 128 == 0
    for lin, k in ((gate, h), (up, h), (down, inter)):
        qw, sc = lin["qweight"], lin["scales"]
        n4 = qw.shape[1]
        lane = _lanes(n4)
        g = sc.shape[0]
        ok = (ok and 2 * qw.shape[0] == k
              and k % (2 * g) == 0 and g % 2 == 0
              and (4 * n4) % (PAIRS * lane) == 0 and lane % 8 == 0
              and qw.size * 4 <= QW_SLAB_MAX * ((4 * n4) // (PAIRS * lane)))
    # the logical intermediate must fit inside both padded gate/up widths
    ok = (ok and inter <= 4 * gate["qweight"].shape[1]
          and inter <= 4 * up["qweight"].shape[1])
    return bool(ok)


@functools.partial(
    jax.jit,
    static_argnames=("inter", "out_features", "act", "interpret"))
def fused_mlp3_pallas(
    x: jax.Array,
    g_qweight: jax.Array, g_scales: jax.Array,
    u_qweight: jax.Array, u_scales: jax.Array,
    d_qweight: jax.Array, d_scales: jax.Array,
    g_qzeros: Optional[jax.Array] = None,
    u_qzeros: Optional[jax.Array] = None,
    d_qzeros: Optional[jax.Array] = None,
    *,
    inter: int,
    out_features: int,
    act: str = "silu",
    interpret: bool = False,
) -> jax.Array:
    """``down(act(gate(x)) * up(x))`` with separate gate/up operands."""
    orig_shape = x.shape
    h = x.shape[-1]
    x2 = x.reshape(-1, h)
    m = x2.shape[0]
    bm = max(8, m)  # sublane-1 blocks lower to a catastrophically slow path
    if bm != m:
        x2 = jnp.pad(x2, ((0, bm - m), (0, 0)))

    n4g, n4u, n4d = g_qweight.shape[1], u_qweight.shape[1], d_qweight.shape[1]
    lg, lu, ld = _lanes(n4g), _lanes(n4u), _lanes(n4d)
    sbg, sbu, sbd = PAIRS * lg, PAIRS * lu, PAIRS * ld
    npg, npu, npd = 4 * n4g, 4 * n4u, 4 * n4d
    sg, su, sd = npg // sbg, npu // sbu, npd // sbd
    gg, guu, gd = g_scales.shape[0], u_scales.shape[0], d_scales.shape[0]

    def cg(t):
        return jnp.minimum(t, sg - 1)

    def cu(t):
        return jnp.clip(t - sg, 0, su - 1)

    def cd(t):
        return jnp.maximum(t - sg - su, 0)

    in_specs = [
        pl.BlockSpec((bm, h), lambda t: (0, 0)),
        pl.BlockSpec((h // 2, lg), lambda t: (0, cg(t))),
        pl.BlockSpec((1, gg, sbg), lambda t: (0, 0, cg(t))),
        pl.BlockSpec((h // 2, lu), lambda t: (0, cu(t))),
        pl.BlockSpec((1, guu, sbu), lambda t: (0, 0, cu(t))),
        pl.BlockSpec((inter // 2, ld), lambda t: (0, cd(t))),
        pl.BlockSpec((1, gd, sbd), lambda t: (0, 0, cd(t))),
    ]
    operands = [
        x2,
        g_qweight, g_scales.astype(jnp.float32).reshape(1, gg, npg),
        u_qweight, u_scales.astype(jnp.float32).reshape(1, guu, npu),
        d_qweight, d_scales.astype(jnp.float32).reshape(1, gd, npd),
    ]
    for qz, gN, lN, cN, n4N in ((g_qzeros, gg, lg, cg, n4g),
                                (u_qzeros, guu, lu, cu, n4u),
                                (d_qzeros, gd, ld, cd, n4d)):
        if qz is not None:
            in_specs.append(pl.BlockSpec(
                (1, gN // 2, lN),
                functools.partial(lambda c, t: (0, 0, c(t)), cN)))
            operands.append(qz.reshape(1, gN // 2, n4N))

    out = pl.pallas_call(
        functools.partial(
            _kernel, sg=sg, su=su,
            zg=g_qzeros is not None, zu=u_qzeros is not None,
            zd=d_qzeros is not None,
            lg=lg, lu=lu, ld=ld, npg=npg, inter=inter, act=act),
        grid=(sg + su + sd,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, sbd), lambda t: (0, cd(t))),
        out_shape=jax.ShapeDtypeStruct((bm, npd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, npg + npu), jnp.float32),
            pltpu.VMEM((bm, inter), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (h * (npg + npu) + inter * npd),
            bytes_accessed=(bm * h * 2 + h * (n4g + n4u) * 2
                            + inter * n4d * 2 + bm * npd * 2),
            transcendentals=bm * inter,
        ),
        interpret=interpret,
    )(*operands)

    y = out[:m, :out_features]
    return y.reshape(*orig_shape[:-1], out_features)


# ------------------------------------------------------------------ #
# GSPMD wrapper


def _jnp_mlp3(x, g_qw, g_sc, u_qw, u_sc, d_qw, d_sc, g_qz, u_qz, d_qz,
              inter, act):
    """Local-shard fallback when the shard shapes miss the kernel tiling."""
    from autoawq_tpu.ops import gemm

    g = jnp.dot(x, gemm.dequantize_planar(g_qw, g_sc, g_qz, dtype=x.dtype),
                preferred_element_type=jnp.float32)[..., :inter]
    u = jnp.dot(x, gemm.dequantize_planar(u_qw, u_sc, u_qz, dtype=x.dtype),
                preferred_element_type=jnp.float32)[..., :inter]
    h = (_act(act, g) * u).astype(x.dtype)
    d = gemm.dequantize_planar(d_qw, d_sc, d_qz, dtype=x.dtype)
    return jnp.dot(h, d, preferred_element_type=jnp.float32).astype(x.dtype)


def _local_mlp3(x, g_qw, g_sc, u_qw, u_sc, d_qw, d_sc, g_qz, u_qz, d_qz,
                inter, act, interpret):
    gate = {"qweight": g_qw, "scales": g_sc}
    up = {"qweight": u_qw, "scales": u_sc}
    down = {"qweight": d_qw, "scales": d_sc}
    if g_qz is not None:
        gate["qzeros"] = g_qz
    if u_qz is not None:
        up["qzeros"] = u_qz
    if d_qz is not None:
        down["qzeros"] = d_qz
    if supported(x, gate, up, down, inter, act):
        return fused_mlp3_pallas(
            x, g_qw, g_sc, u_qw, u_sc, d_qw, d_sc, g_qz, u_qz, d_qz,
            inter=inter, out_features=d_sc.shape[1], act=act,
            interpret=interpret)
    return _jnp_mlp3(x, g_qw, g_sc, u_qw, u_sc, d_qw, d_sc, g_qz, u_qz,
                     d_qz, inter, act)


def _norm_spec(sharding, ndim: int) -> Tuple:
    spec = tuple(getattr(sharding, "spec", ()) or ())
    return spec + (None,) * (ndim - len(spec))


def _partition_impl(zflags, inter, act, interpret, mesh, arg_shapes,
                    result_shape):
    shardings = [a.sharding for a in arg_shapes]
    x_spec = _norm_spec(shardings[0], 2)
    gq_spec = _norm_spec(shardings[1], 2)
    gs_spec = _norm_spec(shardings[2], 2)
    dq_spec = _norm_spec(shardings[5], 2)
    axis = gq_spec[1] or gs_spec[1] or dq_spec[0]

    # TP contract: gate/up column-sharded and down row-sharded on the SAME
    # axis, superblock-divisible local widths, the logical inter dividing
    # evenly over the axis. Anything else downgrades to replicated
    # (correct; parallel/specs.py never produces mixed layouts).
    if axis is not None:
        tp = mesh.shape[axis]
        n4g = arg_shapes[1].shape[1]
        n4u = arg_shapes[3].shape[1]
        i2, gd = arg_shapes[5].shape[0], arg_shapes[6].shape[0]
        if (n4g % (tp * 256) != 0 or n4u % (tp * 256) != 0
                or inter % tp != 0 or i2 % tp != 0 or gd % (2 * tp) != 0
                # shard slices must be unpadded: the local logical width
                # I/tp must equal the local padded width
                or inter != 4 * n4g or inter != 4 * n4u):
            axis = None

    m_axis = x_spec[0] if x_spec[0] != axis else None

    if axis is None:
        col = NamedSharding(mesh, P(None, None))
        row = col
        local_inter = inter

        def finish(y):
            return y
    else:
        col = NamedSharding(mesh, P(None, axis))
        row = NamedSharding(mesh, P(axis, None))
        local_inter = inter // mesh.shape[axis]

        def finish(y):
            return jax.lax.psum(y, axis)

    def lower(*args):
        a = _unpack(args, zflags)
        return finish(_local_mlp3(*a, local_inter, act, interpret))

    out_sharding = NamedSharding(mesh, P(m_axis, None))
    arg_shardings = [NamedSharding(mesh, P(m_axis, None)),
                     col, col, col, col, row, row]
    for present, sh in zip(zflags, (col, col, row)):
        if present:
            arg_shardings.append(sh)
    return mesh, lower, out_sharding, tuple(arg_shardings)


def _unpack(args, zflags):
    """(x, 6 weight tensors, present zeros...) -> full 10-slot arg list."""
    base = list(args[:7])
    it = iter(args[7:])
    for present in zflags:
        base.append(next(it) if present else None)
    return base


def _infer_impl(zflags, inter, act, interpret, mesh, arg_shapes,
                result_shape):
    x_spec = _norm_spec(arg_shapes[0].sharding, 2)
    gq_spec = _norm_spec(arg_shapes[1].sharding, 2)
    dq_spec = _norm_spec(arg_shapes[5].sharding, 2)
    axis = gq_spec[1] or dq_spec[0]
    m_axis = x_spec[0] if x_spec[0] != axis else None
    return NamedSharding(mesh, P(m_axis, None))


@functools.lru_cache(maxsize=None)
def _build(zflags: Tuple[bool, bool, bool], inter: int, act: str,
           interpret: bool):
    """One custom_partitioning op per (zeros-presence, inter, act,
    interpret) combination. The shardy rule ties out rows to x rows; all
    weight dims are private factors (packed sizes differ from logical)."""

    def fn(*args):
        a = _unpack(args, zflags)
        return _local_mlp3(*a, inter, act, interpret)

    dims = ["m k", "k2 ng4", "gg ng", "k2b nu4", "gu nu", "i2 nd4", "gd nd"]
    extra = ["gg2 ng42", "gu2 nu42", "gd2 nd42"]
    for present, d in zip(zflags, extra):
        if present:
            dims.append(d)
    rule = ", ".join(dims) + " -> m nd"

    op = custom_partitioning(fn)
    op.def_partition(
        partition=functools.partial(_partition_impl, zflags, inter, act,
                                    interpret),
        infer_sharding_from_operands=functools.partial(
            _infer_impl, zflags, inter, act, interpret),
        sharding_rule=rule,
    )
    return op


def fused_mlp_sharded(
    x: jax.Array,
    gate: Dict[str, Any],
    up: Dict[str, Any],
    down: Dict[str, Any],
    *,
    inter: int,
    out_features: int,
    act: str = "silu",
    interpret: bool = False,
) -> jax.Array:
    """Partitioner-aware fused MLP over separate gate/up/down quant LINs.

    Single device: the three-phase megakernel directly. Under pjit with
    Megatron shardings: per-chip local kernel on the I/tp slice + one psum.
    """
    orig_shape = x.shape
    x2 = x.reshape(-1, x.shape[-1])
    zflags = ("qzeros" in gate, "qzeros" in up, "qzeros" in down)
    op = _build(zflags, inter, act, interpret)
    args = [x2, gate["qweight"], gate["scales"], up["qweight"], up["scales"],
            down["qweight"], down["scales"]]
    for present, lin in zip(zflags, (gate, up, down)):
        if present:
            args.append(lin["qzeros"])
    y = op(*args)
    if out_features != down["scales"].shape[1]:
        y = y[:, :out_features]
    if down.get("bias") is not None:
        y = y + down["bias"].astype(y.dtype)
    return y.reshape(*orig_shape[:-1], out_features)
