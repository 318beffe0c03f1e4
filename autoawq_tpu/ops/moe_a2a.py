"""Ragged all-to-all expert-parallel MoE (shard_map prototype).

The alternative dispatch scheme to ops/sharded_moe.py's replicate+psum:
tokens AND experts are sharded on the ``expert`` mesh axis; each shard
routes its local tokens, sends every (token, expert-slot) entry to the
shard that owns the expert over ``all_to_all``, computes with the grouped
int4 kernel on the received rows, and returns results with a second
``all_to_all``; routing weights are applied at the source on return.

Static shapes come from a capacity factor: each shard sends at most
``C = ceil(Tl*k/D * capacity_factor)`` entries to any one destination;
overflow entries are DROPPED (their routing weight contributes nothing) —
the standard capacity-factor discipline of a2a MoE systems. With balanced
routing (or capacity_factor >= D) nothing drops and the result equals the
replicate+psum scheme bit-for-bit up to f32 scatter-add order.

Per-shard traffic comparison (H = hidden, T = global tokens, k = top-k,
D = expert shards, E experts):
- replicate+psum (sharded_moe.py): every shard READS all T*k routed
  activations (T*k*H) + full-width psum of [T, H] over D shards.
- a2a: sends/receives ~2 * (T/D)*k*H entry rows + the [T/D, H] output
  stays local. Wins once T*k*H activation traffic dominates the expert
  weight streaming — large-batch prefill; decode stays on replicate+psum
  (measured crossover: scripts/measure_ep_moe.py, numbers in STATUS.md).

The reference has no expert-parallel path at all (its fused MoE is
single-GPU, awq/modules/fused/moe.py; SURVEY §2.6 names the a2a variant).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _local_moe(stacked, xr, w, eid, hidden_act, intermediate, interpret):
    from autoawq_tpu.ops import moe_gemm

    return moe_gemm.moe_mlp(None, stacked, xr, w, eid, hidden_act,
                            intermediate, interpret=interpret)


def moe_mlp_a2a(
    stacked: Dict[str, Dict[str, jax.Array]],  # [E, ...] expert-stacked
    x: jax.Array,      # [T, H] tokens, sharded on the expert axis
    topw: jax.Array,   # [T, k]
    topi: jax.Array,   # [T, k] global expert ids
    hidden_act: str,
    intermediate: int,
    *,
    mesh: Mesh,
    axis: str = "expert",
    capacity_factor: float = 2.0,
    interpret: bool = False,
) -> jax.Array:
    """Ragged-a2a routed expert MLP -> [T, H].

    Requires T % D == 0 and E % D == 0 (D = mesh.shape[axis]). Weights are
    expected sharded P(axis) on the stacked expert dim, tokens P(axis) on
    the T dim (both are installed by the in_specs below regardless of the
    operands' current sharding).
    """
    t, h = x.shape
    k = topi.shape[1]
    d = mesh.shape[axis]
    e = stacked["gate_up_proj"]["qweight"].shape[0]
    if t % d or e % d:
        raise ValueError(f"T={t} and E={e} must divide the {axis} axis ({d})")
    local_e = e // d
    tl = t // d
    cap = -(-tl * k // d)
    cap = max(8, int(cap * capacity_factor + 0.5))

    gu, dn = stacked["gate_up_proj"], stacked["down_proj"]
    has_z = "qzeros" in gu
    ws = (gu["qweight"], gu["scales"]) + ((gu["qzeros"],) if has_z else ()) \
        + (dn["qweight"], dn["scales"]) + ((dn["qzeros"],) if has_z else ())

    def shard_fn(x_l, topw_l, topi_l, *ws_l):
        if has_z:
            local = {"gate_up_proj": dict(qweight=ws_l[0], scales=ws_l[1],
                                          qzeros=ws_l[2]),
                     "down_proj": dict(qweight=ws_l[3], scales=ws_l[4],
                                       qzeros=ws_l[5])}
        else:
            local = {"gate_up_proj": dict(qweight=ws_l[0], scales=ws_l[1]),
                     "down_proj": dict(qweight=ws_l[2], scales=ws_l[3])}

        n = tl * k
        dest = (topi_l.reshape(-1) // local_e).astype(jnp.int32)  # [n]
        eid_l = (topi_l.reshape(-1) % local_e).astype(jnp.int32)
        # stable sort by destination -> rank within each destination run
        order = jnp.argsort(dest)
        dsorted = dest[order]
        counts = jnp.sum(jax.nn.one_hot(dest, d, dtype=jnp.int32), axis=0)
        starts = jnp.cumsum(counts) - counts
        within = jnp.arange(n) - starts[dsorted]
        keep = within < cap
        slot = jnp.where(keep, dsorted * cap + within, d * cap)  # overflow ->
        # one dead row past the buffer

        # send buffers: entry rows + their local expert id on the owner
        xz = jnp.concatenate([x_l, jnp.zeros((1, h), x_l.dtype)], axis=0)
        send_x = jnp.zeros((d * cap + 1, h), x_l.dtype).at[slot].set(
            xz[jnp.minimum(order // k, tl)])[: d * cap]
        send_e = jnp.zeros((d * cap + 1,), jnp.int32).at[slot].set(
            eid_l[order])[: d * cap]

        recv_x = jax.lax.all_to_all(
            send_x.reshape(d, cap, h), axis, 0, 0, tiled=False)
        recv_e = jax.lax.all_to_all(
            send_e.reshape(d, cap), axis, 0, 0, tiled=False)

        # compute on received rows: each row routes to ONE local expert
        # with unit weight (source applies its routing weight on return)
        y = _local_moe(local, recv_x.reshape(d * cap, h),
                       jnp.ones((d * cap, 1), jnp.float32),
                       recv_e.reshape(d * cap, 1),
                       hidden_act, intermediate, interpret)

        back = jax.lax.all_to_all(
            y.reshape(d, cap, h), axis, 0, 0, tiled=False
        ).reshape(d * cap, h)
        # back[slot] is this shard's entry `order[j]`'s expert output
        w_flat = topw_l.reshape(-1).astype(jnp.float32)
        backz = jnp.concatenate([back, jnp.zeros((1, h), back.dtype)], axis=0)
        contrib = backz[slot].astype(jnp.float32) * \
            jnp.where(keep, w_flat[order], 0.0)[:, None]
        tok = jnp.minimum(order // k, tl)
        out = jnp.zeros((tl + 1, h), jnp.float32).at[tok].add(contrib)
        return out[:tl].astype(x_l.dtype)

    w_specs = (P(axis),) * len(ws)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)) + w_specs,
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(x, topw, topi, *ws)
