"""Pipeline (layer-stage) parallelism over a named ``pipe`` mesh axis.

The reference's ONLY multi-device mechanism is accelerate's layer-wise
pipeline: each decoder layer lives on one GPU and activations hop devices
sequentially in the block loop (awq/models/base.py:453-458,
awq/modules/fused/model.py:98-100) — no micro-batching, no overlap, so at
any instant all GPUs but one idle. The TPU-native replacement is a GPipe
schedule compiled as ONE program: layers stack into per-stage ``[L/P, ...]``
pytrees sharded on the ``pipe`` axis, ``shard_map`` runs every stage
concurrently, and ``lax.ppermute`` shifts microbatch activations stage to
stage over ICI. Bubble fraction is (P-1)/(M+P-1) instead of the
reference's (P-1)/P.

Scope: prefill and training. Decode is latency-bound and single-token —
pipelining it would serialize on ICI hops exactly like the reference;
decode scaling belongs to the tensor axis (ops/sharded_gemm.py).

PP x TP composition: a mesh with BOTH ``pipe`` and ``tensor`` axes runs
Megatron tensor parallelism INSIDE every pipeline stage. Stage weights
shard on tensor (column-parallel q/k/v/gate/up at the planar packing's
superblock granularity, row-parallel o/down on K/groups — same layout
contract as parallel/specs.py); the stage body runs each layer with a
LOCAL head/intermediate config and trace-time ``tp_psum`` markers on the
row-parallel linears, so nn/modules.linear psums partial products over
``tensor`` (bias after the psum) while activations stay replicated on
the tensor axis. Fused qkv/gate_up layouts are UNFUSED at ``to_pipeline``
(their concatenated columns can't be head-sliced; the per-linear layout
shards fine — nn/fuse.unfuse_model); ALiBi shards its bias sheet on the
head dim. MLA shards head-wise too: q_b/kv_b column-parallel over the
per-head [nope|rope] / [nope|v] column blocks, o_proj row-parallel, the
shared latent projections (q_a, kv_a_with_mqa) replicated. Stacked MoE
experts ([L, E, ...] leaves) shard EXPERT-wise on the tensor axis: each
shard masks the routing table to its contiguous expert block, runs the
grouped kernel on local experts only and one psum combines shards
(mirrors ops/sharded_moe.py's GSPMD lowering, done manually here because
the stage body is already inside shard_map); shared experts
Megatron-split their own intermediate dim. Unstacked expert LISTS are
rejected (stack first — nn/fuse.fuse_model); manual TP never silently
falls back to replication — layouts that can't shard raise at
``to_pipeline``, and shape validation runs BEFORE the in-place unfuse so
a rejected call leaves the caller's pytree untouched.

Usage:
    mesh = build_mesh(pipe=4, data=2)            # or pipe=2, tensor=2, ...
    pp = to_pipeline(cfg, params, mesh)          # stack + shard layers
    logits = pipeline_forward(cfg, pp, tokens, mesh, n_microbatches=4)
    loss, lora2 = pipeline_lora_step(cfg, lora, base, tokens, mesh, ...)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.parallel.specs import ROW_PARALLEL, _quant_lin_specs, _role


def stack_layers(layers) -> Dict[str, Any]:
    """Stack a list of structurally identical layer pytrees into one
    pytree whose array leaves carry a leading [L] dim. ``None`` leaves
    (absent biases) must be None in every layer. Heterogeneous stacks
    (e.g. deepseek first-k-dense vs MoE layers) are rejected — split
    those models at the structure boundary before pipelining."""

    def rec(subtrees, path=""):
        t0 = subtrees[0]
        if isinstance(t0, dict):
            for t in subtrees[1:]:
                if not isinstance(t, dict) or set(t) != set(t0):
                    raise ValueError(
                        f"heterogeneous layer structure at '{path}': "
                        f"{sorted(t0)} vs "
                        f"{sorted(t) if isinstance(t, dict) else type(t)}")
            return {k: rec([t[k] for t in subtrees], f"{path}.{k}")
                    for k in t0}
        if t0 is None:
            if any(t is not None for t in subtrees):
                raise ValueError(f"leaf '{path}' present in only some layers")
            return None
        return jnp.stack([jnp.asarray(t) for t in subtrees])

    return rec(list(layers))


def unstack_layers(stacked: Dict[str, Any], n_layers: int):
    """Inverse of stack_layers."""
    def pick(i):
        return jax.tree_util.tree_map(lambda x: x[i], stacked)

    return [pick(i) for i in range(n_layers)]


def _validate_tp(cfg: ModelConfig, layers, n_tensor: int) -> None:
    """Reject model shapes manual stage-TP cannot split. Runs BEFORE the
    in-place unfuse in ``to_pipeline`` so a rejected checkpoint is left
    untouched. (ALiBi shards its bias sheet on the head dim; MLA shards
    q_b/kv_b/o head-wise; stacked MoE experts shard expert-wise and
    shared experts Megatron-split their intermediate — only unstacked
    expert lists remain genuinely unsplittable here.)"""
    if n_tensor == 1:
        return
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    if cfg.is_mla:
        # MLA: q_b_proj / kv_b_proj column-shard over heads; the shared
        # latent row (kv_a_with_mqa output) is replicated, so only the
        # query-head count constrains the split
        if nh % n_tensor:
            raise ValueError(
                f"PPxTP: MLA heads ({nh}) must divide tensor={n_tensor}")
    elif nh % n_tensor or nkv % n_tensor:
        raise ValueError(
            f"PPxTP: heads ({nh}/{nkv}) must divide tensor={n_tensor}")
    if not cfg.is_moe and cfg.intermediate_size % n_tensor:
        # MoE shards expert-wise; each expert keeps its full intermediate
        raise ValueError(
            f"PPxTP: intermediate ({cfg.intermediate_size}) must divide "
            f"tensor={n_tensor}")
    if cfg.is_moe:
        se = cfg.shared_expert_intermediate_size or 0
        if se % n_tensor:
            raise ValueError(
                f"PPxTP: shared-expert intermediate ({se}) must divide "
                f"tensor={n_tensor}")
        if cfg.n_shared_experts:
            tot = (cfg.moe_intermediate_size
                   or cfg.intermediate_size) * cfg.n_shared_experts
            if tot % n_tensor:
                raise ValueError(
                    f"PPxTP: shared-experts intermediate ({tot}) must "
                    f"divide tensor={n_tensor}")
    for lp in layers:
        m = lp.get("mlp", {})
        if "experts" in m:
            raise NotImplementedError(
                "PPxTP: unstacked expert lists cannot shard — stack the "
                "experts first (nn/fuse.fuse_model, quantized models)")
        if "experts_stacked" in m:
            e = np.shape(m["experts_stacked"]["gate_up_proj"]["qweight"])[0]
            if e % n_tensor:
                raise ValueError(
                    f"PPxTP: {e} experts % tensor={n_tensor} != 0")


def _lin_tp_specs(path: str, lin: Dict[str, Any], n_tensor: int):
    """Per-leaf specs for one STACKED LIN dict ([L, ...] leaves): pipe on
    the stack dim plus the Megatron tensor dim. Raises where the layout
    can't shard — manual TP has no replication fallback (the stage body's
    local-head math REQUIRES the split)."""

    def rep(leaf):
        return None if leaf is None else \
            P("pipe", *([None] * (np.ndim(leaf) - 1)))

    if "experts_stacked" in path:
        # [L, E, ...] stacked-expert leaves: experts shard on the tensor
        # axis (each shard owns a contiguous expert block; the stage body
        # masks routing and psums — see nn/modules.moe_block tp_ep)
        ax = "tensor" if n_tensor > 1 else None
        return {k: (None if v is None
                    else P("pipe", ax, *([None] * (np.ndim(v) - 2))))
                for k, v in lin.items()}

    role = _role(path)
    out = {k: rep(v) for k, v in lin.items()}
    if role is None or n_tensor == 1:
        return out
    if "qweight" in lin:
        view = {k: (None if v is None else jax.ShapeDtypeStruct(
            np.shape(v)[1:], getattr(v, "dtype", np.float32)))
            for k, v in lin.items()}
        spec2d = _quant_lin_specs(path, view, n_tensor)
        if spec2d is None:
            raise ValueError(
                f"PPxTP: quant LIN '{path}' does not divide tensor="
                f"{n_tensor} at the packing granularity "
                "(see parallel/specs.py)")
        if role == "col" and lin.get("bias") is not None \
                and spec2d.get("bias") == P():
            raise ValueError(
                f"PPxTP: '{path}' bias [{np.shape(lin['bias'])[1]}] is "
                "padded vs scales lanes and cannot column-shard")
        for k, sp in spec2d.items():
            out[k] = P("pipe", *sp)
    elif "kernel" in lin:
        kshape = np.shape(lin["kernel"])[1:]
        if role == "col":
            if kshape[1] % n_tensor:
                raise ValueError(f"PPxTP: '{path}' N={kshape[1]} % "
                                 f"tensor={n_tensor}")
            out["kernel"] = P("pipe", None, "tensor")
            if lin.get("bias") is not None:
                out["bias"] = P("pipe", "tensor")
        else:
            if kshape[0] % n_tensor:
                raise ValueError(f"PPxTP: '{path}' K={kshape[0]} % "
                                 f"tensor={n_tensor}")
            out["kernel"] = P("pipe", "tensor", None)
    if "lora_a" in lin:
        la, lb = np.shape(lin["lora_a"])[1:], np.shape(lin["lora_b"])[1:]
        if role == "col":
            if lb[1] % n_tensor:
                raise ValueError(f"PPxTP: '{path}' lora_b N % tensor")
            out["lora_b"] = P("pipe", None, "tensor")
        else:
            if la[0] % n_tensor:
                raise ValueError(f"PPxTP: '{path}' lora_a K % tensor")
            out["lora_a"] = P("pipe", "tensor", None)
    return out


def _stacked_specs(stacked: Dict[str, Any], n_tensor: int):
    """Spec pytree for the stacked layer slab: pipe everywhere, tensor on
    the Megatron dims when the mesh has a tensor axis."""

    def rec(tree, path=""):
        if isinstance(tree, dict):
            if "qweight" in tree or "kernel" in tree:
                return _lin_tp_specs(path, tree, n_tensor)
            return {k: rec(v, f"{path}.{k}") for k, v in tree.items()}
        if tree is None:
            return None
        return P("pipe", *([None] * (np.ndim(tree) - 1)))

    return rec(stacked)


def _mark_tp(lp: Dict[str, Any], axis: str, n_tensor: int) -> Dict[str, Any]:
    """TRACE-TIME copy of one layer's param dict with manual-TP markers:
    every quant LIN gets ``tp_local`` (kernel runs per-chip, no GSPMD
    wrapper), row-parallel LINs get ``tp_psum: axis`` (nn/modules.linear
    psums the partial product, bias after), a stacked-expert dict gets
    ``tp_ep: axis`` (moe_block masks routing to the local expert block and
    psums — its inner LINs are consumed raw by the grouped kernel, so no
    per-LIN markers inside), and shared-expert dicts get ``tp_div``
    (moe_block divides their intermediate: their gate/up are
    column-sharded so each shard sees 1/t of the channels). Called inside
    the scan body so the markers never enter a jit/scan operand pytree."""
    out = {}
    for k, v in lp.items():
        if isinstance(v, dict):
            if k == "experts_stacked":
                v = {**v, "tp_ep": axis}
            else:
                v = _mark_tp(v, axis, n_tensor)
                if "qweight" in v:
                    v = {**v, "tp_local": True}
                if k in ROW_PARALLEL and ("qweight" in v or "kernel" in v):
                    v = {**v, "tp_psum": axis}
                if k in ("shared_expert", "shared_experts"):
                    v = {**v, "tp_div": n_tensor}
        out[k] = v
    return out


def _local_cfg(cfg: ModelConfig, n_tensor: int) -> ModelConfig:
    """Per-shard view: each tensor shard owns nh/t query heads, nkv/t KV
    heads and I/t MLP channels; hidden/replicated dims stay global. MoE
    models keep their full intermediate (routed experts shard EXPERT-wise,
    each expert intact; shared experts divide via the tp_div marker)."""
    if n_tensor == 1:
        return cfg
    kw = dict(num_attention_heads=cfg.num_attention_heads // n_tensor)
    if cfg.num_key_value_heads % n_tensor == 0:
        kw["num_key_value_heads"] = cfg.num_key_value_heads // n_tensor
    if not cfg.is_moe:
        kw["intermediate_size"] = cfg.intermediate_size // n_tensor
    return dataclasses.replace(cfg, **kw)


def to_pipeline(cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh,
                dtype=None) -> Dict[str, Any]:
    """Stack ``params['layers']`` and device_put: stacked leaves sharded
    on ``pipe`` dim 0 (+ ``tensor`` on the Megatron dims when the mesh
    composes PP x TP), everything else replicated."""
    n_pipe = mesh.shape.get("pipe", 1)
    n_tensor = mesh.shape.get("tensor", 1)
    layers = params["layers"]
    if len(layers) % n_pipe:
        raise ValueError(
            f"{len(layers)} layers not divisible by pipe={n_pipe}")
    # validate BEFORE mutating: a rejected checkpoint (odd heads, MoE
    # expert lists, indivisible intermediates) must leave the caller's
    # pytree untouched (ADVICE r3)
    _validate_tp(cfg, layers, n_tensor)
    if n_tensor > 1 and any(
            "qkv_proj" in lp["self_attn"] or "gate_up_proj" in lp["mlp"]
            or "qkv_proj_tp" in lp["self_attn"] for lp in layers):
        # fused [q|k|v] / [gate|up] column layouts can't be head-sliced;
        # their per-linear equivalents shard fine — unfuse (in place, like
        # fuse_model) instead of rejecting the checkpoint
        from autoawq_tpu.nn.fuse import unfuse_model
        unfuse_model(cfg, params)
    stacked = stack_layers(layers)
    specs = _stacked_specs(stacked, n_tensor)

    def put(x, spec):
        x = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(dtype)
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {k: jax.tree_util.tree_map(lambda x: put(x, P()), v)
           for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = jax.tree_util.tree_map(
        put, stacked, specs)
    return out


def _stage_fn(cfg: ModelConfig, method: str, causal_prefill: bool,
              n_tensor: int = 1):
    """Per-device stage body: scan the local layer slab over x. With a
    tensor axis, each layer runs on its local head/channel shard (markers
    make nn/modules.linear psum the row-parallel outputs)."""
    lcfg = _local_cfg(cfg, n_tensor)

    def run(stage_params, x, cos, sin, mask):
        def body(h, lp):
            if n_tensor > 1:
                lp = _mark_tp(lp, "tensor", n_tensor)
            h, _ = modules.block(lcfg, lp, h, cos, sin, mask, None, None,
                                 method, causal_prefill)
            return h, None

        x, _ = jax.lax.scan(body, x, stage_params)
        return x

    return run


def _pipeline_hidden(cfg: ModelConfig, stacked, x, cos, sin, mask,
                     mesh: Mesh, n_microbatches: int, method: str,
                     causal_prefill: bool) -> jax.Array:
    """GPipe schedule over the ``pipe`` axis: x [B, S, H] -> [B, S, H].

    Every stage runs every tick (SPMD); ticks before a stage's first
    real microbatch process zeros (finite through norm/attention, results
    discarded). Total ticks M + P - 1.
    """
    n_pipe = mesh.shape["pipe"]
    b = x.shape[0]
    if b % n_microbatches:
        raise ValueError(f"batch {b} % microbatches {n_microbatches} != 0")
    n_data = mesh.shape.get("data", 1)
    if (b // n_microbatches) % n_data:
        raise ValueError(
            f"microbatch size {b // n_microbatches} not divisible by the "
            f"data axis ({n_data}) — lower n_microbatches or the dp degree")
    xm = x.reshape(n_microbatches, b // n_microbatches, *x.shape[1:])
    n_tensor = mesh.shape.get("tensor", 1)
    run_stage = _stage_fn(cfg, method, causal_prefill, n_tensor)
    m = n_microbatches

    def pipelined(stk, xm, cos, sin, mask):
        stage = jax.lax.axis_index("pipe")
        # dp is outside: each (pipe, data) device sees its data shard of
        # every microbatch, replicated over pipe
        mb = xm.shape[1:]

        def tick(carry, t):
            act, outbuf = carry
            inc = jax.lax.ppermute(
                act, "pipe", [(i, i + 1) for i in range(n_pipe - 1)])
            first_in = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            h_in = jnp.where(stage == 0, first_in, inc)
            out = run_stage(stk, h_in, cos, sin, mask)
            w = t - (n_pipe - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                outbuf, out, jnp.clip(w, 0, m - 1), 0)
            outbuf = jnp.where((stage == n_pipe - 1) & (w >= 0) & (w < m),
                               upd, outbuf)
            return (out, outbuf), None

        init = (jnp.zeros(mb, x.dtype), jnp.zeros_like(xm))
        (_, outbuf), _ = jax.lax.scan(tick, init,
                                      jnp.arange(m + n_pipe - 1))
        # replicate the last stage's buffer across the pipe axis
        outbuf = jax.lax.psum(
            jnp.where(stage == n_pipe - 1, outbuf, 0), "pipe")
        return outbuf

    act_spec = (P(None, "data", None, None)
                if "data" in mesh.axis_names else P(None, None, None, None))
    # an ALiBi bias sheet carries a real head dim: give each tensor shard
    # its contiguous head slice (matching the column-sharded q/k/v heads).
    # Gated on pos_embed — a future 4-D mask with some other non-head
    # dim-1 must NOT silently head-shard (ADVICE r3)
    mask_spec = (P(None, "tensor", None, None)
                 if n_tensor > 1 and cfg.pos_embed == "alibi"
                 and np.ndim(mask) == 4 and mask.shape[1] > 1 else P())
    stk_specs = _stacked_specs(stacked, n_tensor)
    out = jax.shard_map(
        pipelined, mesh=mesh,
        in_specs=(stk_specs, act_spec, P(), P(), mask_spec),
        out_specs=act_spec, check_vma=False,
    )(stacked, xm, cos, sin, mask)
    return out.reshape(b, *x.shape[1:])


def pipeline_forward(cfg: ModelConfig, pparams: Dict[str, Any],
                     tokens: jax.Array, mesh: Mesh,
                     n_microbatches: Optional[int] = None,
                     method: str = "jnp", dtype=None) -> jax.Array:
    """Full prefill forward through the pipelined layer stack ->
    logits [B, S, V]. Mirrors modules.forward (same rope/mask preamble)."""
    b, s = tokens.shape
    n_microbatches = n_microbatches or mesh.shape["pipe"]
    positions = jnp.arange(s)[None, :]
    x = modules.embed(cfg, pparams, tokens, dtype, positions)
    cos, sin = modules.rope_tables(cfg, positions, seq_len=s)
    mask = modules.causal_mask(s, sliding_window=cfg.sliding_window)
    if cfg.pos_embed == "alibi":
        mask = mask + modules.alibi_bias(cfg.num_attention_heads,
                                         jnp.arange(s), jnp.arange(s))
    causal_prefill = cfg.sliding_window is None and cfg.pos_embed != "alibi"
    x = _pipeline_hidden(cfg, pparams["layers_stacked"], x, cos, sin, mask,
                         mesh, n_microbatches, method, causal_prefill)
    return modules.logits_fn(cfg, pparams, x, method)


def pipeline_lora_step(cfg: ModelConfig, lora, base, tokens: jax.Array,
                       mesh: Mesh, n_microbatches: Optional[int] = None,
                       lr: float = 1e-4, method: str = "jnp"):
    """One pipelined SGD step on adapter params (stacked pytrees from
    ``to_pipeline`` + ``train.lora.split_lora``). Gradients flow through
    ppermute/scan/shard_map into each stage's local adapter slab; the
    quantized base stays frozen. Returns (loss, new_lora)."""
    from autoawq_tpu.train.lora import merge_lora

    def loss_fn(lora):
        pparams = merge_lora(lora, base)
        logits = pipeline_forward(cfg, pparams, tokens, mesh,
                                  n_microbatches, method)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    loss, grads = jax.value_and_grad(loss_fn)(lora)
    new_lora = jax.tree_util.tree_map(
        lambda p, g: p - lr * g.astype(p.dtype) if g is not None else p,
        lora, grads)
    return loss, new_lora
