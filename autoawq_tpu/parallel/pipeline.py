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

Usage:
    mesh = build_mesh(pipe=4, data=2)
    pp = to_pipeline(cfg, params, mesh)          # stack + shard layers
    logits = pipeline_forward(cfg, pp, tokens, mesh, n_microbatches=4)
    loss, lora2 = pipeline_lora_step(cfg, lora, base, tokens, mesh, ...)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules


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


def to_pipeline(cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh,
                dtype=None) -> Dict[str, Any]:
    """Stack ``params['layers']`` and device_put: stacked leaves sharded
    on ``pipe`` dim 0, everything else replicated."""
    n_pipe = mesh.shape.get("pipe", 1)
    layers = params["layers"]
    if len(layers) % n_pipe:
        raise ValueError(
            f"{len(layers)} layers not divisible by pipe={n_pipe}")
    stacked = stack_layers(layers)

    def put(x, spec):
        x = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(dtype)
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_stacked(tree):
        return jax.tree_util.tree_map(
            lambda x: put(x, P("pipe", *([None] * (np.ndim(x) - 1)))), tree)

    out = {k: jax.tree_util.tree_map(lambda x: put(x, P()), v)
           for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = put_stacked(stacked)
    return out


def _stage_fn(cfg: ModelConfig, method: str, causal_prefill: bool):
    """Per-device stage body: scan the local layer slab over x."""

    def run(stage_params, x, cos, sin, mask):
        def body(h, lp):
            h, _ = modules.block(cfg, lp, h, cos, sin, mask, None, None,
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
    run_stage = _stage_fn(cfg, method, causal_prefill)
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
    stk_specs = jax.tree_util.tree_map(
        lambda leaf: P("pipe", *([None] * (np.ndim(leaf) - 1))), stacked)
    out = jax.shard_map(
        pipelined, mesh=mesh,
        in_specs=(stk_specs, act_spec, P(), P(), P()),
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
