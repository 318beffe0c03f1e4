"""PartitionSpec rules for the functional param pytree.

Megatron-style tensor parallelism over the ``tensor`` axis:

* column-parallel (q/k/v/gate/up/lm_head): shard the *output* dim — for a
  planar-packed quant LIN that is the packed-lane dim of ``qweight
  [K, N8]`` and the lane dim of scales/qzeros; bias shards too.
* row-parallel (o/down): shard the *contraction* dim — rows of ``qweight``
  and the group dim of scales/qzeros. XLA inserts the psum after the
  matmul automatically.
* MoE experts additionally shard their stacked expert dim on ``expert``
  (once expert-stacked; per-expert dict layout shards like dense layers).
* norms / embeddings replicated; KV cache shards on the head dim.

All rules are *advisory* NamedShardings on params — GSPMD propagates the
rest. A rule returns None (replicate) when the dim is not divisible.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                   "lm_head", "w1", "w3")
ROW_PARALLEL = ("o_proj", "down_proj", "w2")


def _leaf_spec(path: str, leaf_name: str, shape, tensor_size: int) -> P:
    """Spec for one array inside a LIN/module dict at param path ``path``."""
    parts = path.split(".")
    role = parts[-2] if len(parts) >= 2 else parts[-1]
    if role in ("q_norm", "k_norm") or "layernorm" in path or path == "norm.weight":
        return P()
    col = any(r in path for r in COLUMN_PARALLEL)
    row = any(r in path for r in ROW_PARALLEL)
    if not (col or row):
        return P()

    def div(dim_idx: int) -> bool:
        return shape[dim_idx] % tensor_size == 0

    if leaf_name == "kernel":  # [K, N]
        if col and div(1):
            return P(None, "tensor")
        if row and div(0):
            return P("tensor", None)
    elif leaf_name == "qweight":  # [K/2, N_pad/4] row-paired planar
        if col and shape[1] % (tensor_size * 256) == 0:
            return P(None, "tensor")
        if row and div(0):
            return P("tensor", None)
    elif leaf_name == "scales":  # [G, N_pad]
        if col and shape[1] % (tensor_size * 1024) == 0:
            return P(None, "tensor")
        if row and div(0):
            return P("tensor", None)
    elif leaf_name == "qzeros":  # [ceil(G/2), N_pad/4]
        if col and shape[1] % (tensor_size * 256) == 0:
            return P(None, "tensor")
        if row and div(0):
            return P("tensor", None)
    elif leaf_name == "bias":  # [N]
        if col and div(0):
            return P("tensor")
        return P()
    return P()


def param_specs(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Pytree of NamedShardings matching ``params``' structure."""
    tensor_size = mesh.shape.get("tensor", 1)

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {
                k: walk(v, f"{path}.{k}" if path else k) for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [walk(v, f"{path}.{i}") for i, v in enumerate(tree)]
        if tree is None:
            return None
        leaf_name = path.split(".")[-1]
        spec = _leaf_spec(path, leaf_name, np.shape(tree), tensor_size)
        return NamedSharding(mesh, spec)

    return walk(params)


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 dtype=None) -> Dict[str, Any]:
    """device_put the pytree with TP shardings (casting fp leaves)."""
    import jax.numpy as jnp

    specs = param_specs(params, mesh)

    def put(x, s):
        x = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(dtype)
        return jax.device_put(x, s)

    return jax.tree_util.tree_map(put, params, specs)
