"""PartitionSpec rules for the functional param pytree.

Megatron-style tensor parallelism over the ``tensor`` axis:

* column-parallel (q/k/v/gate/up/lm_head): shard the *output* dim — for a
  planar-packed quant LIN that is the packed-lane dim of ``qweight
  [K, N8]`` (at 256-lane superblock granularity, so every shard decodes a
  contiguous logical-column range) and the lane dim of scales/qzeros; bias
  shards too.
* row-parallel (o/down): shard the *contraction* dim — rows of ``qweight``
  and the group dim of scales/qzeros (in multiples of TWO groups, so the
  row-paired qzeros packing never straddles a shard). The psum after the
  matmul is inserted by ops/sharded_gemm.py (fused kernel) or GSPMD (jnp).
* MoE stacked experts ([E, ...] leaves) shard their expert dim on
  ``expert``; per-expert dict layout shards like dense layers.
* norms / embeddings replicated; KV cache shards on the head dim.

A quantized LIN is decided as a UNIT: it is col-/row-parallel only when
*every* leaf (qweight, scales, qzeros, bias) divides cleanly — mixing a
sharded qweight with replicated scales would hand ops/sharded_gemm.py an
unsatisfiable layout. When a parallel-role LIN has to fall back to
replication, a warning is logged (no silent caps — SURVEY §5).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                   "lm_head", "w1", "w3", "qkv_proj", "gate_up_proj",
                   "fc1", "q_b_proj", "kv_b_proj")
ROW_PARALLEL = ("o_proj", "down_proj", "w2", "fc2")

# replication fallbacks on layers smaller than this are expected (tiny
# test models) and not worth a log line
_WARN_BYTES = 1 << 20


def _nbytes(tree) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += int(np.prod(np.shape(leaf))) * getattr(
            np.asarray(leaf) if not hasattr(leaf, "dtype") else leaf,
            "dtype", np.dtype("f4")).itemsize
    return total


def _role(path: str) -> Optional[str]:
    if any(r in path for r in COLUMN_PARALLEL):
        return "col"
    if any(r in path for r in ROW_PARALLEL):
        return "row"
    return None


def _quant_lin_specs(path: str, lin: Dict[str, Any],
                     tensor_size: int) -> Optional[Dict[str, P]]:
    """Joint col/row specs for a packed-planar quant LIN, or None to
    replicate. Divisibility contract mirrors ops/sharded_gemm.py."""
    role = _role(path)
    if role is None or tensor_size == 1:
        return None
    qw = np.shape(lin["qweight"])
    g, n_pad = np.shape(lin["scales"])
    bias = lin.get("bias")
    if role == "col":
        # superblock (256-lane) granularity keeps every shard's lanes
        # decoding to a contiguous logical-column range
        if qw[1] % (tensor_size * 256) != 0:
            return None
        specs = {"qweight": P(None, "tensor"), "scales": P(None, "tensor"),
                 "qzeros": P(None, "tensor")}
        if bias is not None:
            specs["bias"] = (P("tensor") if np.shape(bias)[0] == n_pad
                             else P())
        return specs
    # row-parallel: shard K — qweight packed rows, scales/qzeros groups.
    # G in multiples of 2*tp keeps the paired qzeros packing intact and an
    # even group count per shard (the fused kernel's BK granularity).
    if qw[0] % tensor_size != 0 or g % (2 * tensor_size) != 0:
        return None
    specs = {"qweight": P("tensor", None), "scales": P("tensor", None),
             "qzeros": P("tensor", None)}
    if bias is not None:
        specs["bias"] = P()  # bias adds after the psum, replicated
    return specs


def _float_kernel_spec(path: str, shape, tensor_size: int) -> P:
    role = _role(path)
    if role == "col" and shape[-1] % tensor_size == 0:
        return P(*([None] * (len(shape) - 1)), "tensor")
    if role == "row" and shape[0] % tensor_size == 0 and len(shape) == 2:
        return P("tensor", None)
    return P()


def param_specs(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Pytree of NamedShardings matching ``params``' structure."""
    tensor_size = mesh.shape.get("tensor", 1)
    expert_size = mesh.shape.get("expert", 1)

    def leaf_spec(path: str, leaf_name: str, shape) -> P:
        if len(shape) >= 3:
            # stacked-expert leaf [E, ...]: expert-parallel axis
            if "experts_stacked" in path and shape[0] % expert_size == 0 \
                    and expert_size > 1:
                return P("expert")
            return P()
        if leaf_name in ("kernel",) and len(shape) == 2:
            return _float_kernel_spec(path, shape, tensor_size)
        if leaf_name == "bias" and len(shape) == 1:
            if _role(path) == "col" and shape[0] % tensor_size == 0:
                return P("tensor")
            return P()
        return P()

    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "qweight" in tree and path.endswith("qkv_proj_tp"):
                # per-chip re-fused qkv stack [tp, ...] (nn/fuse.
                # tp_stack_qkv): dim 0 is one entry per tensor-axis chip
                tp_dim = np.shape(tree["qweight"])[0]
                spec_ok = tensor_size > 1 and tp_dim == tensor_size
                return {
                    k: (None if v is None else NamedSharding(
                        mesh,
                        P("tensor", *([None] * (np.ndim(v) - 1)))
                        if spec_ok else P()))
                    for k, v in tree.items()
                }
            if "qweight" in tree and np.ndim(tree["qweight"]) == 3:
                # stacked-expert LIN [E, ...]: expert-parallel on dim 0
                e = np.shape(tree["qweight"])[0]
                spec = (P("expert") if expert_size > 1
                        and e % expert_size == 0 else P())
                return {
                    k: (None if v is None else NamedSharding(mesh, spec))
                    for k, v in tree.items()
                }
            if "qweight" in tree:  # quant LIN: jointly consistent specs
                specs = _quant_lin_specs(path, tree, tensor_size)
                if specs is None:
                    if _role(path) and tensor_size > 1 \
                            and _nbytes(tree) >= _WARN_BYTES:
                        logger.warning(
                            "TP fallback: %s does not divide over "
                            "tensor=%d — running replicated", path,
                            tensor_size)
                    return {
                        k: (None if v is None
                            else NamedSharding(mesh, P()))
                        for k, v in tree.items()
                    }
                return {
                    k: (None if v is None else NamedSharding(
                        mesh, specs.get(k, P())))
                    for k, v in tree.items()
                }
            return {
                k: walk(v, f"{path}.{k}" if path else k)
                for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [walk(v, f"{path}.{i}") for i, v in enumerate(tree)]
        if tree is None:
            return None
        leaf_name = path.split(".")[-1]
        return NamedSharding(mesh, leaf_spec(path, leaf_name, np.shape(tree)))

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
