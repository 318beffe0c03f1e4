"""LoRA fine-tuning on a frozen quantized base.

Parity target: the reference's PEFT training flow (examples/train.py +
``WQLinearMMFunction.backward``, awq/modules/linear/gemm.py:88-114) —
gradients flow through the dequantized int4 weights into low-rank adapters
only. Here adapters live as ``lora_a``/``lora_b`` leaves inside LIN dicts;
``split_lora`` separates the trainable pytree so ``jax.grad`` differentiates
only the adapters, and the quantized base stays donated/static.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.io.hf import role_out_features
from autoawq_tpu.nn import modules
from autoawq_tpu.utils.tree import get_by_path, iter_linears

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")


def add_lora(
    cfg: ModelConfig,
    params: Dict[str, Any],
    rank: int = 8,
    alpha: float = 16.0,
    targets: Tuple[str, ...] = DEFAULT_TARGETS,
    seed: int = 0,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Insert zero-initialized-B / gaussian-A adapters into target LINs."""
    rng = np.random.default_rng(seed)
    roles = role_out_features(cfg)
    for li, lp in enumerate(params["layers"]):
        for path, p in iter_linears(lp):
            role = path.split(".")[-1]
            if role not in targets:
                continue
            k = (
                p["kernel"].shape[0] if "kernel" in p
                else 2 * p["qweight"].shape[0]  # row-paired planar packing
            )
            parts = path.split(".")
            role_key = (
                "mlp.experts." + parts[-1]
                if len(parts) > 2 and parts[1] == "experts"
                else path
            )
            n = roles[role_key] if role_key in roles else roles[path]
            # alpha/rank scaling folded into A at init (keeps the
            # trainable pytree free of non-array leaves)
            p["lora_a"] = jnp.asarray(
                rng.standard_normal((k, rank)) * (alpha / rank**2), dtype
            )
            p["lora_b"] = jnp.zeros((rank, n), dtype)
    return params


def split_lora(params):
    """-> (lora_tree, base) where lora_tree mirrors params but carries only
    adapter leaves; base has them removed. merge_lora() re-joins."""
    lora, base = {}, {}

    def walk(tree, lora_out, base_out):
        for k, v in tree.items():
            if isinstance(v, dict):
                lo, bo = {}, {}
                walk(v, lo, bo)
                if lo:
                    lora_out[k] = lo
                base_out[k] = bo if bo else v
            elif isinstance(v, list):
                los, bos = [], []
                for item in v:
                    lo, bo = {}, {}
                    walk(item, lo, bo)
                    los.append(lo)
                    bos.append(bo)
                if any(los):
                    lora_out[k] = los
                base_out[k] = bos
            elif k.startswith("lora_"):
                lora_out[k] = v
            else:
                base_out[k] = v

    walk(params, lora, base)
    return lora, base


def merge_lora(lora, base):
    if isinstance(base, dict):
        out = dict(base)
        for k, v in (lora or {}).items():
            if k in base and isinstance(base[k], (dict, list)):
                out[k] = merge_lora(v, base[k])
            else:
                out[k] = v
        return out
    if isinstance(base, list):
        lora = lora or [None] * len(base)
        return [merge_lora(l, b) for l, b in zip(lora, base)]
    return base


def causal_lm_loss(cfg: ModelConfig, params: Dict[str, Any],
                   tokens: jax.Array, method: str = "jnp") -> jax.Array:
    logits = modules.forward(cfg, params, tokens, method=method)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


def lora_train_step(cfg: ModelConfig, lora, base, tokens, lr: float = 1e-4,
                    method: str = "jnp"):
    """One SGD step on adapter params only. Returns (loss, new_lora)."""

    def loss_fn(lora):
        return causal_lm_loss(cfg, merge_lora(lora, base), tokens, method)

    loss, grads = jax.value_and_grad(loss_fn)(lora)
    new_lora = jax.tree_util.tree_map(
        lambda p, g: p - lr * g.astype(p.dtype) if g is not None else p,
        lora, grads,
    )
    return loss, new_lora


def make_optimizer(name: str = "adamw", lr: float = 1e-4,
                   weight_decay: float = 0.0):
    """An optax transform for adapter training. The reference trains LoRA
    through HF Trainer, whose default is AdamW (examples/train.py) —
    ``adamw`` here matches that; ``sgd`` matches lora_train_step."""
    import optax

    if name == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay)
    if name == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {name!r}")


def lora_train_step_optax(cfg: ModelConfig, lora, base, opt_state, tokens,
                          tx, method: str = "jnp"):
    """One optax step on adapter params only (jit with ``tx`` closed
    over or static). Returns (loss, new_lora, new_opt_state)."""

    def loss_fn(lora):
        return causal_lm_loss(cfg, merge_lora(lora, base), tokens, method)

    loss, grads = jax.value_and_grad(loss_fn)(lora)
    updates, opt_state = tx.update(grads, opt_state, lora)
    new_lora = jax.tree_util.tree_map(
        lambda p, u: p + u.astype(p.dtype), lora, updates)
    return loss, new_lora, opt_state
