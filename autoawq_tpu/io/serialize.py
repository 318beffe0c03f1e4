"""Checkpoint save/load: HF-layout directories with AutoAWQ-compatible
quantized tensors (reference: awq/models/base.py:274-319 save path,
base.py:409-570 load path).

Directory layout:
  config.json            — HF model config + ``quantization_config``
  model.safetensors      — single file, or
  model-0000N-of-0000M.safetensors + model.safetensors.index.json — sharded
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.io import hf as hf_io
from autoawq_tpu.models.config import ModelConfig

SHARD_BYTES = 4 * 1024**3


def save_quantized(
    path: str,
    cfg: ModelConfig,
    qcfg: AwqConfig,
    params: Dict[str, Any],
    shard_bytes: int = SHARD_BYTES,
) -> None:
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    hf_cfg = cfg.to_hf_dict()
    hf_cfg["quantization_config"] = qcfg.to_transformers_dict()
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)

    sd = hf_io.state_dict_from_params(cfg, params, hf_io.role_out_features(cfg))
    total = sum(v.nbytes for v in sd.values())
    if total <= shard_bytes:
        save_file(sd, os.path.join(path, "model.safetensors"))
        return
    # size-based sharding with an HF-style index
    shards, cur, cur_bytes = [], {}, 0
    for k, v in sd.items():
        if cur and cur_bytes + v.nbytes > shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += v.nbytes
    shards.append(cur)
    index = {"metadata": {"total_size": total}, "weight_map": {}}
    n = len(shards)
    for i, shard in enumerate(shards):
        name = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(path, name))
        for k in shard:
            index["weight_map"][k] = name
    with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f, indent=2)


def load_config(path: str) -> Tuple[ModelConfig, Optional[AwqConfig]]:
    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    cfg = ModelConfig.from_hf_dict(raw)
    qcfg = (
        AwqConfig.from_dict(raw["quantization_config"])
        if "quantization_config" in raw
        else None
    )
    return cfg, qcfg


def from_quantized(path: str) -> Tuple[ModelConfig, AwqConfig, Dict[str, Any]]:
    """Load an AutoAWQ-format quantized checkpoint (ours or upstream's)."""
    cfg, qcfg = load_config(path)
    if qcfg is None:
        raise ValueError(f"{path} has no quantization_config")
    sd = hf_io.load_state_dict_from_dir(path)
    params = hf_io.params_from_state_dict(cfg, sd)
    return cfg, qcfg, params


def from_pretrained(path: str) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Load an fp16/fp32 HF checkpoint into the functional param pytree."""
    cfg, _ = load_config(path)
    sd = hf_io.load_state_dict_from_dir(path)
    sd = {k: np.asarray(v).astype(np.float32) for k, v in sd.items()}
    params = hf_io.params_from_state_dict(cfg, sd)
    return cfg, params
