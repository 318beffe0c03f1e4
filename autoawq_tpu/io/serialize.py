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
from autoawq_tpu.io import interop
from autoawq_tpu.models.config import ModelConfig

SHARD_BYTES = 4 * 1024**3

# Tokenizer / processor / generation files that make a saved checkpoint
# drop-in loadable by transformers AutoTokenizer / AutoProcessor with zero
# manual copying (reference: awq/models/base.py:294-301 saves the processor
# for vision models; HF save_pretrained writes the rest alongside).
AUX_FILE_PATTERNS = (
    "tokenizer.json", "tokenizer_config.json", "special_tokens_map.json",
    "vocab.json", "vocab.txt", "merges.txt", "added_tokens.json",
    "*.model",  # sentencepiece (tokenizer.model, spiece.model, ...)
    "preprocessor_config.json", "processor_config.json",
    "image_processor_config.json", "video_preprocessor_config.json",
    "chat_template.json", "chat_template.jinja",
    "generation_config.json", "spk_dict.pt",
)


def copy_aux_files(src_path: Optional[str], dst_path: str) -> list:
    """Copy tokenizer / processor / generation_config files from the source
    checkpoint directory into a save_quantized output dir, and synthesize a
    minimal generation_config.json from config.json token ids when the
    source has none (reference: awq/models/base.py:294-301 — the processor
    is saved with vision models and generation_config ships with the HF
    model; without these a quantized dir can't be used by AutoTokenizer /
    transformers pipelines without hand-copying). Returns copied names."""
    import fnmatch
    import shutil

    copied = []
    if src_path and os.path.isdir(src_path) and (
            os.path.abspath(src_path) != os.path.abspath(dst_path)):
        for name in sorted(os.listdir(src_path)):
            full = os.path.join(src_path, name)
            if not os.path.isfile(full):
                continue
            if any(fnmatch.fnmatch(name, p) for p in AUX_FILE_PATTERNS):
                if name.endswith(".safetensors"):  # *.model can't match, but
                    continue  # be safe against pattern additions
                shutil.copy2(full, os.path.join(dst_path, name))
                copied.append(name)
    if "generation_config.json" not in copied:
        gen: Dict[str, Any] = {}
        src_cfg = os.path.join(src_path or "", "config.json")
        if src_path and os.path.isfile(src_cfg):
            with open(src_cfg) as f:
                raw = json.load(f)
            for k in ("bos_token_id", "eos_token_id", "pad_token_id"):
                if raw.get(k) is not None:
                    gen[k] = raw[k]
        if gen:
            with open(os.path.join(dst_path, "generation_config.json"),
                      "w") as f:
                json.dump(gen, f, indent=2)
            copied.append("generation_config.json")
    return copied


def resolve_model_path(model_name_or_path: str, **download_kwargs) -> str:
    """Local directory passthrough, or HF-hub ``snapshot_download`` for a
    repo id (reference: awq/models/base.py:572-632 ``_load_config``).

    Only config + safetensors weights + tokenizer files are fetched
    (matching the reference's ignore list of *.msgpack/*.h5 etc)."""
    if os.path.isdir(model_name_or_path):
        return model_name_or_path
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover
        raise FileNotFoundError(
            f"{model_name_or_path} is not a local directory and "
            "huggingface_hub is not installed to download it"
        ) from e
    return snapshot_download(
        model_name_or_path,
        allow_patterns=["*.json", "*.safetensors", "*.model", "*.txt"],
        **download_kwargs,
    )


def save_quantized(
    path: str,
    cfg: ModelConfig,
    qcfg: AwqConfig,
    params: Dict[str, Any],
    shard_bytes: int = SHARD_BYTES,
    src_path: Optional[str] = None,
) -> None:
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    copy_aux_files(src_path, path)
    hf_cfg = cfg.to_hf_dict()
    hf_cfg["quantization_config"] = qcfg.to_transformers_dict()
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)

    sd = hf_io.state_dict_from_params(cfg, params, hf_io.role_out_features(cfg))
    if qcfg.version.lower() in interop._CONVERTIBLE:
        # pack per quant_config.version like the reference quantizer
        # (awq/quantize/quantizer.py:236-252): gemv / gemv_fast / marlin
        # consumers read their native layout directly
        sd = interop.convert_gemm_state_dict_to(
            sd, qcfg.version, qcfg.q_group_size)
    for k, v in params.get("_extra", {}).items():  # unmodeled tensors
        v = np.asarray(v)
        sd[k] = v.astype(np.float16) if v.dtype == np.float32 else v
    write_safetensors(path, _reprefix_omni_keys(cfg, sd), shard_bytes)


def write_safetensors(path: str, sd: Dict[str, np.ndarray],
                      shard_bytes: int = SHARD_BYTES) -> None:
    """Write a state dict as model.safetensors, or size-sharded files plus
    an HF-style index when it exceeds ``shard_bytes``."""
    from safetensors.numpy import save_file

    # save_file serializes raw memory: an F-contiguous (e.g. transposed or
    # fancy-indexed) array would be written byte-transposed and read back
    # scrambled — normalize every tensor to C order first
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    total = sum(v.nbytes for v in sd.values())
    if total <= shard_bytes:
        save_file(sd, os.path.join(path, "model.safetensors"))
        return
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


class _TrackingSD(dict):
    """State dict that records which keys the layer map actually reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def _normalize_omni_keys(cfg: ModelConfig,
                         sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Full Qwen2.5-Omni checkpoints nest the quantizable LM under a
    ``thinker.`` prefix (thinker.model.layers.* / thinker.lm_head.* /
    thinker.audio_tower.* / thinker.visual.*); strip it so the standard
    layer map applies. ``talker.*`` / ``token2wav.*`` keep their names and
    land in params["_extra"] — they are never quantized and have no JAX
    forward here (the reference likewise leaves them as live HF modules,
    awq/models/qwen2_5_omni.py:11-36); save_quantized round-trips them and
    re-adds the thinker prefix (_reprefix_omni_keys)."""
    if cfg.model_type != "qwen2_5_omni":
        return sd
    return {(k[len("thinker."):] if k.startswith("thinker.") else k): v
            for k, v in sd.items()}


def _reprefix_omni_keys(cfg: ModelConfig,
                        sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse of _normalize_omni_keys for save: HF's full-omni layout."""
    if cfg.model_type != "qwen2_5_omni":
        return sd
    return {(k if k.startswith(("talker.", "token2wav."))
             else "thinker." + k): v
            for k, v in sd.items()}


def _load_params_with_extras(cfg: ModelConfig,
                             sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """params_from_state_dict + preserve tensors the layer map doesn't
    model (e.g. phi3_v's ``model.vision_embed_tokens.*``, stray rotary
    buffers) in ``params["_extra"]`` so save_quantized round-trips them —
    the analogue of the reference mutating the HF tree in place, which
    keeps unknown submodules for free."""
    sd = _normalize_omni_keys(cfg, sd)
    tsd = _TrackingSD(sd)
    params = hf_io.params_from_state_dict(cfg, tsd)
    extra = {k: np.asarray(v) for k, v in sd.items()
             if k not in tsd.consumed}
    if extra:
        params["_extra"] = extra
    return params


def from_quantized(path: str) -> Tuple[ModelConfig, AwqConfig, Dict[str, Any]]:
    """Load an AutoAWQ-format quantized checkpoint (ours or upstream's).
    ``path`` may be a local directory or an HF-hub repo id."""
    path = resolve_model_path(path)
    cfg, qcfg = load_config(path)
    if qcfg is None:
        raise ValueError(f"{path} has no quantization_config")
    sd = hf_io.load_state_dict_from_dir(path)
    if qcfg.version.lower() in interop._CONVERTIBLE:
        sd = interop.convert_state_dict_to_gemm(
            sd, qcfg.version, qcfg.q_group_size)
    params = _load_params_with_extras(cfg, sd)
    return cfg, qcfg, params


def from_pretrained(path: str) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Load an fp16/fp32 HF checkpoint into the functional param pytree.
    ``path`` may be a local directory or an HF-hub repo id."""
    path = resolve_model_path(path)
    cfg, _ = load_config(path)
    sd = hf_io.load_state_dict_from_dir(path)
    sd = {k: np.asarray(v).astype(np.float32) for k, v in sd.items()}
    params = _load_params_with_extras(cfg, sd)
    return cfg, params
