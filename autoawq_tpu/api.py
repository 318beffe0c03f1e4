"""Top-level user API, mirroring the reference's facade
(``AutoAWQForCausalLM`` in awq/models/auto.py:60-141 and
``BaseAWQForCausalLM`` in awq/models/base.py:97-702):

    from autoawq_tpu import AutoAWQForCausalLM, AwqConfig

    model = AutoAWQForCausalLM.from_pretrained("/path/to/hf-fp16-checkpoint")
    model.quantize(tokenizer, quant_config={"w_bit": 4, "q_group_size": 128,
                                            "zero_point": True})
    model.save_quantized("/path/out")  # loadable by AutoAWQ/vLLM/transformers

    model = AutoAWQForCausalLM.from_quantized("/path/out")
    ids = model.generate(prompt_ids, max_new_tokens=64)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.io import serialize
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules
from autoawq_tpu.quantize.calib import get_calib_dataset
from autoawq_tpu.quantize.quantizer import AwqQuantizer
from autoawq_tpu.serve import generate as gen


class AwqCausalLM:
    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 qcfg: Optional[AwqConfig] = None):
        self.cfg = cfg
        self.params = params
        self.quant_config = qcfg
        self._quantizer: Optional[AwqQuantizer] = None

    # ------------------------------------------------------------- loading
    @classmethod
    def from_pretrained(cls, path: str) -> "AwqCausalLM":
        cfg, params = serialize.from_pretrained(path)
        return cls(cfg, params)

    @classmethod
    def from_quantized(cls, path: str, fuse_layers: bool = False) -> "AwqCausalLM":
        """Load an AutoAWQ checkpoint. ``fuse_layers=True`` concatenates
        q/k/v and gate/up packed weights for fewer kernel launches
        (reference base.py:409-570 + fuse_layers hook)."""
        cfg, qcfg, params = serialize.from_quantized(path)
        if fuse_layers:
            from autoawq_tpu.nn.fuse import fuse_model

            params = fuse_model(cfg, params)
        return cls(cfg, params, qcfg)

    # ---------------------------------------------------------- quantizing
    def quantize(
        self,
        tokenizer=None,
        quant_config: Union[AwqConfig, Dict, None] = None,
        calib_data: Any = "pileval",
        max_calib_samples: int = 128,
        max_calib_seq_len: int = 512,
        apply_clip: bool = True,
        duo_scaling: bool = True,
        export_compatible: bool = False,
        progress: bool = True,
    ) -> None:
        """Run AWQ calibration and (unless export_compatible) pack int4."""
        if isinstance(quant_config, dict) or quant_config is None:
            quant_config = AwqConfig.from_dict(quant_config)
        self.quant_config = quant_config
        calib = get_calib_dataset(
            calib_data, tokenizer, n_samples=max_calib_samples,
            max_seq_len=max_calib_seq_len,
        )
        self._quantizer = AwqQuantizer(
            self.cfg, quant_config, self.params, calib,
            duo_scaling=duo_scaling, apply_clip=apply_clip, progress=progress,
        )
        self.params = self._quantizer.quantize(export_compatible=export_compatible)

    def pack(self) -> None:
        """Pack after an ``export_compatible=True`` quantize
        (reference base.py:250-268)."""
        if self._quantizer is None:
            raise RuntimeError("call quantize(export_compatible=True) first")
        self.params = self._quantizer.pack(self.params)

    def save_quantized(self, path: str) -> None:
        if self.quant_config is None:
            raise RuntimeError("model is not quantized")
        serialize.save_quantized(path, self.cfg, self.quant_config, self.params)

    # ----------------------------------------------------------- inference
    def __call__(self, input_ids, method: str = "auto") -> jax.Array:
        return modules.forward(self.cfg, self.params, jnp.asarray(input_ids),
                               method=method)

    def generate(self, input_ids, max_new_tokens: int = 64,
                 temperature: float = 0.0, seed: int = 0,
                 eos_token_id: Optional[int] = None,
                 dtype=jnp.float32, method: str = "auto",
                 stream_callback=None) -> np.ndarray:
        out = gen.generate(
            self.cfg, self.params, jnp.asarray(input_ids), max_new_tokens,
            temperature=temperature, seed=seed, eos_token_id=eos_token_id,
            dtype=dtype, method=method, stream_callback=stream_callback,
        )
        return np.asarray(out)

    def to_device(self, dtype=jnp.bfloat16):
        """Move params to the default device, casting fp leaves.

        Casting happens host-side and the transfer is ONE batched
        ``device_put`` of the whole tree — per-leaf transfers are ~100x
        slower over a device tunnel, and host-resident params would be
        re-uploaded on every jitted call.
        """
        def cast(x):
            x = np.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(jnp.dtype(dtype))
            return x

        host = jax.tree_util.tree_map(cast, self.params)
        self.params = jax.device_put(host)
        return self


class AwqLlavaModel:
    """LLaVA-family multimodal model: fp vision tower + quantized LM
    (reference awq/models/llava.py — only the language model is quantized)."""

    def __init__(self, text_cfg: ModelConfig, vision_cfg: Dict,
                 raw_config: Dict, params: Dict[str, Any],
                 qcfg: Optional[AwqConfig] = None):
        self.cfg = text_cfg
        self.vision_cfg = vision_cfg
        self.raw_config = raw_config
        self.params = params
        self.quant_config = qcfg

    # ------------------------------------------------------------- loading
    @classmethod
    def _load(cls, path: str):
        import json
        import os

        from autoawq_tpu.io.hf import load_state_dict_from_dir
        from autoawq_tpu.models.vision import llava_params_from_state_dict

        with open(os.path.join(path, "config.json")) as f:
            raw = json.load(f)
        text_cfg = ModelConfig.from_hf_dict(raw["text_config"])
        sd = load_state_dict_from_dir(path)
        params = llava_params_from_state_dict(text_cfg, sd)
        qcfg = (AwqConfig.from_dict(raw["quantization_config"])
                if "quantization_config" in raw else None)
        return cls(text_cfg, raw["vision_config"], raw, params, qcfg)

    from_pretrained = classmethod(lambda cls, path: cls._load(path))
    from_quantized = classmethod(lambda cls, path: cls._load(path))

    # ---------------------------------------------------------- quantizing
    def quantize(self, tokenizer=None, quant_config=None, **kw) -> None:
        """AWQ-quantize the language model only (text calibration)."""
        lm = AwqCausalLM(self.cfg, self.params["language_model"])
        lm.quantize(tokenizer, quant_config, **kw)
        self.params["language_model"] = lm.params
        self.quant_config = lm.quant_config

    def save_quantized(self, path: str) -> None:
        import json
        import os

        from safetensors.numpy import save_file

        from autoawq_tpu.models.vision import llava_state_dict_from_params

        if self.quant_config is None:
            raise RuntimeError("model is not quantized")
        os.makedirs(path, exist_ok=True)
        raw = dict(self.raw_config)
        raw["quantization_config"] = self.quant_config.to_transformers_dict()
        raw.setdefault("text_config", {})["autoawq_tpu_config"] = (
            self.cfg.to_hf_dict()["autoawq_tpu_config"]
        )
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(raw, f, indent=2)
        sd = llava_state_dict_from_params(self.cfg, self.params)
        save_file(sd, os.path.join(path, "model.safetensors"))

    # ----------------------------------------------------------- inference
    def __call__(self, input_ids, pixel_values=None, method: str = "auto"):
        from autoawq_tpu.models.vision import llava_forward

        return llava_forward(
            self.cfg, self.vision_cfg, self.params,
            jnp.asarray(input_ids),
            None if pixel_values is None else jnp.asarray(pixel_values),
            image_token_index=self.raw_config.get("image_token_index", 32000),
            vision_feature_layer=self.raw_config.get("vision_feature_layer", -2),
            vision_feature_select_strategy=self.raw_config.get(
                "vision_feature_select_strategy", "default"),
            method=method,
        )

    def to_device(self, dtype=jnp.bfloat16):
        def cast(x):
            x = np.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(jnp.dtype(dtype))
            return x

        self.params = jax.device_put(jax.tree_util.tree_map(cast, self.params))
        return self


MULTIMODAL_TYPES = ("llava", "llava_next")


class AutoAWQForCausalLM:
    """Name-compatible dispatcher (reference awq/models/auto.py:60):
    routes on config.json's model_type, including multimodal wrappers."""

    @staticmethod
    def _route(path: str):
        import json
        import os

        with open(os.path.join(path, "config.json")) as f:
            mt = json.load(f).get("model_type", "llama")
        return AwqLlavaModel if mt in MULTIMODAL_TYPES else AwqCausalLM

    @classmethod
    def from_pretrained(cls, path: str):
        return cls._route(path).from_pretrained(path)

    @classmethod
    def from_quantized(cls, path: str, **kw):
        target = cls._route(path)
        if target is AwqLlavaModel:
            return target.from_quantized(path)
        return target.from_quantized(path, **kw)
