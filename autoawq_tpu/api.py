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
        # source checkpoint dir, so save_quantized can carry the tokenizer /
        # processor / generation_config files along (reference
        # base.py:294-301)
        self._src_path: Optional[str] = None

    # ------------------------------------------------------------- loading
    @classmethod
    def from_pretrained(cls, path: str) -> "AwqCausalLM":
        src = serialize.resolve_model_path(path)
        cfg, params = serialize.from_pretrained(src)
        m = cls(cfg, params)
        m._src_path = src
        return m

    @classmethod
    def from_quantized(cls, path: str, fuse_layers: bool = False) -> "AwqCausalLM":
        """Load an AutoAWQ checkpoint. ``fuse_layers=True`` concatenates
        q/k/v and gate/up packed weights for fewer kernel launches
        (reference base.py:409-570 + fuse_layers hook)."""
        src = serialize.resolve_model_path(path)
        cfg, qcfg, params = serialize.from_quantized(src)
        if fuse_layers:
            from autoawq_tpu.nn.fuse import fuse_model

            params = fuse_model(cfg, params)
        m = cls(cfg, params, qcfg)
        m._src_path = src
        return m

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
        n_parallel_calib_samples: Optional[int] = None,
        offload_taps: bool = False,
        resume_dir: Optional[str] = None,
        mesh=None,
        quantize_lm_head: bool = False,
    ) -> None:
        """Run AWQ calibration and (unless export_compatible) pack int4.

        Memory knobs for big models on one chip (reference:
        awq/quantize/quantizer.py:268-292,631): ``n_parallel_calib_samples``
        runs calibration forwards in sample chunks; ``offload_taps`` keeps
        captured input features host-resident between searches. Weights
        already stream per-layer. ``resume_dir`` checkpoints each finished
        layer for crash-resume.

        ``mesh`` (a ``jax.sharding.Mesh`` with a ``data`` axis) runs
        calibration data-parallel: the calib batch shards over the axis and
        GSPMD psums the batch statistics — the TPU-native replacement for
        the reference's round-robin layer placement (SURVEY §2.6,
        awq/quantize/quantizer.py:130-138).
        """
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
            n_parallel_calib_samples=n_parallel_calib_samples,
            offload_taps=offload_taps, resume_dir=resume_dir, mesh=mesh,
            quantize_lm_head=quantize_lm_head,
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
        serialize.save_quantized(path, self.cfg, self.quant_config,
                                 self.params, src_path=self._src_path)

    # ----------------------------------------------------------- inference
    def __call__(self, input_ids, method: str = "auto") -> jax.Array:
        return modules.forward(self.cfg, self.params, jnp.asarray(input_ids),
                               method=method)

    def generate(self, input_ids, max_new_tokens: int = 64,
                 temperature: float = 0.0, top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 repetition_penalty: float = 1.0, seed: int = 0,
                 eos_token_id: Optional[int] = None,
                 dtype=jnp.float32, method: str = "auto",
                 kv_quant: bool = False,
                 num_beams: int = 1, length_penalty: float = 1.0,
                 early_stopping=False, num_return_sequences: int = 1,
                 stream_callback=None) -> np.ndarray:
        if num_return_sequences > 1 and num_beams <= 1:
            raise ValueError("num_return_sequences > 1 needs num_beams > 1")
        if num_beams > 1:
            # HF-semantics-exact beam search (serve/beam.py) — the
            # reference inherits this surface from GenerationMixin.
            # temperature > 0 switches to stochastic beams (Gumbel-top-k
            # beam sampling; see serve/beam.py docstring).
            if kv_quant or stream_callback is not None:
                raise NotImplementedError(
                    "num_beams > 1 does not support kv_quant or "
                    "stream_callback")
            if repetition_penalty != 1.0:
                raise NotImplementedError(
                    "repetition_penalty under beam search is not "
                    "implemented (it would silently diverge from the HF "
                    "beam surface otherwise)")
            from autoawq_tpu.serve.beam import generate_beam_batched

            ids = np.atleast_2d(np.asarray(input_ids))
            results = generate_beam_batched(
                self.cfg, self.params, list(ids),
                max_new_tokens, num_beams=num_beams,
                length_penalty=length_penalty,
                early_stopping=early_stopping, eos_token_id=eos_token_id,
                method=method, dtype=dtype,
                num_return_sequences=num_return_sequences,
                do_sample=bool(temperature and temperature > 0.0),
                temperature=temperature or 1.0, top_k=top_k, top_p=top_p,
                seed=seed)
            # HF layout: [B * num_return_sequences, L], rows padded to the
            # longest return with pad(=eos) on the right
            rows = [r for seqs, _ in results for r in seqs]
            ln = max(len(r) for r in rows)
            pad = eos_token_id if eos_token_id is not None else 0
            return np.stack([np.pad(r, (0, ln - len(r)),
                                    constant_values=pad) for r in rows])
        out = gen.generate(
            self.cfg, self.params, jnp.asarray(input_ids), max_new_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, seed=seed,
            eos_token_id=eos_token_id, dtype=dtype, method=method,
            kv_quant=kv_quant, stream_callback=stream_callback,
        )
        return np.asarray(out)

    def shard(self, mesh, dtype=jnp.bfloat16, tp_attention: bool = True):
        """Shard params over a ``jax.sharding.Mesh`` for TP/EP serving:
        Megatron column/row-parallel packed-int4 shardings on the
        ``tensor`` axis, stacked-expert sharding on ``expert``
        (parallel/specs.py). ``tp_attention=True`` additionally builds the
        per-chip re-fused qkv stack (nn/fuse.tp_stack_qkv) when the
        checkpoint still carries unfused quantized q/k/v and the head
        counts divide the tensor axis — enabling the fused attention-step
        megakernel under TP (ops/tp_attn.py). Replaces the reference's
        accelerate layer-pipeline multi-GPU story (SURVEY §2.6)."""
        from autoawq_tpu.nn.fuse import tp_stack_qkv
        from autoawq_tpu.parallel.specs import shard_params

        tensor = mesh.shape.get("tensor", 1)
        if tp_attention and tensor > 1 and not self.cfg.is_mla:
            nh = self.cfg.num_attention_heads
            nkv = self.cfg.num_key_value_heads
            first = self.params["layers"][0]["self_attn"]
            if (nh % tensor == 0 and nkv % tensor == 0
                    and "qweight" in first.get("q_proj", {})):
                tp_stack_qkv(self.cfg, self.params, tensor)
        self.params = shard_params(self.params, mesh, dtype=dtype)
        self.mesh = mesh
        return self

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
        self._src_path: Optional[str] = None

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
        m = cls(text_cfg, raw["vision_config"], raw, params, qcfg)
        m._src_path = path
        return m

    @classmethod
    def from_pretrained(cls, path: str) -> "AwqLlavaModel":
        return cls._load(serialize.resolve_model_path(path))

    @classmethod
    def from_quantized(cls, path: str, fuse_layers: bool = False,
                       to_device: bool = False,
                       dtype=jnp.bfloat16) -> "AwqLlavaModel":
        """Load a quantized LLaVA checkpoint. ``fuse_layers`` fuses the
        LANGUAGE model's q/k/v + gate/up (the vision tower stays fp);
        ``to_device`` batches the params onto the accelerator
        (reference from_quantized knobs, awq/models/base.py:409-479)."""
        m = cls._load(serialize.resolve_model_path(path))
        if fuse_layers:
            from autoawq_tpu.nn.fuse import fuse_model

            m.params["language_model"] = fuse_model(
                m.cfg, m.params["language_model"])
        if to_device:
            m.to_device(dtype)
        return m

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

        from autoawq_tpu.models.vision import llava_state_dict_from_params

        if self.quant_config is None:
            raise RuntimeError("model is not quantized")
        os.makedirs(path, exist_ok=True)
        # carry the processor/tokenizer files so the dir is drop-in for HF
        # pipelines (reference saves the processor: base.py:294-301)
        serialize.copy_aux_files(self._src_path, path)
        raw = dict(self.raw_config)
        raw["quantization_config"] = self.quant_config.to_transformers_dict()
        raw.setdefault("text_config", {})["autoawq_tpu_config"] = (
            self.cfg.to_hf_dict()["autoawq_tpu_config"]
        )
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(raw, f, indent=2)
        sd = llava_state_dict_from_params(self.cfg, self.params)
        serialize.write_safetensors(path, sd)  # shards past 4 GB

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

    def input_embeds(self, input_ids, pixel_values=None,
                     dtype=jnp.float32) -> jax.Array:
        """Multimodal prompt embeds [B, S, H] (vision features spliced at
        the image tokens) — feed `prompt_embeds` of `generate` or a
        serving engine's `add_request`."""
        from autoawq_tpu.models.vision import llava_input_embeds

        return llava_input_embeds(
            self.cfg, self.vision_cfg, self.params, jnp.asarray(input_ids),
            None if pixel_values is None else jnp.asarray(pixel_values),
            image_token_index=self.raw_config.get("image_token_index",
                                                  32000),
            vision_feature_layer=self.raw_config.get(
                "vision_feature_layer", -2),
            vision_feature_select_strategy=self.raw_config.get(
                "vision_feature_select_strategy", "default"),
            dtype=dtype)

    def generate(self, input_ids, pixel_values=None,
                 max_new_tokens: int = 64, dtype=jnp.float32,
                 method: str = "auto", **kw) -> np.ndarray:
        """Image-conditioned generation: prefill from the spliced embeds,
        decode on token ids (the reference delegates to HF's multimodal
        generate; this is the engine-compatible equivalent)."""
        embeds = self.input_embeds(input_ids, pixel_values, dtype=dtype)
        out = gen.generate(
            self.cfg, self.params["language_model"],
            jnp.asarray(input_ids), max_new_tokens,
            prompt_embeds=embeds, dtype=dtype, method=method, **kw)
        return np.asarray(out)

    def to_device(self, dtype=jnp.bfloat16):
        def cast(x):
            x = np.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(jnp.dtype(dtype))
            return x

        self.params = jax.device_put(jax.tree_util.tree_map(cast, self.params))
        return self


class AwqQwen2VLModel:
    """Qwen2-VL / Qwen2.5-VL: fp vision tower + AWQ-quantized LM
    (reference awq/models/qwen2vl.py, qwen2_5_vl.py — only the language
    model is converted; modules_to_not_convert=["visual"])."""

    def __init__(self, text_cfg: ModelConfig, vision_cfg: Dict,
                 raw_config: Dict, params: Dict[str, Any],
                 qcfg: Optional[AwqConfig] = None):
        self.cfg = text_cfg
        self.vision_cfg = vision_cfg
        self.raw_config = raw_config
        self.params = params
        self.quant_config = qcfg
        self._src_path: Optional[str] = None

    @property
    def _is_25(self) -> bool:
        return self.cfg.model_type == "qwen2_5_vl"

    # ------------------------------------------------------------- loading
    @classmethod
    def _load(cls, path: str):
        import json
        import os

        from autoawq_tpu.io.hf import load_state_dict_from_dir
        from autoawq_tpu.models import qwen_vl

        with open(os.path.join(path, "config.json")) as f:
            raw = json.load(f)
        text_cfg = ModelConfig.from_hf_dict(raw)
        vcfg = dict(raw["vision_config"])
        vcfg.setdefault("in_channels", vcfg.pop("in_chans", 3))
        sd = load_state_dict_from_dir(path)
        conv = (qwen_vl.qwen25vl_params_from_state_dict
                if text_cfg.model_type == "qwen2_5_vl"
                else qwen_vl.qwen2vl_params_from_state_dict)
        params = conv(text_cfg, vcfg, sd)
        qcfg = (AwqConfig.from_dict(raw["quantization_config"])
                if "quantization_config" in raw else None)
        m = cls(text_cfg, vcfg, raw, params, qcfg)
        m._src_path = path
        return m

    @classmethod
    def from_pretrained(cls, path: str) -> "AwqQwen2VLModel":
        return cls._load(serialize.resolve_model_path(path))

    @classmethod
    def from_quantized(cls, path: str, fuse_layers: bool = False,
                       to_device: bool = False,
                       dtype=jnp.bfloat16) -> "AwqQwen2VLModel":
        m = cls._load(serialize.resolve_model_path(path))
        if fuse_layers:
            from autoawq_tpu.nn.fuse import fuse_model

            m.params["language_model"] = fuse_model(
                m.cfg, m.params["language_model"])
        if to_device:
            m.to_device(dtype)
        return m

    # ---------------------------------------------------------- quantizing
    def quantize(self, tokenizer=None, quant_config=None,
                 calib_patches=None, calib_grid_thw=(),
                 calib_second_per_grid_ts=None, **kw) -> None:
        """AWQ-quantize the language model.

        Text-only by default. Passing ``calib_patches`` (the stacked
        [sum(t*h*w), C*tp*p*p] patch matrix) + ``calib_grid_thw`` runs
        IMAGE-CONDITIONED calibration (the reference's multimodal recipe,
        docs/examples.md:267-420): ``calib_data`` must then be pre-
        tokenized samples WITH the image/video placeholder runs in place
        (no concat-resplit — splice alignment is per-sample), and the
        calib forward sees vision features spliced at those positions
        under the true M-RoPE tables instead of text embeddings."""
        from autoawq_tpu.models import qwen_vl as qvl
        from autoawq_tpu.quantize.quantizer import AwqQuantizer

        if calib_patches is None:
            lm = AwqCausalLM(self.cfg, self.params["language_model"])
            lm.quantize(tokenizer, quant_config, **kw)
            self.params["language_model"] = lm.params
            self.quant_config = lm.quant_config
            return

        if isinstance(quant_config, dict) or quant_config is None:
            quant_config = AwqConfig.from_dict(quant_config)
        calib_data = kw.pop("calib_data")
        tokens = np.asarray(calib_data)
        if tokens.ndim != 2:
            raise ValueError(
                "multimodal calibration needs pre-tokenized [n, s] samples "
                "with placeholder runs aligned to calib_patches")
        x, cos, sin = qvl.multimodal_calib_inputs(
            self.cfg, self.vision_cfg, self.params, tokens,
            np.asarray(calib_patches), calib_grid_thw,
            image_token_id=self.raw_config.get("image_token_id", 151655),
            video_token_id=self.raw_config.get("video_token_id"),
            second_per_grid_ts=calib_second_per_grid_ts,
            is_25=self._is_25)
        for k in ("max_calib_samples", "max_calib_seq_len"):
            kw.pop(k, None)
        quantizer = AwqQuantizer(
            self.cfg, quant_config, self.params["language_model"], None,
            calib_inputs=np.asarray(x), calib_rope=(cos, sin), **kw)
        self.params["language_model"] = quantizer.quantize()
        self.quant_config = quant_config

    def save_quantized(self, path: str) -> None:
        import json
        import os

        from autoawq_tpu.models import qwen_vl

        if self.quant_config is None:
            raise RuntimeError("model is not quantized")
        os.makedirs(path, exist_ok=True)
        serialize.copy_aux_files(self._src_path, path)
        raw = dict(self.raw_config)
        raw["quantization_config"] = self.quant_config.to_transformers_dict()
        raw["autoawq_tpu_config"] = (
            self.cfg.to_hf_dict()["autoawq_tpu_config"])
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(raw, f, indent=2)
        sd = qwen_vl.qwen2vl_state_dict_from_params(
            self.cfg, self.vision_cfg, self.params) if not self._is_25 \
            else self._sd_25()
        serialize.write_safetensors(path, sd)

    def _sd_25(self):
        # 2.5 reuses the 2.0 writer for the LM and shared block fields,
        # plus the gated-MLP / RMSNorm vision leaves
        from autoawq_tpu.io.hf import role_out_features, state_dict_from_params

        lm_sd = state_dict_from_params(self.cfg, self.params["language_model"],
                                       role_out_features(self.cfg))
        sd = {}
        for k, v in lm_sd.items():
            if k.startswith("model."):
                sd["model.language_model." + k[len("model."):]] = v
            else:
                sd[k] = v
        vis = self.params["visual"]
        vroot = "model.visual."
        import numpy as np

        def put_lin(name, p):
            sd[vroot + name + ".weight"] = np.ascontiguousarray(
                np.asarray(p["kernel"]).T).astype(np.float16)
            if p.get("bias") is not None:
                sd[vroot + name + ".bias"] = np.asarray(p["bias"]).astype(
                    np.float16)

        pe = np.asarray(vis["patch_embed"]["kernel"]).T
        v = self.vision_cfg
        sd[vroot + "patch_embed.proj.weight"] = np.ascontiguousarray(
            pe.reshape(pe.shape[0], v.get("in_channels", 3),
                       v.get("temporal_patch_size", 2), v["patch_size"],
                       v["patch_size"])).astype(np.float16)
        for i, bp in enumerate(vis["blocks"]):
            for nm in ("norm1", "norm2"):
                sd[f"{vroot}blocks.{i}.{nm}.weight"] = np.asarray(
                    bp[nm]["weight"]).astype(np.float16)
            put_lin(f"blocks.{i}.attn.qkv", bp["qkv"])
            put_lin(f"blocks.{i}.attn.proj", bp["proj"])
            for nm in ("gate_proj", "up_proj", "down_proj"):
                put_lin(f"blocks.{i}.mlp.{nm}", bp[nm])
        sd[vroot + "merger.ln_q.weight"] = np.asarray(
            vis["merger"]["ln_q"]["weight"]).astype(np.float16)
        put_lin("merger.mlp.0", vis["merger"]["mlp0"])
        put_lin("merger.mlp.2", vis["merger"]["mlp2"])
        return sd

    # ----------------------------------------------------------- inference
    def __call__(self, input_ids, pixel_values=None, image_grid_thw=(),
                 method: str = "auto"):
        from autoawq_tpu.models import qwen_vl

        fwd = (qwen_vl.qwen25vl_forward if self._is_25
               else qwen_vl.qwen2vl_forward)
        return fwd(
            self.cfg, self.vision_cfg, self.params, input_ids,
            None if pixel_values is None else jnp.asarray(pixel_values),
            [tuple(int(x) for x in g) for g in image_grid_thw],
            image_token_id=self.raw_config.get("image_token_id", 151655),
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
QWEN_VL_TYPES = ("qwen2_vl", "qwen2_5_vl")


class AutoAWQForCausalLM:
    """Name-compatible dispatcher (reference awq/models/auto.py:60):
    routes on config.json's model_type, including multimodal wrappers."""

    @staticmethod
    def _route(path: str):
        """Resolve (HF hub id or local dir) and pick the wrapper class."""
        import json
        import os

        path = serialize.resolve_model_path(path)
        with open(os.path.join(path, "config.json")) as f:
            mt = json.load(f).get("model_type", "llama")
        if mt in MULTIMODAL_TYPES:
            return AwqLlavaModel, path
        if mt in QWEN_VL_TYPES:
            return AwqQwen2VLModel, path
        return AwqCausalLM, path

    @classmethod
    def from_pretrained(cls, path: str):
        target, path = cls._route(path)
        return target.from_pretrained(path)

    @classmethod
    def from_quantized(cls, path: str, **kw):
        target, path = cls._route(path)
        return target.from_quantized(path, **kw)
