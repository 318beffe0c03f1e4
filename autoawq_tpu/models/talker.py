"""Qwen2.5-Omni talker: JAX forward + codec-token generation.

The omni pipeline is thinker (quantized LM) -> talker (small qwen2-style
LM emitting audio-codec tokens) -> token2wav (codec -> waveform). The
reference keeps talker/token2wav as live fp HF modules and never
quantizes them (awq/models/qwen2_5_omni.py:11-36); this framework stores
their tensors in ``params["_extra"]`` (io/serialize.py round-trips them)
and this module gives the TALKER a native JAX forward so audio-codec
tokens can be generated without torch.

Semantics mirror ``Qwen2_5OmniTalkerForConditionalGeneration.forward``
(transformers modeling_qwen2_5_omni.py):

* the LM input is ``thinker_to_talker_proj(inputs_embeds)`` where
  ``inputs_embeds`` live in the THINKER's width (``embedding_size``);
* prefill embeds come from the thinker's hidden states (codec bos/pad
  rows added by the caller, as HF's generate glue does);
* each decode step embeds the previous codec token with the talker's own
  ``embed_tokens`` (also thinker-width) and adds one row of
  ``thinker_reply_part``, consuming it front-to-back; once exhausted the
  LAST row repeats (HF keeps ``thinker_reply_part[:, :1]`` when only one
  row is left);
* logits come from ``codec_head`` over the codec vocabulary.

The decoder layers are standard qwen2 blocks (qkv bias, full rotary,
RMSNorm) — the shared ``nn.modules`` block stack runs them; generation
rides serve/generate.prefill/decode_step via their ``embeds`` path, so
the KV cache, int8 cache and kernel selection all apply unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen


def talker_config(tcfg: Dict[str, Any]) -> ModelConfig:
    """ModelConfig for the talker LM from the raw ``talker_config`` dict
    (config.json of a full omni checkpoint)."""
    return ModelConfig(
        model_type="qwen2",
        vocab_size=tcfg["vocab_size"],
        hidden_size=tcfg["hidden_size"],
        intermediate_size=tcfg["intermediate_size"],
        num_hidden_layers=tcfg["num_hidden_layers"],
        num_attention_heads=tcfg["num_attention_heads"],
        num_key_value_heads=tcfg.get("num_key_value_heads",
                                     tcfg["num_attention_heads"]),
        head_dim=tcfg.get("head_dim"),
        max_position_embeddings=tcfg.get("max_position_embeddings", 32768),
        rms_norm_eps=tcfg.get("rms_norm_eps", 1e-6),
        rope_theta=tcfg.get("rope_theta", 1e6),
        hidden_act=tcfg.get("hidden_act", "silu"),
        attention_bias=True,  # qwen2 qkv bias
        tie_word_embeddings=False,
    )


class OmniTalker:
    """Functional wrapper over the ``talker.*`` tensors of an omni
    checkpoint's ``params["_extra"]`` (or any flat numpy state dict with
    HF talker key names)."""

    def __init__(self, tcfg: Dict[str, Any], extra: Dict[str, np.ndarray]):
        from autoawq_tpu.io import hf as hf_io

        self.cfg = talker_config(tcfg)
        self.embedding_size = tcfg["embedding_size"]
        sub = {k[len("talker."):]: np.asarray(v) for k, v in extra.items()
               if k.startswith("talker.")}
        if not sub:  # already-stripped names (tests drive HF state dicts)
            sub = {k: np.asarray(v) for k, v in extra.items()}
        sub = {k: v.astype(np.float32) if v.dtype == np.float16 else v
               for k, v in sub.items()}
        # thinker-width pieces stay OUTSIDE the LM param tree: the LM
        # operates at talker hidden width on projected embeds
        self.embed_tokens = jnp.asarray(
            sub.pop("model.embed_tokens.weight"))  # [V, embedding_size]
        self.proj_w = jnp.asarray(
            sub.pop("thinker_to_talker_proj.weight"))  # [hid, emb]
        self.proj_b = jnp.asarray(
            sub.pop("thinker_to_talker_proj.bias"))
        sub["lm_head.weight"] = sub.pop("codec_head.weight")
        # placeholder lookup table at LM width so the layer map is happy;
        # never used (all forwards go through the embeds path)
        sub["model.embed_tokens.weight"] = np.zeros(
            (self.cfg.vocab_size, self.cfg.hidden_size), np.float32)
        self.params = hf_io.params_from_state_dict(self.cfg, sub)

    def project(self, embeds: jax.Array) -> jax.Array:
        """thinker_to_talker_proj: [..., emb] -> [..., hidden]."""
        return (jnp.asarray(embeds, jnp.float32) @ self.proj_w.T
                + self.proj_b)

    def generate_codec(
        self,
        inputs_embeds: jax.Array,  # [B, S, embedding_size] thinker-width
        thinker_reply: jax.Array,  # [B, R, embedding_size]
        max_new_tokens: int = 64,
        eos_token_id: Optional[int] = None,
        method: str = "jnp",
        dtype=jnp.float32,
    ) -> jax.Array:
        """Greedy codec-token generation -> [B, n <= max_new_tokens].
        Matches stepping the HF talker forward token-by-token (greedy)."""
        b, s, _ = inputs_embeds.shape
        caches = gen.init_kv_cache(self.cfg, b, s + max_new_tokens + 1,
                                   dtype)
        lm_in = self.project(inputs_embeds).astype(dtype)
        logits, caches = gen.prefill(
            self.cfg, self.params,
            jnp.zeros((b, s), jnp.int32), caches, method, dtype,
            embeds=lm_in)
        reply = jnp.asarray(thinker_reply, jnp.float32)
        out = []
        tok = jnp.argmax(logits, -1)  # [B]
        pos = s
        for i in range(max_new_tokens):
            out.append(np.asarray(tok))
            if eos_token_id is not None and b == 1 \
                    and int(tok[0]) == eos_token_id:
                break
            # HF: codec_embeds + thinker_reply_part[:, :1]; pop the row
            # only while more than one remains (the last row repeats)
            ridx = min(i, reply.shape[1] - 1)
            e = (self.embed_tokens[tok] + reply[:, ridx])[:, None, :]
            step_in = self.project(e).astype(dtype)
            logits, caches = gen.decode_step(
                self.cfg, self.params, tok[:, None], caches,
                jnp.int32(pos), method, dtype, embeds=step_in)
            tok = jnp.argmax(logits, -1)
            pos += 1
        return jnp.asarray(np.stack(out, axis=1))
