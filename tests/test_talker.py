"""Omni talker JAX forward (models/talker.py) vs the HF oracle: prefill
logits parity and greedy codec-token generation equality on a tiny random
Qwen2_5OmniTalker config."""

import numpy as np
import pytest
import torch

TCFG = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8, embedding_size=48,
            max_position_embeddings=128,
            # mrope with identical t/h/w position streams == standard
            # rotary, whatever the section split (text-only talker runs)
            rope_scaling={"mrope_section": [1, 1, 2],
                          "rope_type": "default"})


def _hf_talker():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniTalkerConfig)
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniTalkerForConditionalGeneration)

    torch.manual_seed(0)
    hf = Qwen2_5OmniTalkerForConditionalGeneration(
        Qwen2_5OmniTalkerConfig(**TCFG)).eval()
    return hf


def _ours(hf):
    from autoawq_tpu.models.talker import OmniTalker

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    return OmniTalker(TCFG, sd)


def _pos3(lo, hi):
    p = torch.arange(lo, hi).view(1, -1)
    return p.unsqueeze(0).expand(3, -1, -1)


def test_talker_prefill_logits_parity(rng):
    hf = _hf_talker()
    ours = _ours(hf)
    s = 7
    embeds = rng.standard_normal((1, s, TCFG["embedding_size"]))\
        .astype(np.float32) * 0.3
    with torch.no_grad():
        ref = hf(inputs_embeds=torch.tensor(embeds),
                 position_ids=_pos3(0, s), use_cache=False).logits.numpy()

    import jax.numpy as jnp

    from autoawq_tpu.nn import modules
    from autoawq_tpu.serve import generate as gen

    caches = gen.init_kv_cache(ours.cfg, 1, s + 2, jnp.float32)
    lm_in = ours.project(jnp.asarray(embeds)).astype(jnp.float32)
    logits, _ = gen.prefill(ours.cfg, ours.params,
                            jnp.zeros((1, s), jnp.int32), caches,
                            "jnp", jnp.float32, embeds=lm_in)
    # prefill returns last-position logits; compare against HF's last row
    np.testing.assert_allclose(np.asarray(logits), ref[:, -1],
                               rtol=2e-4, atol=2e-4)


def test_talker_greedy_codec_generation_matches_hf(rng):
    """Step the HF talker manually (prefill + per-token decode with
    thinker_reply_part consumption) and require OUR generate_codec to
    emit the identical greedy codec-token stream."""
    hf = _hf_talker()
    ours = _ours(hf)
    s, r, n = 5, 3, 8
    embeds = rng.standard_normal((1, s, TCFG["embedding_size"]))\
        .astype(np.float32) * 0.3
    reply = rng.standard_normal((1, r, TCFG["embedding_size"]))\
        .astype(np.float32) * 0.3

    with torch.no_grad():
        out = hf(inputs_embeds=torch.tensor(embeds),
                 position_ids=_pos3(0, s), use_cache=True)
        past = out.past_key_values
        tok = int(out.logits[0, -1].argmax())
        want = [tok]
        rp = torch.tensor(reply)
        for i in range(n - 1):
            emb = hf.get_input_embeddings()(
                torch.tensor([[tok]])) + rp[:, :1]
            if rp.shape[1] > 1:
                rp = rp[:, 1:]
            step = hf(inputs_embeds=emb, position_ids=_pos3(s + i, s + i + 1),
                      use_cache=True, past_key_values=past)
            past = step.past_key_values
            tok = int(step.logits[0, -1].argmax())
            want.append(tok)

    got = np.asarray(ours.generate_codec(
        embeds, reply, max_new_tokens=n))
    np.testing.assert_array_equal(got[0], np.asarray(want))


def test_talker_from_extra_prefixed_keys(rng):
    """OmniTalker consumes the ``talker.``-prefixed tensor names exactly
    as an omni checkpoint's params["_extra"] stores them."""
    hf = _hf_talker()
    extra = {"talker." + k: v.numpy() for k, v in hf.state_dict().items()}
    extra["token2wav.unrelated"] = np.zeros(3, np.float32)

    from autoawq_tpu.models.talker import OmniTalker

    ours = OmniTalker(TCFG, extra)
    embeds = rng.standard_normal((1, 4, TCFG["embedding_size"]))\
        .astype(np.float32) * 0.3
    reply = rng.standard_normal((1, 2, TCFG["embedding_size"]))\
        .astype(np.float32) * 0.3
    out = np.asarray(ours.generate_codec(embeds, reply, max_new_tokens=5))
    assert out.shape == (1, 5)
    assert (0 <= out).all() and (out < TCFG["vocab_size"]).all()
