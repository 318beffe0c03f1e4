"""LLaVA multimodal parity vs transformers + quantize-LM-only flow."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.models.vision import llava_forward, llava_params_from_state_dict


def _tiny_llava():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          image_size=16, patch_size=8, projection_dim=16)
    tc = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=2,
                     num_key_value_heads=2, max_position_embeddings=64)
    cfg = LlavaConfig(vision_config=vc, text_config=tc, image_token_index=5,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    torch.manual_seed(0)
    return LlavaForConditionalGeneration(cfg).eval(), cfg


def test_llava_parity(rng):
    hf, cfg = _tiny_llava()
    n_patch = (16 // 8) ** 2  # 4 image tokens per image
    ids = rng.integers(6, 64, (1, 12))
    ids[0, 2 : 2 + n_patch] = 5  # image placeholder tokens
    ids_t = torch.asarray(ids)
    pixels = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        ref = hf(input_ids=ids_t, pixel_values=pixels).logits.float().numpy()

    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    text_cfg = ModelConfig.from_hf_dict(cfg.text_config.to_dict())
    params = llava_params_from_state_dict(text_cfg, sd)
    ours = np.asarray(llava_forward(
        text_cfg, cfg.vision_config.to_dict(), params,
        jnp.asarray(ids), jnp.asarray(pixels.numpy()),
        image_token_index=5, method="jnp",
    ))
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(ours / scale, ref / scale, atol=3e-3, rtol=3e-3)


def test_llava_quantize_lm_only(rng):
    """Quantize the language model only (reference awq/models/llava.py:26-27);
    vision tower stays fp and the multimodal forward still works."""
    from autoawq_tpu.api import AwqCausalLM

    hf, cfg = _tiny_llava()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    text_cfg = ModelConfig.from_hf_dict(cfg.text_config.to_dict())
    params = llava_params_from_state_dict(text_cfg, sd)

    lm = AwqCausalLM(text_cfg, params["language_model"])
    calib = rng.integers(0, 64, (4, 32))
    lm.quantize(quant_config={"q_group_size": 32}, calib_data=calib,
                progress=False)
    params["language_model"] = lm.params

    ids = rng.integers(6, 64, (1, 12))
    ids[0, 2:6] = 5
    pixels = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    logits = np.asarray(llava_forward(
        text_cfg, cfg.vision_config.to_dict(), params,
        jnp.asarray(ids), jnp.asarray(pixels),
        image_token_index=5, method="jnp",
    ))
    assert np.isfinite(logits).all()
    # vision tower untouched (fp kernels, no qweight anywhere)
    flat = str(params["vision_tower"].keys())
    assert "qweight" not in flat


def test_llava_save_load_roundtrip(rng, tmp_path):
    """quantize -> save (HF llava layout) -> from_quantized -> same logits."""
    from autoawq_tpu.api import AutoAWQForCausalLM, AwqLlavaModel

    hf, cfg = _tiny_llava()
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    text_cfg = ModelConfig.from_hf_dict(cfg.text_config.to_dict())
    params = llava_params_from_state_dict(text_cfg, sd)
    model = AwqLlavaModel(text_cfg, cfg.vision_config.to_dict(),
                          cfg.to_dict(), params)
    calib = rng.integers(0, 64, (4, 32))
    model.quantize(quant_config={"q_group_size": 32}, calib_data=calib,
                   progress=False)
    out_dir = str(tmp_path / "llava-awq")
    model.save_quantized(out_dir)

    m2 = AutoAWQForCausalLM.from_quantized(out_dir)
    assert isinstance(m2, AwqLlavaModel)
    ids = rng.integers(6, 64, (1, 12))
    ids[0, 2:6] = 5
    pixels = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    a = np.asarray(model(ids, pixels, method="jnp"))
    b = np.asarray(m2(ids, pixels, method="jnp"))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


def test_llava_next_multimodal_parity(rng):
    """LLaVA-Next anyres multi-crop merge vs HF
    (reference: awq/models/llava_next.py:89-160)."""
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaNextConfig,
                              LlavaNextForConditionalGeneration)

    from autoawq_tpu.models.vision import (llava_next_forward,
                                           llava_params_from_state_dict)

    vision = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=16, patch_size=4)
    text = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=256)
    cfg_hf = LlavaNextConfig(
        vision_config=vision, text_config=text, image_token_index=127,
        image_grid_pinpoints=[[16, 16], [16, 32], [32, 16], [32, 32]],
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    model = LlavaNextForConditionalGeneration(cfg_hf).eval()

    # one image, orig size 24x20 -> best grid 32x32 -> 2x2 crops + base = 5
    image_size = (24, 20)
    n_crops = 5
    pixels = rng.standard_normal((1, n_crops, 3, 16, 16)).astype(np.float32)
    # token count: base 16 + unpadded grid rows x (cols+newline)
    with torch.no_grad():
        feats, lens = model.model.image_sizes_to_num_patches(
            torch.tensor([image_size])) if hasattr(
            model.model, "image_sizes_to_num_patches") else (None, None)
    # run HF once to learn the placeholder count from its error or compute:
    from transformers.models.llava_next.modeling_llava_next import (
        get_anyres_image_grid_shape, unpad_image)

    nph, npw = get_anyres_image_grid_shape(
        image_size, cfg_hf.image_grid_pinpoints, 16)
    side = 4  # 16/4
    probe = torch.zeros(32, nph * side, npw * side)
    un = unpad_image(probe, image_size)
    n_img_tok = 16 + un.shape[1] * (un.shape[2] + 1)

    ids = rng.integers(0, 126, (1, n_img_tok + 8))
    ids[0, 2:2 + n_img_tok] = 127
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
            image_sizes=torch.tensor([image_size]),
        ).logits.float().numpy()

    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    text_cfg = ModelConfig.from_hf_dict(text.to_dict())
    params = llava_params_from_state_dict(text_cfg, sd)
    vcfg = dict(hidden_size=32, num_attention_heads=2, image_size=16,
                patch_size=4, hidden_act="quick_gelu",
                image_grid_pinpoints=cfg_hf.image_grid_pinpoints)
    got = np.asarray(llava_next_forward(
        text_cfg, vcfg, params, jnp.asarray(ids),
        jnp.asarray(pixels[0]), [image_size],
        image_token_index=127, method="jnp"))
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=5e-3, rtol=5e-3)


def test_llava_serves_from_engine_with_embeds(rng):
    """Multimodal SERVING: the slot engine prefills from the spliced
    input embeds (prompt_embeds) and decodes on token ids — the stream
    matches image-conditioned HF greedy generation, and an engine run
    WITHOUT the image diverges (the image matters)."""
    from autoawq_tpu.models.vision import llava_input_embeds
    from autoawq_tpu.serve.batching import BatchingEngine

    hf, cfg = _tiny_llava()
    n_patch = (16 // 8) ** 2
    ids = rng.integers(6, 64, (1, 10))
    ids[0, 1 : 1 + n_patch] = 5
    pixels = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.asarray(ids),
                          pixel_values=pixels, max_new_tokens=6,
                          do_sample=False, pad_token_id=0)
    want = list(ref[0].numpy()[ids.shape[1]:])

    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    text_cfg = ModelConfig.from_hf_dict(cfg.text_config.to_dict())
    params = llava_params_from_state_dict(text_cfg, sd)
    embeds = llava_input_embeds(
        text_cfg, cfg.vision_config.to_dict(), params,
        jnp.asarray(ids), jnp.asarray(pixels.numpy()),
        image_token_index=5)

    eng = BatchingEngine(text_cfg, params["language_model"], max_batch=2,
                         max_seq_len=32, method="jnp", dtype=jnp.float32)
    eng.add_request("img", ids[0], 6, prompt_embeds=embeds)
    eng.add_request("noimg", ids[0], 6)  # text-only: placeholder ids
    got = eng.run()
    assert got["img"] == want
    assert got["noimg"] != want  # the image conditioned the stream
