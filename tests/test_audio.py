"""Qwen2.5-Omni audio tower (models/audio.py) vs the HF oracle."""

import numpy as np
import pytest
import torch


def test_audio_encoder_parity(rng):
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoderConfig)
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoder)

    from autoawq_tpu.models.audio import audio_encoder

    acfg = dict(d_model=32, encoder_layers=2, encoder_attention_heads=2,
                encoder_ffn_dim=64, num_mel_bins=16, max_source_positions=200,
                output_dim=48, n_window=8)
    torch.manual_seed(0)
    hf = Qwen2_5OmniAudioEncoder(Qwen2_5OmniAudioEncoderConfig(**acfg)).eval()

    t = 60  # 3 full 16-frame chunks + a 12-frame tail
    mel = rng.standard_normal((acfg["num_mel_bins"], t)).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            input_features=torch.tensor(mel),
            feature_lens=torch.tensor([t]),
            aftercnn_lens=torch.tensor([sum((l - 1) // 2 + 1
                                            for l in (16, 16, 16, 12))]),
        ).last_hidden_state.numpy()

    w = {k: v.numpy() for k, v in hf.state_dict().items()}
    got = np.asarray(audio_encoder(acfg, w, mel, t), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_audio_weights_roundtrip(rng):
    """extra_audio_weights pulls the tower out of a thinker param tree."""
    from autoawq_tpu.models.audio import extra_audio_weights

    params = {"_extra": {"audio_tower.conv1.weight": np.ones((4, 2, 3)),
                         "visual.x": np.ones(2)}}
    w = extra_audio_weights(params)
    assert set(w) == {"conv1.weight"}
