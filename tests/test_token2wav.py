"""Omni token2wav (models/token2wav.py) vs the HF oracle on tiny random
configs: ECAPA speaker encoder, DiT forward (CFG on/off), the full RK4
mel sampling loop, and the BigVGAN vocoder."""

import numpy as np
import pytest
import torch

DIT_KW = dict(
    hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
    head_dim=32, emb_dim=16, enc_dim=12, enc_emb_dim=8, mel_dim=10,
    num_embeds=32, enc_channels=[16, 16, 16, 16, 48],
    enc_kernel_sizes=[5, 3, 3, 3, 1], enc_dilations=[1, 2, 3, 4, 1],
    enc_res2net_scale=2, enc_se_channels=8, enc_attention_channels=8,
    block_size=4, look_ahead_layers=[1], look_backward_layers=[0],
    repeats=2, ff_mult=2, rope_theta=10000.0, dropout=0.0)
BV_KW = dict(mel_dim=10, upsample_initial_channel=32,
             resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
             upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4])


def _hf_dit():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniDiTConfig)
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniToken2WavDiTModel)

    torch.manual_seed(0)
    m = Qwen2_5OmniToken2WavDiTModel(
        Qwen2_5OmniDiTConfig(**DIT_KW)).eval()
    return m, {k: v.numpy() for k, v in m.state_dict().items()}


def _inputs(rng, s_code=6):
    s = s_code * DIT_KW["repeats"]
    x = rng.standard_normal((1, s, DIT_KW["mel_dim"])).astype(np.float32)
    ref = rng.standard_normal((1, 20, DIT_KW["mel_dim"])).astype(np.float32)
    spk = rng.standard_normal((1, s, DIT_KW["enc_emb_dim"]))\
        .astype(np.float32)
    code = rng.integers(1, DIT_KW["num_embeds"], (1, s_code))
    return x, ref, spk, code


@pytest.mark.parametrize("apply_cfg", [False, True])
def test_dit_forward_parity(rng, apply_cfg):
    from autoawq_tpu.models.token2wav import dit_forward

    hf, sd = _hf_dit()
    x, ref, spk, code = _inputs(rng)
    t = 0.37
    with torch.no_grad():
        want = hf(hidden_states=torch.tensor(x),
                  condition_vector=torch.tensor(ref),
                  speaker_embedding=torch.tensor(spk),
                  quantized_code=torch.tensor(code),
                  time_step=torch.tensor(t),
                  apply_cfg=apply_cfg).numpy()
    got = np.asarray(dit_forward(sd, DIT_KW, x, ref, spk, code, t,
                                 apply_cfg=apply_cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_dit_sample_parity(rng):
    """Full RK4 + sway + CFG sampling vs HF's own ODE solver driven with
    the SAME fixed initial noise."""
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        RungeKutta4ODESolver)

    from autoawq_tpu.models.token2wav import dit_sample

    hf, sd = _hf_dit()
    _, ref, _, code = _inputs(rng)
    s = code.shape[1] * DIT_KW["repeats"]
    cond = rng.standard_normal((1, DIT_KW["enc_emb_dim"]))\
        .astype(np.float32)
    noise = rng.standard_normal((1, s, DIT_KW["mel_dim"]))\
        .astype(np.float32)
    gscale, sway, steps = 0.5, -1.0, 4

    cond_rep = torch.tensor(cond).unsqueeze(1).repeat(1, s, 1)

    def ode(t, y):
        with torch.no_grad():
            out = hf(hidden_states=y, quantized_code=torch.tensor(code),
                     speaker_embedding=cond_rep,
                     condition_vector=torch.tensor(ref),
                     time_step=t, apply_cfg=True)
        g, n = torch.chunk(out, 2, dim=0)
        return g + (g - n) * gscale

    tgrid = torch.linspace(0, 1, steps)
    tgrid = tgrid + sway * (torch.cos(torch.pi / 2 * tgrid) - 1 + tgrid)
    traj = RungeKutta4ODESolver(ode, torch.tensor(noise)).integrate(tgrid)
    want = traj[-1].permute(0, 2, 1).numpy()

    got = np.asarray(dit_sample(sd, DIT_KW, cond, ref, code, noise,
                                num_steps=steps, guidance_scale=gscale,
                                sway_coefficient=sway))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_bigvgan_parity(rng):
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniBigVGANConfig)
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniToken2WavBigVGANModel)

    from autoawq_tpu.models.token2wav import bigvgan_forward

    torch.manual_seed(1)
    hf = Qwen2_5OmniToken2WavBigVGANModel(
        Qwen2_5OmniBigVGANConfig(**BV_KW)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    mel = rng.standard_normal((1, BV_KW["mel_dim"], 24)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(mel)).numpy()
    got = np.asarray(bigvgan_forward(sd, BV_KW, mel))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
