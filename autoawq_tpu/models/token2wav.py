"""Qwen2.5-Omni token2wav: JAX DiT mel generator + BigVGAN vocoder.

Completes the omni audio pipeline (thinker -> talker -> token2wav): the
talker's codec tokens become a mel spectrogram via a flow-matching DiT
sampled with an RK4 ODE solver under classifier-free guidance, and the
mel becomes a waveform via a BigVGAN vocoder with anti-aliased SnakeBeta
activations. The reference keeps these as live fp torch modules and
never quantizes them (awq/models/qwen2_5_omni.py:11-36); here they run
natively in JAX from the ``token2wav.*`` tensors that ride
``params["_extra"]`` through save/load (io/serialize.py).

Numerics mirror transformers' ``Qwen2_5OmniToken2WavDiTModel`` /
``Qwen2_5OmniToken2WavBigVGANModel`` exactly (tests/test_token2wav.py
checks both against the HF modules on tiny random configs):

* DiT: sinusoidal timestep MLP; codec embedding repeat-interleaved
  ``repeats`` times; ECAPA-TDNN speaker encoder over the reference mel;
  AdaLayerNormZero-modulated attention blocks whose mask allows
  [-look_backward, +look_ahead] blocks of ``block_size`` frames; rotary
  embedding applied to the FIRST head only (a quirk of the released
  checkpoint, kept for parity); final AdaLN + linear to mel bins.
* Sampling: sway-warped uniform time grid, fixed-step RK4, CFG by
  batch-doubling (conditional row + zeroed-conditioning row).
* BigVGAN: exp -> dB -> normalized mel, conv stack with transposed-conv
  upsampling, AMP residual blocks, and the anti-aliased activation
  (kaiser-sinc 2x upsample -> SnakeBeta -> 2x downsample).

Everything is fp32 and functional; convolutions lower to
``lax.conv_general_dilated`` (MXU-friendly NCH layout).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------- primitives


def _lin(p: Dict[str, Any], name: str, x: jax.Array) -> jax.Array:
    y = x @ jnp.asarray(p[name + ".weight"]).T
    b = p.get(name + ".bias")
    return y if b is None else y + jnp.asarray(b)


def _conv1d(x, w, b=None, stride=1, dilation=1, pad=(0, 0), groups=1):
    """x [B, C, L], w [O, I/groups, K] (torch layout)."""
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(stride,), padding=[tuple(pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups)
    if b is not None:
        out = out + jnp.asarray(b)[None, :, None]
    return out


def _conv1d_same_reflect(x, w, b=None, dilation=1):
    """torch Conv1d(padding="same", padding_mode="reflect")."""
    k = np.shape(w)[-1]
    total = dilation * (k - 1)
    lo, hi = total // 2, total - total // 2
    if total:
        x = jnp.pad(x, ((0, 0), (0, 0), (lo, hi)), mode="reflect")
    return _conv1d(x, w, b, dilation=dilation)


def _conv_transpose1d(x, w, b=None, stride=1, padding=0, groups=1):
    """torch ConvTranspose1d: w [I, O/groups, K]; out length
    (L-1)*stride - 2*padding + K. Realized as the equivalent
    input-dilated correlation with the flipped, in/out-swapped kernel."""
    w = jnp.asarray(w)
    k = w.shape[-1]
    i, og = w.shape[0], w.shape[1]
    # [I, O/g, K] -> groups of [I/g, O/g, K] -> [O, I/g, K] flipped
    wt = w.reshape(groups, i // groups, og, k).transpose(0, 2, 1, 3)
    wt = jnp.flip(wt.reshape(groups * og, i // groups, k), -1)
    out = jax.lax.conv_general_dilated(
        x, wt, window_strides=(1,), padding=[(k - 1 - padding,) * 2],
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups)
    if b is not None:
        out = out + jnp.asarray(b)[None, :, None]
    return out


def _layer_norm(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (x32 - mu) / jnp.sqrt(var + eps)


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """HF kaiser_sinc_filter1d, numpy (filters are static buffers)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    win = np.kaiser(kernel_size, beta)
    t = (np.arange(-half_size, half_size) + 0.5) if even \
        else np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros((1, 1, kernel_size), np.float32)
    f = 2 * cutoff * win * np.sinc(2 * cutoff * t)
    f = f / f.sum()
    return f.reshape(1, 1, kernel_size).astype(np.float32)


def _up_sample1d(x, ratio=2, kernel_size=12):
    """Anti-aliased 2x upsample (UpSample1d): replicate pad, depthwise
    transposed sinc filter, crop."""
    c = x.shape[1]
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    # depthwise transpose conv: weight layout [I=C, O/g=1, K]
    out = ratio * _conv_transpose1d(
        x, jnp.broadcast_to(jnp.asarray(filt), (c, 1, kernel_size)),
        None, stride=ratio, padding=0, groups=c)
    return out[..., pad_left:-pad_right]


def _down_sample1d(x, ratio=2, kernel_size=12):
    c = x.shape[1]
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)), mode="edge")
    return _conv1d(x, jnp.broadcast_to(jnp.asarray(filt),
                                       (c, 1, kernel_size)),
                   stride=ratio, groups=c)


def _snake_beta(x, alpha, beta, eps=1e-9):
    a = jnp.exp(jnp.asarray(alpha))[None, :, None]
    b = jnp.exp(jnp.asarray(beta))[None, :, None]
    return x + (1.0 / (b + eps)) * jnp.sin(x * a) ** 2


def _activation1d(p, prefix, x):
    """TorchActivation1d: upsample -> SnakeBeta -> downsample."""
    x = _up_sample1d(x)
    x = _snake_beta(x, p[prefix + ".act.alpha"], p[prefix + ".act.beta"])
    return _down_sample1d(x)


# ------------------------------------------------------------ ECAPA-TDNN


def _tdnn(p, prefix, x, dilation=1):
    return jax.nn.relu(_conv1d_same_reflect(
        x, p[prefix + ".conv.weight"], p[prefix + ".conv.bias"],
        dilation=dilation))


def _res2net(p, prefix, x, scale, dilation):
    parts = jnp.split(x, scale, axis=1)
    outs = [parts[0]]
    prev = None
    for i in range(1, scale):
        inp = parts[i] if i == 1 else parts[i] + prev
        prev = _tdnn(p, f"{prefix}.blocks.{i - 1}", inp, dilation)
        outs.append(prev)
    return jnp.concatenate(outs, axis=1)


def _se_block(p, prefix, x):
    m = x.mean(axis=2, keepdims=True)
    m = jax.nn.relu(_conv1d(m, p[prefix + ".conv1.weight"],
                            p[prefix + ".conv1.bias"]))
    m = jax.nn.sigmoid(_conv1d(m, p[prefix + ".conv2.weight"],
                               p[prefix + ".conv2.bias"]))
    return x * m


def _asp(p, prefix, x, eps=1e-12):
    """AttentiveStatisticsPooling -> [B, 2C, 1]."""
    t = x.shape[-1]
    mean = x.mean(axis=2)
    std = jnp.sqrt(jnp.clip(((x - mean[..., None]) ** 2).mean(axis=2), eps))
    glob = jnp.concatenate(
        [x, jnp.repeat(mean[..., None], t, -1),
         jnp.repeat(std[..., None], t, -1)], axis=1)
    att = _conv1d(jnp.tanh(_tdnn(p, prefix + ".tdnn", glob)),
                  p[prefix + ".conv.weight"], p[prefix + ".conv.bias"])
    att = jax.nn.softmax(att, axis=2)
    mean = (att * x).sum(axis=2)
    std = jnp.sqrt(jnp.clip((att * (x - mean[..., None]) ** 2).sum(axis=2),
                            eps))
    return jnp.concatenate([mean, std], axis=1)[..., None]


def ecapa_tdnn(p, cfg: Dict[str, Any], mel: jax.Array) -> jax.Array:
    """ECAPA speaker encoder: mel [B, T, mel_dim] -> [B, enc_dim]."""
    pre = "input_embed.spk_encoder"
    x = mel.swapaxes(1, 2)  # [B, mel_dim, T]
    chans = cfg["enc_channels"]
    dils = cfg["enc_dilations"]
    feats = []
    x = _tdnn(p, f"{pre}.blocks.0", x, dils[0])
    feats.append(x)
    for i in range(1, len(chans) - 1):
        b = f"{pre}.blocks.{i}"
        r = _tdnn(p, b + ".tdnn1", x)
        r = _res2net(p, b + ".res2net_block", r,
                     cfg["enc_res2net_scale"], dils[i])
        r = _tdnn(p, b + ".tdnn2", r)
        r = _se_block(p, b + ".se_block", r)
        x = x + r
        feats.append(x)
    x = jnp.concatenate(feats[1:], axis=1)
    x = _tdnn(p, pre + ".mfa", x, dils[-1])
    x = _asp(p, pre + ".asp", x)
    x = _conv1d(x, p[pre + ".fc.weight"], p[pre + ".fc.bias"])
    return x[:, :, 0]


# ------------------------------------------------------------------- DiT


def _timestep_embed(p, t: jax.Array, dim=256) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
    arg = 1000.0 * t[:, None] * freqs[None]
    e = jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)
    e = _lin(p, "time_embed.time_mlp.0", e)
    return _lin(p, "time_embed.time_mlp.2", jax.nn.silu(e))


def _rot_interleaved(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def _dit_rope_tables(seq_len: int, head_dim: int, base=10000.0):
    inv = 1.0 / (base ** (np.arange(0, head_dim, 2) / head_dim))
    f = np.arange(seq_len)[:, None] * inv[None]
    f = np.stack([f, f], axis=-1).reshape(seq_len, -1)  # interleaved
    return jnp.asarray(np.cos(f), jnp.float32), \
        jnp.asarray(np.sin(f), jnp.float32)


def _dit_attention(p, prefix, x, cos, sin, keep, nh: int):
    b, s, _ = x.shape
    q = _lin(p, prefix + ".to_q", x).reshape(b, s, nh, -1).swapaxes(1, 2)
    k = _lin(p, prefix + ".to_k", x).reshape(b, s, nh, -1).swapaxes(1, 2)
    v = _lin(p, prefix + ".to_v", x).reshape(b, s, nh, -1).swapaxes(1, 2)
    # parity quirk: the released checkpoint applies rotary to head 0 only
    q0 = q[:, :1] * cos + _rot_interleaved(q[:, :1]) * sin
    k0 = k[:, :1] * cos + _rot_interleaved(k[:, :1]) * sin
    q = jnp.concatenate([q0, q[:, 1:]], axis=1)
    k = jnp.concatenate([k0, k[:, 1:]], axis=1)
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k) / math.sqrt(q.shape[-1])
    scores = jnp.where(keep, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", probs, v)
    out = out.swapaxes(1, 2).reshape(b, s, -1)
    return _lin(p, prefix + ".to_out.0", out)


def dit_forward(p, cfg: Dict[str, Any], x, ref_mel, spk, code, t,
                apply_cfg: bool = True) -> jax.Array:
    """Mirror of Qwen2_5OmniToken2WavDiTModel.forward.

    x [B, S, mel], ref_mel [B, Tref, mel], spk [B, S, enc_emb_dim]
    (already repeated over S like HF's sample), code [B, S/repeats]
    int32, t scalar or [B]."""
    b = x.shape[0]
    tvec = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (b,))
    temb = _timestep_embed(p, tvec)

    emb_tab = jnp.asarray(p["text_embed.codec_embed.weight"])
    code_e = jnp.repeat(emb_tab[code], cfg["repeats"], axis=1)
    if apply_cfg:
        code_e_un = jnp.repeat(emb_tab[jnp.zeros_like(code)],
                               cfg["repeats"], axis=1)
        x = jnp.concatenate([x, x], axis=0)
        spk = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
        ref_mel = jnp.concatenate([ref_mel, jnp.zeros_like(ref_mel)], 0)
        code_e = jnp.concatenate([code_e, code_e_un], axis=0)
        temb = jnp.concatenate([temb, temb], axis=0)

    cond = ecapa_tdnn(p, cfg, ref_mel)  # [2B?, enc_dim]
    cond = jnp.repeat(cond[:, None, :], x.shape[1], axis=1)
    h = _lin(p, "input_embed.proj",
             jnp.concatenate([x, cond, code_e, spk], axis=-1))

    s = h.shape[1]
    cos, sin = _dit_rope_tables(s, cfg["head_dim"],
                                cfg.get("rope_theta", 10000.0))
    cos, sin = cos[None, None], sin[None, None]
    blocks = np.arange(s) // cfg["block_size"]
    diff = blocks[None, :] - blocks[:, None]  # block_j - block_i

    for i in range(cfg["num_hidden_layers"]):
        look_a = 1 if i in cfg["look_ahead_layers"] else 0
        look_b = 1 if i in cfg["look_backward_layers"] else 0
        keep = jnp.asarray((diff >= -look_b) & (diff <= look_a))[None, None]
        pre = f"transformer_blocks.{i}"
        mod = _lin(p, pre + ".attn_norm.linear", jax.nn.silu(temb))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, -1)
        n = _layer_norm(h) * (1 + sc_msa[:, None]) + sh_msa[:, None]
        h = h + g_msa[:, None] * _dit_attention(p, pre + ".attn", n, cos,
                                                sin, keep,
                                                cfg["num_attention_heads"])
        n = _layer_norm(h) * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        ff = _lin(p, pre + ".ff.ff.0", n)
        ff = _lin(p, pre + ".ff.ff.3",
                  jax.nn.gelu(ff, approximate=True))
        h = h + g_mlp[:, None] * ff

    mod = _lin(p, "norm_out.linear", jax.nn.silu(temb))
    scale, shift = jnp.split(mod, 2, -1)
    h = _layer_norm(h) * (1 + scale)[:, None] + shift[:, None]
    return _lin(p, "proj_out", h)


def dit_sample(p, cfg: Dict[str, Any], conditioning, ref_mel, code,
               noise, num_steps: int = 10, guidance_scale: float = 0.5,
               sway_coefficient: float = -1.0) -> jax.Array:
    """Flow-matching mel sampling (RK4 + sway + CFG) ->
    [B, mel_dim, S]. ``noise`` [B, S, mel] is the caller's (HF draws
    torch.randn internally; passing it keeps runs reproducible)."""
    max_dur = code.shape[1] * cfg["repeats"]
    y = jnp.asarray(noise[:, :max_dur], jnp.float32)
    spk = jnp.repeat(jnp.asarray(conditioning)[:, None, :], max_dur, 1)

    use_cfg = guidance_scale >= 1e-5

    @jax.jit
    def f(t, yt):
        if not use_cfg:
            return dit_forward(p, cfg, yt, ref_mel, spk, code, t,
                               apply_cfg=False)
        out = dit_forward(p, cfg, yt, ref_mel, spk, code, t,
                          apply_cfg=True)
        g, n = jnp.split(out, 2, axis=0)
        return g + (g - n) * guidance_scale

    ts = np.linspace(0.0, 1.0, num_steps)
    if sway_coefficient is not None:
        ts = ts + sway_coefficient * (np.cos(np.pi / 2 * ts) - 1 + ts)
    for t0, t1 in zip(ts[:-1], ts[1:]):
        dt = t1 - t0
        k1 = f(t0, y)
        k2 = f(t0 + dt / 3, y + dt * k1 / 3)
        k3 = f(t0 + dt * 2 / 3, y + dt * (k2 - k1 / 3))
        k4 = f(t1, y + dt * (k1 - k2 + k3))
        y = y + (k1 + 3 * (k2 + k3) + k4) * dt / 8
    return y.swapaxes(1, 2)  # [B, mel, S]


# --------------------------------------------------------------- BigVGAN


def _amp_block(p, prefix, x, kernel_size, dilations):
    for j, d in enumerate(dilations):
        r = x
        x = _activation1d(p, f"{prefix}.activations.{2 * j}", x)
        pad = (kernel_size * d - d) // 2
        x = _conv1d(x, p[f"{prefix}.convs1.{j}.weight"],
                    p[f"{prefix}.convs1.{j}.bias"], dilation=d,
                    pad=(pad, pad))
        x = _activation1d(p, f"{prefix}.activations.{2 * j + 1}", x)
        pad = (kernel_size - 1) // 2
        x = _conv1d(x, p[f"{prefix}.convs2.{j}.weight"],
                    p[f"{prefix}.convs2.{j}.bias"], pad=(pad, pad))
        x = r + x
    return x


def bigvgan_forward(p, cfg: Dict[str, Any], mel: jax.Array) -> jax.Array:
    """mel [B, mel_dim, S] (DiT output) -> waveform [B, L] in [-1, 1]."""
    min_level = math.exp(-115 / 20.0 * math.log(10))
    amp = jnp.exp(jnp.asarray(mel, jnp.float32))
    db = 20.0 * jnp.log10(jnp.clip(amp, min_level)) - 20.0
    x = jnp.clip(2.0 * ((db + 115.0) / 115.0) - 1.0, -1.0, 1.0)

    x = _conv1d(x, p["conv_pre.weight"], p["conv_pre.bias"], pad=(3, 3))
    rks = cfg["resblock_kernel_sizes"]
    rds = cfg["resblock_dilation_sizes"]
    n_res = len(rks)
    for li, (rate, k) in enumerate(zip(cfg["upsample_rates"],
                                       cfg["upsample_kernel_sizes"])):
        x = _conv_transpose1d(x, p[f"ups.{li}.0.weight"],
                              p[f"ups.{li}.0.bias"], stride=rate,
                              padding=(k - rate) // 2)
        acc = None
        for bi in range(n_res):
            y = _amp_block(p, f"resblocks.{li * n_res + bi}", x,
                           rks[bi], rds[bi])
            acc = y if acc is None else acc + y
        x = acc / n_res
    x = _activation1d(p, "activation_post", x)
    x = _conv1d(x, p["conv_post.weight"], p.get("conv_post.bias"),
                pad=(3, 3))
    return jnp.clip(x, -1.0, 1.0)[:, 0, :]


# ----------------------------------------------------------- entry point


def token2wav(extra: Dict[str, np.ndarray], dit_cfg: Dict[str, Any],
              bigvgan_cfg: Dict[str, Any], code, conditioning, ref_mel,
              noise, num_steps: int = 10, guidance_scale: float = 0.5,
              sway_coefficient: float = -1.0) -> jax.Array:
    """Full code -> waveform path from an omni checkpoint's ``_extra``
    tensors (keys ``token2wav.code2wav_dit_model.*`` /
    ``token2wav.code2wav_bigvgan_model.*``, HF names)."""
    def sub(prefix):
        out = {}
        for k, v in extra.items():
            for lead in (f"token2wav.{prefix}.", f"{prefix}."):
                if k.startswith(lead):
                    v = np.asarray(v)
                    out[k[len(lead):]] = (v.astype(np.float32)
                                          if v.dtype == np.float16 else v)
        return out

    dit_p = sub("code2wav_dit_model")
    bv_p = sub("code2wav_bigvgan_model")
    mel = dit_sample(dit_p, dit_cfg, conditioning, ref_mel, code, noise,
                     num_steps, guidance_scale, sway_coefficient)
    return bigvgan_forward(bv_p, bigvgan_cfg, mel)
