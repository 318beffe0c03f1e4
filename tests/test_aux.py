"""Auxiliary subsystems: calibration resume, orbax checkpoints, profiling."""

import numpy as np
import jax.numpy as jnp
import pytest

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.quantize.quantizer import AwqQuantizer


def _cfg():
    return ModelConfig(model_type="llama", vocab_size=64, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=2, num_key_value_heads=2,
                       head_dim=32, max_position_embeddings=64)


def test_calibration_resume(rng, tmp_path):
    cfg = _cfg()
    params = init_random_params(cfg, seed=0, scale=0.1)
    calib = rng.integers(0, 64, (4, 32))
    qcfg = AwqConfig(q_group_size=32)

    resume = str(tmp_path / "resume")
    q1 = AwqQuantizer(cfg, qcfg, params, calib, progress=False,
                      resume_dir=resume)
    out1 = q1.quantize()
    import os

    assert sorted(os.listdir(resume)) == ["layer_0000.npz", "layer_0001.npz"]

    # restart: all layers come from the checkpoints (bit-identical result)
    q2 = AwqQuantizer(cfg, qcfg, params, calib, progress=False,
                      resume_dir=resume)
    out2 = q2.quantize()
    a = np.asarray(out1["layers"][1]["mlp"]["down_proj"]["qweight"])
    b = np.asarray(out2["layers"][1]["mlp"]["down_proj"]["qweight"])
    np.testing.assert_array_equal(a, b)


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from autoawq_tpu.io import orbax_ckpt

    tree = {"a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "b": np.asarray([1, 2, 3], np.int32)}
    path = str(tmp_path / "ckpt")
    orbax_ckpt.save(path, tree)
    back = orbax_ckpt.load(path, tree)
    np.testing.assert_array_equal(np.asarray(back["a"]["w"]), tree["a"]["w"])
    np.testing.assert_array_equal(np.asarray(back["b"]), tree["b"])


def test_nan_check_toggle():
    import jax

    from autoawq_tpu.utils.profiling import enable_nan_checks

    enable_nan_checks(True)
    assert jax.config.jax_debug_nans
    enable_nan_checks(False)
    assert not jax.config.jax_debug_nans


def test_windowed_cache_roll(rng):
    """Generation beyond max_seq_len evicts oldest cache entries and keeps
    producing finite tokens (reference WindowedCache roll semantics)."""
    from autoawq_tpu.serve import generate as gen

    cfg = _cfg()
    params = init_random_params(cfg, seed=1, scale=0.1)
    prompt = jnp.asarray(rng.integers(0, 64, (1, 8)))
    out = np.asarray(gen.generate(cfg, params, prompt, 24, max_seq_len=16,
                                  method="jnp", dtype=jnp.float32))
    assert out.shape == (1, 32)
    assert (out >= 0).all() and (out < 64).all()

    caches = gen.init_kv_cache(cfg, 1, 8, jnp.float32)
    caches[0]["k"] = caches[0]["k"].at[0, 0, :, 0].set(jnp.arange(8.0))
    rolled = gen.roll_kv(caches, 3)
    np.testing.assert_allclose(np.asarray(rolled[0]["k"][0, 0, :5, 0]),
                               [3, 4, 5, 6, 7])


def test_minicpm_scaling_knobs():
    """minicpm residual/logit scaling changes outputs the expected way."""
    from dataclasses import replace

    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.nn import modules

    cfg = _cfg()
    params = init_random_params(cfg, seed=2, scale=0.1)
    toks = np.arange(6)[None]
    base = np.asarray(modules.forward(cfg, params, jnp.asarray(toks),
                                      method="jnp", dtype=np.float32))
    # logit_divisor scales logits exactly
    cfg2 = replace(cfg, logit_divisor=4.0)
    div = np.asarray(modules.forward(cfg2, params, jnp.asarray(toks),
                                     method="jnp", dtype=np.float32))
    np.testing.assert_allclose(div, base / 4.0, rtol=1e-5, atol=1e-6)
    # residual_scale=1.0 is a no-op; 0.5 changes results
    cfg3 = replace(cfg, residual_scale=1.0)
    same = np.asarray(modules.forward(cfg3, params, jnp.asarray(toks),
                                      method="jnp", dtype=np.float32))
    np.testing.assert_allclose(same, base, rtol=1e-5, atol=1e-6)
    cfg4 = replace(cfg, residual_scale=0.5)
    diff = np.asarray(modules.forward(cfg4, params, jnp.asarray(toks),
                                      method="jnp", dtype=np.float32))
    assert np.abs(diff - base).max() > 1e-3

    # adapter wiring
    c = ModelConfig.from_hf_dict({
        "model_type": "minicpm", "vocab_size": 64, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 4,
        "num_attention_heads": 2, "num_key_value_heads": 2,
        "scale_emb": 12, "scale_depth": 1.4, "dim_model_base": 32,
    })
    assert c.embed_scale == 12.0
    np.testing.assert_allclose(c.residual_scale, 1.4 / 2.0)
    assert c.logit_divisor == 2.0


def test_fetch_video_frame_list_and_array(rng):
    """Video preprocessing (reference qwen_vl_utils.py:306): frame-list and
    pre-decoded array inputs, fps sampling + FRAME_FACTOR rounding +
    per-frame pixel budget."""
    from autoawq_tpu.utils import vision_io as vio

    frames = [rng.integers(0, 255, (56, 84, 3)).astype(np.uint8)
              for _ in range(7)]
    out = vio.fetch_video({"video": frames})
    assert out.ndim == 4 and out.shape[0] == 6  # 7 -> floor to FRAME_FACTOR
    assert out.shape[1] == 3
    assert out.shape[2] % 28 == 0 and out.shape[3] % 28 == 0

    arr = rng.integers(0, 255, (32, 56, 56, 3)).astype(np.uint8)
    out2 = vio.fetch_video({"video": arr, "video_fps": 8.0, "fps": 2.0})
    assert out2.shape[0] == 8  # 32 frames @8fps -> 4s @2fps = 8
    with pytest.raises(NotImplementedError):
        vio.fetch_video({"video": "clip.mp4"})

    imgs, vids = vio.process_vision_info([
        {"role": "user", "content": [
            {"type": "image", "image": frames[0]},
            {"type": "video", "video": arr, "video_fps": 8.0},
        ]},
    ])
    assert len(imgs) == 1 and len(vids) == 1


def test_tpu_pod_quantize_dry_run(capsys):
    """The pod orchestration launcher (scripts/tpu_pod_quantize.py,
    analogue of the reference's runpod_quantize.py) emits a coherent
    gcloud sequence: create -> ship -> worker-on-all-hosts -> fetch ->
    delete, with quantize params threaded through to the worker."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "tpu_pod_quantize",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "tpu_pod_quantize.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--launch", "--dry-run", "--model", "org/m", "--out", "m-awq",
              "--tensor", "4", "--accelerator", "v5litepod-16"])
    out = capsys.readouterr().out
    assert "tpus tpu-vm create" in out and "v5litepod-16" in out
    assert "--worker=all" in out and "--worker --model org/m" in out
    assert "--tensor 4" in out
    assert out.index("create") < out.index("--worker --model") \
        < out.index("delete")
