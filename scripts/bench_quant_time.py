"""Quantization wall-clock on the real chip -> QUANT_TIME.json.

The reference's headline claim is "10-15 min to quantize a 7B model"
(reference README.md:125, RTX 4090 class hardware, 128 pileval samples x
512 tokens). This measures the SAME recipe shape on one TPU chip:
mistral-7b-shaped random fp32 weights, 128 random 512-token calibration
samples (wall-clock is shape-determined, not value-determined), full AWQ
pipeline — calibration forwards, scale grid search, clip search,
apply + int4 pack (quantize/quantizer.py).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_quant_time.py
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp  # noqa: F401  (ensures backend init in timing)

    from autoawq_tpu import AwqConfig
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig

    cfg = ModelConfig(model_type="llama", vocab_size=32000,
                      hidden_size=4096, intermediate_size=14336,
                      num_hidden_layers=32, num_attention_heads=32,
                      num_key_value_heads=8, head_dim=128,
                      max_position_embeddings=8192)
    t0 = time.perf_counter()
    params = init_random_params(cfg, seed=0)
    t_init = time.perf_counter() - t0
    print(f"init 7B fp32 params: {t_init:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    calib = rng.integers(0, cfg.vocab_size, (128, 512))

    from autoawq_tpu.quantize.quantizer import AwqQuantizer

    t0 = time.perf_counter()
    # Memory/tunnel choreography for one 16 GB chip behind a network
    # tunnel: offload_taps=False (device_get of per-layer tap sets costs
    # minutes/layer through the tunnel) + compute_dtype=bf16 (the
    # reference calibrates in fp16 on GPU; scale/clip statistics stay
    # f32 internally either way) keeps the 128x512 tap set at ~3.5 GB
    # on-device — f32 taps OOM'd the chip.
    q = AwqQuantizer(cfg, AwqConfig(q_group_size=128), params, calib,
                     n_parallel_calib_samples=32, offload_taps=False,
                     compute_dtype=jnp.bfloat16, progress=True)
    qparams = q.quantize()
    assert "qweight" in qparams["layers"][0]["self_attn"]["q_proj"]
    secs = time.perf_counter() - t0
    print(f"quantize(7B, 128x512): {secs:.1f}s = {secs / 60:.1f} min",
          flush=True)

    with open("QUANT_TIME.json", "w") as f:
        json.dump({
            "model_shape": "mistral-7b (32L, h4096, inter14336, gqa8)",
            "recipe": "128 samples x 512 tokens, group 128, scale+clip",
            "seconds": round(secs, 1),
            "minutes": round(secs / 60, 2),
            "reference_claim": "10-15 min for 7B (reference README.md:125)",
        }, f, indent=1)
    print("wrote QUANT_TIME.json")


if __name__ == "__main__":
    main()
