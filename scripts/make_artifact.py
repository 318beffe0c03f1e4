"""Build THE shared benchmark/quality artifact: one TinyLlama-1.1B-shaped
synthetic model, AWQ-quantized once through the real calibration pipeline
and saved as an AutoAWQ checkpoint — so `bench.py` (throughput) and
`scripts/quality.py` (Δppl/KL vs fp and RTN) describe the SAME weights
instead of two unrelated synthetics.

The fp model is deterministic from RECIPE (seed + outlier spec); consumers
regenerate it in-process rather than storing a 4 GB fp checkpoint. The
quantized checkpoint lands in .artifacts/tinyllama-awq (gitignored — it is
a build product; ARTIFACT.json records provenance).

Run ON THE CHIP (the host has one CPU core; the jitted grid searches are
minutes on TPU vs hours on CPU):
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/make_artifact.py
"""

import json
import os
import time

import numpy as np

ARTIFACT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".artifacts", "tinyllama-awq")

# Deterministic fp-model recipe. Scale/outlier regime as scripts/quality.py:
# a few hot embedding channels feed every layer — the activation-outlier
# regime AWQ's scaling exists for.
RECIPE = {
    "seed": 0,
    "init_scale": 0.05,
    "outlier_channels": 16,
    "outlier_scale": 20.0,
    "calib_seed": 11,
    "n_calib": 16,
    "calib_seq": 256,
}

CFG_KW = dict(
    model_type="llama", vocab_size=32000, hidden_size=2048,
    intermediate_size=5632, num_hidden_layers=22, num_attention_heads=32,
    num_key_value_heads=4, head_dim=64, max_position_embeddings=2048,
)


def fp_model_from_recipe():
    """Regenerate the deterministic fp model (used here and by quality.py)."""
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig

    cfg = ModelConfig(**CFG_KW)
    params = init_random_params(cfg, seed=RECIPE["seed"],
                                scale=RECIPE["init_scale"])
    params["embed_tokens"]["weight"][:, :RECIPE["outlier_channels"]] *= \
        RECIPE["outlier_scale"]
    return cfg, params


def sample_calib(cfg, params):
    """Calib tokens sampled from the fp model itself (its own temperature-1
    distribution — the synthetic stand-in for pileval, no network)."""
    import jax.numpy as jnp

    from autoawq_tpu.serve import generate as gen

    bos = jnp.zeros((RECIPE["n_calib"], 1), jnp.int32)
    out = np.asarray(gen.generate_compiled(
        cfg, params, bos, RECIPE["calib_seq"], temperature=1.0,
        seed=RECIPE["calib_seed"], method="jnp", dtype=jnp.float32))
    return out[:, 1:]


def main():
    import jax

    from autoawq_tpu import AwqCausalLM, AwqConfig
    from autoawq_tpu.quantize.quantizer import AwqQuantizer

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    cfg, params = fp_model_from_recipe()
    print(f"fp model built ({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    calib = sample_calib(cfg, params)
    print(f"calib sampled {calib.shape} ({time.time() - t0:.0f}s)", flush=True)

    qcfg = AwqConfig()  # 4-bit g128 zero-point — the reference default
    t0 = time.time()
    quantizer = AwqQuantizer(cfg, qcfg, params, calib, progress=True,
                             offload_taps=True)
    qparams = quantizer.quantize()
    print(f"AWQ quantization ({time.time() - t0:.0f}s)", flush=True)

    model = AwqCausalLM(cfg, qparams, qcfg)
    os.makedirs(ARTIFACT_DIR, exist_ok=True)
    model.save_quantized(ARTIFACT_DIR)
    with open(os.path.join(ARTIFACT_DIR, "ARTIFACT.json"), "w") as f:
        json.dump({"recipe": RECIPE, "config": CFG_KW,
                   "quant": qcfg.to_dict(),
                   "built_on": jax.default_backend()}, f, indent=1)
    print("wrote", ARTIFACT_DIR)


if __name__ == "__main__":
    main()
