"""Round-4d chip A/B: the fused decode block-tail megakernel
(ops/fused_block_tail.py — o_proj + residual + RMSNorm + MLP in one
pallas_call) vs the unfused chain, back-to-back in one process.

Legs:
  1. tinyllama bs1 ctx64  (headline row; profile showed qkv/o GEMMs at
     ~50% streaming efficiency — the tail folds o into the long kernel)
  2. mistral-7b bs1 ctx64 (hd=128 grouped attention path)
  3. mistral-7b bs8 ctx64 int8 KV (grouped chain + tail; the bf16 bs8
     case engages the attention megakernel which already folds o)

Writes CHIP_AB_R4D_RESULTS.json.
Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_ab_r4d.py
"""

import json
import os
import time

import numpy as np

RESULTS = {}


def _flush():
    with open("CHIP_AB_R4D_RESULTS.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def decode_tok_s(cfg, params, b, ctx, n_gen, n_small=32, kv_quant=False):
    import jax.numpy as jnp

    from autoawq_tpu.serve import generate as gen

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, ctx)))

    def run(n):
        t0 = time.perf_counter()
        np.asarray(gen.generate_compiled(cfg, params, prompt, n,
                                         method="auto", dtype=jnp.bfloat16,
                                         kv_quant=kv_quant))
        return time.perf_counter() - t0

    run(n_small), run(n_gen)
    t_small = min(run(n_small) for _ in range(3))
    t_big = min(run(n_gen) for _ in range(3))
    return b * (n_gen - n_small) / (t_big - t_small)


def main():
    import jax
    import jax.numpy as jnp

    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils.synth import random_quantized_params

    def clear():
        gen.prefill.clear_cache()
        gen.decode_step.clear_cache()
        gen.generate_compiled.clear_cache()

    tiny = ModelConfig(model_type="llama", vocab_size=32000,
                       hidden_size=2048, intermediate_size=5632,
                       num_hidden_layers=22, num_attention_heads=32,
                       num_key_value_heads=4, head_dim=64,
                       max_position_embeddings=2048)
    mistral = ModelConfig(model_type="llama", vocab_size=32000,
                          hidden_size=4096, intermediate_size=14336,
                          num_hidden_layers=32, num_attention_heads=32,
                          num_key_value_heads=8, head_dim=128,
                          max_position_embeddings=8192)

    legs = [
        ("tiny_bs1", tiny, 1, 64, 512, False),
        ("mistral_bs1", mistral, 1, 64, 256, False),
        ("mistral_bs8_int8", mistral, 8, 64, 256, True),
    ]
    last = None
    for name, cfg, b, ctx, n_gen, kvq in legs:
        if cfg is not last:
            params = jax.device_put(random_quantized_params(
                cfg, seed=0, fp_dtype=jnp.bfloat16, fused=True))
            last = cfg
        for flag in ("1", "0"):
            os.environ["AWQ_TPU_FUSED_TAIL"] = flag
            clear()
            r = decode_tok_s(cfg, params, b, ctx, n_gen, kv_quant=kvq)
            RESULTS[f"{name}_tail{flag}"] = round(r, 1)
            print(f"{name} tail={flag}: {r:.1f} tok/s", flush=True)
            _flush()
    os.environ.pop("AWQ_TPU_FUSED_TAIL", None)


if __name__ == "__main__":
    main()
