"""Round-4c chip A/Bs: mistral-7b bs8 ctx64 decode — the one BENCH_TABLE
row still under 1.0x vs the 4090 (1104.1 vs 1185.25 in the last exclusive
window). Four configs back-to-back in one process (tunnel speed varies by
the hour; only same-process comparisons are meaningful):

  1. auto          — megakernel engaged (B*T=2560 >= 2048), bf16 cache
  2. fused=0       — XLA repeat-KV chain, bf16 cache
  3. int8 auto     — int8 KV, megakernel with in-kernel scale folding
  4. int8 fused=0  — int8 KV, grouped XLA chain

Decode tok/s via the difference-quotient method (two generation lengths,
prefill + dispatch RPC cancel). Writes CHIP_AB_R4C_RESULTS.json.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_ab_r4c.py
"""

import json
import os
import time

import numpy as np

MODEL = dict(vocab_size=32000, hidden_size=4096, intermediate_size=14336,
             num_hidden_layers=32, num_attention_heads=32,
             num_key_value_heads=8, head_dim=128)
B, CTX, GEN, SMALL = 8, 64, 256, 32


def main():
    import jax
    import jax.numpy as jnp

    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils.synth import random_quantized_params

    cfg = ModelConfig(model_type="llama", max_position_embeddings=8192,
                      **MODEL)
    params = jax.device_put(random_quantized_params(
        cfg, seed=0, fp_dtype=jnp.bfloat16, fused=True))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, CTX)))

    def decode_tps(kv_quant: bool) -> float:
        def timed(n):
            t0 = time.perf_counter()
            np.asarray(gen.generate_compiled(
                cfg, params, prompt, n, method="auto", dtype=jnp.bfloat16,
                kv_quant=kv_quant))
            return time.perf_counter() - t0

        timed(SMALL), timed(GEN)  # compile both shapes
        t_small = min(timed(SMALL) for _ in range(3))
        t_big = min(timed(GEN) for _ in range(3))
        return B * (GEN - SMALL) / (t_big - t_small)

    results = {}
    for name, fused_flag, kvq in (
        ("bf16_auto", "auto", False),
        ("bf16_fused0", "0", False),
        ("int8_auto", "auto", True),
        ("int8_fused0", "0", True),
    ):
        os.environ["AWQ_TPU_FUSED_ATTN"] = fused_flag
        # jit caches key on (cfg, method, dtype, kv_quant, shapes) but NOT
        # the env flag -> clear so each config re-traces with its gate
        gen.generate_compiled.clear_cache()
        gen.prefill.clear_cache()
        gen.decode_step.clear_cache()
        tps = decode_tps(kvq)
        results[name] = round(tps, 1)
        print(f"{name}: {tps:.1f} tok/s", flush=True)
    os.environ.pop("AWQ_TPU_FUSED_ATTN", None)

    results["baseline_rtx4090"] = 1185.25
    with open("CHIP_AB_R4C_RESULTS.json", "w") as f:
        json.dump({"mistral7b_bs8_ctx64_decode": results}, f, indent=1)
    print("wrote CHIP_AB_R4C_RESULTS.json")


if __name__ == "__main__":
    main()
