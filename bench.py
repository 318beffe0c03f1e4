"""Headline benchmark: W4A16 decode throughput, TinyLlama-1.1B-shaped model,
batch 1, on one TPU chip.

Baseline: the reference's TinyLlama 1B GEMV decode bs1 ctx64 = 548.99 tok/s
on an RTX 4090 (BASELINE.md / reference README.md:220). Like the reference's
examples/benchmark.py, prefill and decode are timed separately and the
headline is decode tokens/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_TOK_S = 548.99  # RTX 4090, AutoAWQ GEMV, TinyLlama 1B, bs1 ctx64
CTX = 64
DECODE_TOKENS = 512


def main():
    import jax
    import jax.numpy as jnp

    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.serve import generate as gen

    cfg = ModelConfig(
        model_type="llama",
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5632,
        num_hidden_layers=22,
        num_attention_heads=32,
        num_key_value_heads=4,
        head_dim=64,
        max_position_embeddings=2048,
    )
    from autoawq_tpu.nn.fuse import fuse_model
    from autoawq_tpu.utils.synth import random_quantized_params

    rng = np.random.default_rng(0)
    # host-side synthesis + fusion, then ONE batched device transfer —
    # host-resident params would be re-uploaded on every jitted call.
    params = jax.device_put(
        fuse_model(cfg, random_quantized_params(cfg, seed=0,
                                                fp_dtype=jnp.bfloat16))
    )
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, CTX)))

    def run_prefill():
        caches = gen.init_kv_cache(cfg, 1, CTX + DECODE_TOKENS, jnp.bfloat16)
        logits, caches = gen.prefill(cfg, params, prompt, caches,
                                     "auto", jnp.bfloat16)
        np.asarray(logits)

    def run_full():
        out = gen.generate_compiled(cfg, params, prompt, DECODE_TOKENS,
                                    method="auto", dtype=jnp.bfloat16)
        np.asarray(out)  # full host transfer: immune to async-dispatch lies

    run_prefill()
    run_full()  # compile + warmup

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        run_prefill()
        dt_prefill = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_full()
        dt_full = time.perf_counter() - t0
        tok_s = DECODE_TOKENS / max(dt_full - dt_prefill, 1e-9)
        best = max(best, tok_s)

    print(json.dumps({
        "metric": "tinyllama_1b_w4a16_decode_bs1_ctx64",
        "value": round(best, 2),
        "unit": "tok/s",
        "vs_baseline": round(best / BASELINE_TOK_S, 4),
    }))


if __name__ == "__main__":
    main()
