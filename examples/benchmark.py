"""Benchmark harness: prefill/decode tok/s + device memory per context round.

Mirror of the reference's examples/benchmark.py (rounds of
context x generation sizes, per-round tokens/s table, memory column) driven
by the TPU runtime: one compiled prefill + a lax.scan-compiled decode loop
(zero per-token dispatch), timed with full host synchronization.

Usage:
  python examples/benchmark.py --model /path/to/quantized [--batch-size 1]
  python examples/benchmark.py --synthetic tinyllama  # no checkpoint needed
"""

import argparse
import json
import time

import numpy as np

SYNTHETIC = {
    "tinyllama": dict(vocab_size=32000, hidden_size=2048,
                      intermediate_size=5632, num_hidden_layers=22,
                      num_attention_heads=32, num_key_value_heads=4,
                      head_dim=64),
    "llama2-7b": dict(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=32,
                      head_dim=128),
    "mistral-7b": dict(vocab_size=32000, hidden_size=4096,
                       intermediate_size=14336, num_hidden_layers=32,
                       num_attention_heads=32, num_key_value_heads=8,
                       head_dim=128),
}

ROUNDS = [(32, 32), (64, 64), (128, 128), (256, 256), (512, 512),
          (1024, 1024), (2048, 2048)]


def device_mem_gb():
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1e9
    except Exception:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="quantized checkpoint dir")
    ap.add_argument("--synthetic", choices=sorted(SYNTHETIC),
                    help="random-weight model (throughput only)")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=4,
                    help="number of (ctx, gen) rounds to run")
    ap.add_argument("--no-fuse", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from autoawq_tpu.serve import generate as gen

    if args.synthetic:
        from autoawq_tpu.models.config import ModelConfig
        from autoawq_tpu.nn.fuse import fuse_model
        from autoawq_tpu.utils.synth import random_quantized_params

        cfg = ModelConfig(model_type="llama", max_position_embeddings=8192,
                          **SYNTHETIC[args.synthetic])
        params = random_quantized_params(cfg, seed=0, fp_dtype=jnp.bfloat16)
        if not args.no_fuse:
            params = fuse_model(cfg, params)
        params = jax.device_put(params)
    else:
        from autoawq_tpu.api import AutoAWQForCausalLM

        model = AutoAWQForCausalLM.from_quantized(
            args.model, fuse_layers=not args.no_fuse).to_device()
        cfg, params = model.cfg, model.params

    rng = np.random.default_rng(0)
    b = args.batch_size
    rows = []
    print(f"| batch | ctx | gen | prefill tok/s | decode tok/s | mem (GB) |")
    print(f"|------:|----:|----:|--------------:|-------------:|---------:|")
    for ctx, n_gen in ROUNDS[: args.rounds]:
        prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, ctx)))
        total = ctx + n_gen
        caches = gen.init_kv_cache(cfg, b, total, jnp.bfloat16)
        # compile + warmup
        logits, caches = gen.prefill(cfg, params, prompt, caches,
                                     "auto", jnp.bfloat16)
        np.asarray(logits)

        caches = gen.init_kv_cache(cfg, b, total, jnp.bfloat16)
        t0 = time.perf_counter()
        logits, caches = gen.prefill(cfg, params, prompt, caches,
                                     "auto", jnp.bfloat16)
        np.asarray(logits)
        dt_prefill = time.perf_counter() - t0

        out = gen.generate_compiled(cfg, params, prompt, n_gen,
                                    method="auto", dtype=jnp.bfloat16)
        np.asarray(out)  # compile + warmup
        t0 = time.perf_counter()
        out = gen.generate_compiled(cfg, params, prompt, n_gen,
                                    method="auto", dtype=jnp.bfloat16)
        np.asarray(out)
        dt_total = time.perf_counter() - t0
        dt_decode = max(dt_total - dt_prefill, 1e-9)

        pre_tps = b * ctx / dt_prefill
        dec_tps = b * n_gen / dt_decode
        mem = device_mem_gb()
        rows.append(dict(batch=b, ctx=ctx, gen=n_gen,
                         prefill_tok_s=round(pre_tps, 1),
                         decode_tok_s=round(dec_tps, 1),
                         mem_gb=round(mem, 2)))
        print(f"| {b} | {ctx} | {n_gen} | {pre_tps:.1f} | {dec_tps:.1f} "
              f"| {mem:.2f} |")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
