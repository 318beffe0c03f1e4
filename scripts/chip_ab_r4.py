"""Round-4 on-chip A/B: pick the grouped-GQA default from data.

chip_ab_r3 showed the grouped-GQA decode formulation LOSES at short
context (tinyllama bs1 ctx64: 741.6 grouped vs 784.4 repeat; mistral bs8
ctx64: 1147.0 vs 1201.5) — it was the r1->r3 headline regression. The
grouped path's win condition is cache-read-bound decode (it reads each
cached KV byte once vs nh/nkv times), which needs LONG context. This
script measures the crossover at ctx2048 and the repeat-path short-ctx
numbers, so modules._GQA_GROUPED "auto" can gate on cache length instead
of being unconditionally on.

Run EXCLUSIVELY (no other TPU process):
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_ab_r4.py
"""

import json
import time

import numpy as np

RESULTS = {}


def _flush():
    with open("/tmp/chip_ab_r4.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def decode_tok_s(cfg, params, b=1, ctx=64, n_gen=256, n_small=32,
                 kv_quant=False):
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
    from autoawq_tpu.nn import modules
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils.synth import random_quantized_params

    print("backend:", jax.default_backend(), flush=True)

    tiny = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=2048,
        intermediate_size=5632, num_hidden_layers=22,
        num_attention_heads=32, num_key_value_heads=4, head_dim=64,
        max_position_embeddings=4096)
    mistral = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        max_position_embeddings=8192)

    def clear():
        gen.prefill.clear_cache()
        gen.decode_step.clear_cache()
        gen.generate_compiled.clear_cache()

    for name, cfg in (("tiny", tiny), ("mistral", mistral)):
        params = jax.device_put(random_quantized_params(
            cfg, seed=0, fp_dtype=jnp.bfloat16, fused=True))
        for ctx in (64, 2048):
            for flag in ("1", "0"):
                modules._GQA_GROUPED = flag
                clear()
                r = decode_tok_s(cfg, params, b=1, ctx=ctx,
                                 n_gen=256 if ctx == 2048 else 512)
                RESULTS[f"{name}_bs1_ctx{ctx}_grouped_{flag}"] = round(r, 1)
                print(f"{name} bs1 ctx{ctx} grouped={flag}: {r:.1f} tok/s",
                      flush=True)
                _flush()
        modules._GQA_GROUPED = "auto"
        clear()

        # last-chance leg for ops/decode_attn.py (VERDICT r3 weak #3): the
        # standalone decode-attention kernel lost at ctx64 (643 vs 789);
        # measure its long-context case before deleting it
        import os

        os.environ["AWQ_TPU_DECODE_KERNEL"] = "1"
        try:
            modules._GQA_GROUPED = "0"  # kernel replaces the XLA chain
            clear()
            r = decode_tok_s(cfg, params, b=1, ctx=2048, n_gen=256)
            RESULTS[f"{name}_bs1_ctx2048_decode_kernel"] = round(r, 1)
            print(f"{name} bs1 ctx2048 decode_kernel: {r:.1f} tok/s",
                  flush=True)
        finally:
            os.environ.pop("AWQ_TPU_DECODE_KERNEL", None)
            modules._GQA_GROUPED = "auto"
        clear()
        _flush()
        del params
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
