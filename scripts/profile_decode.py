"""Profile one tinyllama scanned decode on the real chip and print the
per-op device-time table — used to locate the ~0.25 ms/step of non-stream
time in the headline row (785 tok/s = 1.27 ms/step vs ~1.03 ms of pure
weight+KV streaming at the measured HBM rate).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_decode.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils import profiling
    from autoawq_tpu.utils.synth import random_quantized_params

    cfg = ModelConfig(model_type="llama", max_position_embeddings=8192,
                      vocab_size=32000, hidden_size=2048,
                      intermediate_size=5632, num_hidden_layers=22,
                      num_attention_heads=32, num_key_value_heads=4,
                      head_dim=64)
    params = jax.device_put(random_quantized_params(
        cfg, seed=0, fp_dtype=jnp.bfloat16, fused=True))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 64)))

    n = 64
    np.asarray(gen.generate_compiled(cfg, params, prompt, n, method="auto",
                                     dtype=jnp.bfloat16))  # compile
    with profiling.trace("/tmp/awq_decode_trace") as d:
        np.asarray(gen.generate_compiled(cfg, params, prompt, n,
                                         method="auto", dtype=jnp.bfloat16))
    profiling.print_trace_summary(d, top=40)
    print(f"\n({n} decode steps; divide by {n} for per-step us)")


if __name__ == "__main__":
    main()
