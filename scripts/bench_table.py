"""BASELINE.md-shaped benchmark table on the real chip -> BENCH_TABLE.json.

Rows mirror the reference's published table (reference README.md:196-238,
RTX 4090): TinyLlama-1.1B + Mistral-7B + Llama-2-13B shapes, prefill and
decode, bs1/bs8, ctx 64/2048. Synthetic random int4 weights (throughput is
weight-streaming-bound; values are irrelevant). Also probes the chip's
attainable bf16 matmul rate and HBM stream rate so each row carries a
roofline utilization claim.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_table.py
"""

import functools
import json
import time

import numpy as np

BASELINES = {  # reference README.md tok/s on RTX 4090 (GEMM kernel)
    ("tinyllama", 1, 64, "decode"): 548.99,   # GEMV row, README.md:220
    ("mistral-7b", 1, 64, "decode"): 156.32,
    ("mistral-7b", 1, 64, "prefill"): 3184.74,
    ("mistral-7b", 1, 2048, "decode"): 114.41,
    ("mistral-7b", 1, 2048, "prefill"): 3897.02,
    ("mistral-7b", 8, 64, "decode"): 1185.25,
    ("mistral-7b", 8, 2048, "prefill"): 3661.46,
    ("mistral-7b", 8, 2048, "decode"): 829.75,
    ("llama2-13b", 1, 64, "decode"): 96.7,
    ("llama2-13b", 3, 2048, "decode"): 189.57,  # README.md:226
    ("mpt-7b", 1, 64, "decode"): 161.34,        # README.md:228
    ("falcon-7b", 1, 64, "decode"): 133.59,     # README.md:231
}

MODELS = {
    "tinyllama": dict(vocab_size=32000, hidden_size=2048,
                      intermediate_size=5632, num_hidden_layers=22,
                      num_attention_heads=32, num_key_value_heads=4,
                      head_dim=64),
    "mistral-7b": dict(vocab_size=32000, hidden_size=4096,
                       intermediate_size=14336, num_hidden_layers=32,
                       num_attention_heads=32, num_key_value_heads=8,
                       head_dim=128),
    "llama2-13b": dict(vocab_size=32000, hidden_size=5120,
                       intermediate_size=13824, num_hidden_layers=40,
                       num_attention_heads=40, num_key_value_heads=40,
                       head_dim=128),
    # MPT-7B: ALiBi, LayerNorm, non-gated gelu MLP, tied embeddings
    # (reference README.md:228 row; knobs per models/config._adapt_mpt)
    "mpt-7b": dict(model_type="mpt", vocab_size=50432, hidden_size=4096,
                   intermediate_size=16384, num_hidden_layers=32,
                   num_attention_heads=32, num_key_value_heads=32,
                   head_dim=128, hidden_act="gelu", norm_kind="ln",
                   pos_embed="alibi", gated_mlp=False,
                   tie_word_embeddings=True),
    # Falcon-7B: multi-query (1 kv head), parallel residual w/ shared
    # input norm, LayerNorm, non-gated gelu MLP, tied embeddings
    # (reference README.md:231 row; knobs per models/config._adapt_falcon)
    "falcon-7b": dict(model_type="falcon", vocab_size=65024,
                      hidden_size=4544, intermediate_size=18176,
                      num_hidden_layers=32, num_attention_heads=71,
                      num_key_value_heads=1, head_dim=64,
                      hidden_act="gelu", norm_kind="ln",
                      parallel_residual=True, shared_input_norm=True,
                      gated_mlp=False, tie_word_embeddings=True),
}

RUNS = [  # (model, batch, ctx, gen, kv-cache dtype)
    ("tinyllama", 1, 64, 512, "bf16"),
    ("mistral-7b", 1, 64, 256, "bf16"),
    ("mistral-7b", 1, 2048, 256, "bf16"),
    ("mistral-7b", 8, 64, 256, "bf16"),
    # int8 KV halves the per-step cache stream — the best measured bs8
    # config (CHIP_AB_R4C_RESULTS.json); reported as its own row since the
    # 4090 baseline runs an fp16 cache
    ("mistral-7b", 8, 64, 256, "int8"),
    # reference README.md:213 also publishes bs8 ctx2048 (829.75 decode)
    ("mistral-7b", 8, 2048, 256, "bf16"),
    ("mistral-7b", 8, 2048, 256, "int8"),
    ("llama2-13b", 1, 64, 128, "bf16"),
    # bs3 ctx2048 is the reference's other published 13B row (README.md:226);
    # bf16 KV at b3 cap 2176 = 5.4 GB + 7 GB weights still fits 16 GB HBM
    ("llama2-13b", 3, 2048, 128, "bf16"),
    ("mpt-7b", 1, 64, 256, "bf16"),
    ("falcon-7b", 1, 64, 256, "bf16"),
]


def probe_roofline():
    """Measured peak bf16 matmul TFLOP/s and HBM stream GB/s.

    Both probes chain their repetitions INSIDE one jit via a value-dependent
    fori_loop — per-dispatch tunnel RPC (~30 ms) would otherwise dominate
    and under-report by ~5x (observed: 108 TFLOP/s / 149 GB/s with one
    dispatch per rep vs the real rates below)."""
    import jax
    import jax.numpy as jnp

    n, reps = 4096, 32
    b = jnp.full((n, n), 0.01, jnp.bfloat16)

    @jax.jit
    def mm(a):
        # a@b feeds the next iteration: nothing can be CSE'd or overlapped
        return jax.lax.fori_loop(
            0, reps, lambda i, a: (a @ b).astype(jnp.bfloat16), a)

    a0 = jnp.full((n, n), 0.01, jnp.bfloat16)
    mm(a0).block_until_ready()
    t0 = time.perf_counter()
    mm(a0).block_until_ready()
    tflops = reps * 2 * n**3 / (time.perf_counter() - t0) / 1e12

    big = jnp.ones((1 << 27,), jnp.bfloat16)  # 256 MB

    @jax.jit
    def stream(x):
        # chained scaled-copy: each iteration reads + writes the full
        # buffer (reductions under-report TPU HBM bandwidth by ~2-3x)
        return jax.lax.fori_loop(
            0, reps, lambda i, x: x * jnp.bfloat16(0.9999), x)

    stream(big).block_until_ready()
    t0 = time.perf_counter()
    stream(big).block_until_ready()
    gbps = reps * 2 * big.nbytes / (time.perf_counter() - t0) / 1e9
    return tflops, gbps


def weight_stream_bytes(cfg) -> int:
    """Bytes read from HBM per decode step: packed int4 + scales/zeros for
    every quantized linear, plus the bf16 lm_head / embeddings matvec."""
    h, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim_)
    n_mlp = 3 if cfg.gated_mlp else 2  # fc1/fc2 vs gate/up/down
    per_layer_params = (h * (nh + 2 * nkv) * hd + nh * hd * h
                        + n_mlp * h * inter)
    q = per_layer_params // 2  # int4
    scales = per_layer_params // 128 * 2  # fp(16->32 on load, stored f32)
    lm_head = h * cfg.vocab_size * 2  # bf16 (tied models read embed.T)
    return L * (q + scales) + lm_head


def cache_stream_bytes(cfg, b: int, capacity: int, kv: str = "bf16") -> int:
    """KV-cache bytes READ per decode step. Shapes are static, so attention
    reads the full cache CAPACITY every step (masked, not skipped); writes
    are one row/step — negligible. int8 halves the payload but adds
    per-(b, head, token) f32 absmax scales."""
    nkv, hd, L = cfg.num_key_value_heads, cfg.head_dim_, cfg.num_hidden_layers
    rows = L * b * nkv * capacity
    if kv == "int8":
        return rows * hd * 2 * 1 + rows * 2 * 4  # int8 k+v, f32 scales
    return rows * hd * 2 * 2  # bf16 k+v


def flops_per_token(cfg) -> int:
    h, inter, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    nh, nkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim_)
    n_mlp = 3 if cfg.gated_mlp else 2
    per_layer = 2 * (h * (nh + 2 * nkv) * hd + nh * hd * h
                     + n_mlp * h * inter)
    return L * per_layer + 2 * h * cfg.vocab_size


def main():
    import jax
    import jax.numpy as jnp

    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils.synth import random_quantized_params

    tflops, gbps = probe_roofline()
    print(f"measured roofline: {tflops:.1f} bf16 TFLOP/s, "
          f"{gbps:.0f} GB/s HBM stream")

    rng = np.random.default_rng(0)
    rows = []
    last_model = None

    def flush():
        with open("BENCH_TABLE.json", "w") as f:
            json.dump({"roofline": {"bf16_tflops": round(tflops, 1),
                                    "hbm_gbps": round(gbps, 0)},
                       "rows": rows}, f, indent=1)

    def run_one(cfg, params, name, b, ctx, n_gen, kv_quant=False):
        prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, ctx)))
        total = ctx + n_gen

        # prefill timing: 8 loop-variant reps chained inside ONE jit —
        # per-dispatch tunnel RPC (~30 ms) would otherwise swamp a
        # single prefill and under-report tok/s by up to ~10x
        reps = 8

        @functools.partial(jax.jit, static_argnames=())
        def prefill_reps(params, prompt):
            def body(i, acc):
                p = jnp.roll(prompt, i, axis=1)  # loop-variant: no hoisting
                caches = gen.init_kv_cache(cfg, b, total, jnp.bfloat16)
                logits, _ = gen.prefill(cfg, params, p, caches, "auto",
                                        jnp.bfloat16)
                return acc + logits.mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        np.asarray(prefill_reps(params, prompt))
        t0 = time.perf_counter()
        np.asarray(prefill_reps(params, prompt))
        pre_tps = reps * b * ctx / (time.perf_counter() - t0)

        # decode timing by difference quotient of two generation lengths:
        # prefill time and the constant dispatch RPC cancel in the subtraction
        n_small = 32

        def timed_gen(n):
            t0 = time.perf_counter()
            np.asarray(gen.generate_compiled(cfg, params, prompt, n,
                                             method="auto",
                                             dtype=jnp.bfloat16,
                                             kv_quant=kv_quant))
            return time.perf_counter() - t0

        timed_gen(n_small), timed_gen(n_gen)  # compile both shapes
        t_small = min(timed_gen(n_small) for _ in range(2))
        t_big = min(timed_gen(n_gen) for _ in range(2))
        best = b * (n_gen - n_small) / (t_big - t_small)
        return pre_tps, best

    for name, b, ctx, n_gen, kv in RUNS:
        knobs = {"model_type": "llama", **MODELS[name]}
        cfg = ModelConfig(max_position_embeddings=8192, **knobs)
        if name != last_model:
            params = jax.device_put(random_quantized_params(
                cfg, seed=0, fp_dtype=jnp.bfloat16, fused=True))
            last_model = name
        # the compile tunnel occasionally drops a connection mid-request —
        # retry each configuration once before skipping it
        for attempt in (1, 2):
            try:
                pre_tps, best = run_one(cfg, params, name, b, ctx, n_gen,
                                        kv_quant=kv == "int8")
                break
            except Exception as e:
                print(f"run {name} b{b} ctx{ctx} attempt {attempt}: {e}")
                if attempt == 2:
                    rows.append(dict(model=name, batch=b, ctx=ctx,
                                     gen=n_gen, error=str(e)[:200]))
                    flush()
                    pre_tps = None
        if pre_tps is None:
            continue

        wbytes = weight_stream_bytes(cfg)
        kvbytes = cache_stream_bytes(cfg, b, ctx + n_gen, kv)
        ftok = flops_per_token(cfg)
        # decode streams the weights once per STEP plus the full (static-
        # shape) KV cache; both count toward the HBM roofline claim
        dec_bw = best / b * (wbytes + kvbytes) / 1e9
        pre_mfu = pre_tps * ftok / (tflops * 1e12)
        for kind, tps in (("prefill", pre_tps), ("decode", best)):
            if kind == "prefill" and kv != "bf16":
                continue  # prefill doesn't re-read the cache; bf16 row covers it
            base = BASELINES.get((name, b, ctx, kind))
            rows.append(dict(
                model=name, batch=b, ctx=ctx, gen=n_gen, kind=kind, kv=kv,
                tok_s=round(tps, 1),
                vs_rtx4090=round(tps / base, 3) if base else None,
                roofline=(f"{dec_bw:.0f}/{gbps:.0f} GB/s weights+KV stream"
                          if kind == "decode" else
                          f"{100 * pre_mfu:.0f}% of measured peak FLOPs"),
            ))
            print(rows[-1])
        flush()
    print("wrote BENCH_TABLE.json")


if __name__ == "__main__":
    main()
