"""Round-3 consolidated on-chip A/B session (one process, one tunnel init).

Measures, in order (each prints one line; partial results are still
useful if the tunnel dies mid-run):
 1. headline decode, grouped-GQA ON vs OFF (the new batched-dims grouped
    formulation vs repeat-KV)             -> decides _GQA_GROUPED default
 2. headline decode with int8 KV cache    -> kv_quant win at bs1
 3. mistral-shaped bs8 decode, grouped/repeat/int8 (the 0.938x row)
 4. speculative decoding: tinyllama target + 4-layer draft, k=4
 5. short-M prefill: WS floor 1024 vs 256 at M=512 (ctx64 bs8 prefill row)

Run EXCLUSIVELY (no other TPU process):
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_ab_r3.py
"""

import json
import os
import time

import numpy as np

RESULTS = {}


def _flush():
    with open("/tmp/chip_ab_r3.json", "w") as f:
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
        max_position_embeddings=2048)
    tparams = jax.device_put(random_quantized_params(
        tiny, seed=0, fp_dtype=jnp.bfloat16, fused=True))

    def clear():
        # the whole-generation scan jit traces through the module global
        gen.prefill.clear_cache()
        gen.decode_step.clear_cache()
        gen.generate_compiled.clear_cache()

    # 1. grouped vs repeat, tinyllama bs1
    for flag in ("auto", "0"):
        modules._GQA_GROUPED = flag
        clear()
        r = decode_tok_s(tiny, tparams, b=1, ctx=64, n_gen=512)
        RESULTS[f"tiny_bs1_grouped_{flag}"] = round(r, 1)
        print(f"tinyllama bs1 grouped={flag}: {r:.1f} tok/s", flush=True)
        _flush()
    modules._GQA_GROUPED = "auto"
    clear()

    # 2. int8 KV cache, tinyllama bs1
    r = decode_tok_s(tiny, tparams, b=1, ctx=64, n_gen=512, kv_quant=True)
    RESULTS["tiny_bs1_int8kv"] = round(r, 1)
    print(f"tinyllama bs1 int8 kv: {r:.1f} tok/s", flush=True)
    _flush()

    # 3. mistral-shaped bs8 (the 0.938x row) grouped/repeat/int8
    mistral = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        max_position_embeddings=8192)
    mparams = jax.device_put(random_quantized_params(
        mistral, seed=0, fp_dtype=jnp.bfloat16, fused=True))
    for flag in ("auto", "0"):
        modules._GQA_GROUPED = flag
        clear()
        r = decode_tok_s(mistral, mparams, b=8, ctx=64, n_gen=256)
        RESULTS[f"mistral_bs8_grouped_{flag}"] = round(r, 1)
        print(f"mistral bs8 grouped={flag}: {r:.1f} tok/s "
              f"(4090 ref 1185.25)", flush=True)
        _flush()
    modules._GQA_GROUPED = "auto"
    clear()
    r = decode_tok_s(mistral, mparams, b=8, ctx=64, n_gen=256, kv_quant=True)
    RESULTS["mistral_bs8_int8kv"] = round(r, 1)
    print(f"mistral bs8 int8 kv: {r:.1f} tok/s", flush=True)
    r = decode_tok_s(mistral, mparams, b=1, ctx=64, n_gen=256)
    RESULTS["mistral_bs1_grouped_auto"] = round(r, 1)
    print(f"mistral bs1 grouped=auto: {r:.1f} tok/s (4090 ref 156.32)",
          flush=True)
    _flush()

    # 4. speculative decoding: tinyllama target, 4-layer draft
    from autoawq_tpu.serve.speculative import generate_speculative

    draft_cfg = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=1024,
        intermediate_size=2816, num_hidden_layers=4,
        num_attention_heads=16, num_key_value_heads=4, head_dim=64,
        max_position_embeddings=2048)
    dparams = jax.device_put(random_quantized_params(
        draft_cfg, seed=1, fp_dtype=jnp.bfloat16, fused=True))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 32000, (1, 64)))
    # random-weights models give near-zero acceptance; this measures the
    # OVERHEAD floor. Report tok/s and accept rate; real-model acceptance
    # (0.6-0.8 typical) scales the win.
    for k in (4,):
        t0 = time.perf_counter()
        out, stats = generate_speculative(
            tiny, tparams, draft_cfg, dparams, prompt, 128, k=k,
            method="auto", dtype=jnp.bfloat16)
        dt = time.perf_counter() - t0
        RESULTS[f"spec_k{k}"] = {
            "tok_s_cold": round(128 / dt, 1), **{
                kk: round(float(v), 3) for kk, v in stats.items()}}
        print(f"spec k={k}: {128/dt:.1f} tok/s cold (accept "
              f"{stats['accept_rate']:.2f})", flush=True)
    _flush()

    # 5. WS floor at M=512 (bs8 ctx64 prefill regime)
    from autoawq_tpu.ops import pallas_gemm

    qp = random_quantized_params(mistral, seed=0, fp_dtype=jnp.bfloat16,
                                 fused=True)
    gu = qp["layers"][0]["mlp"]["gate_up_proj"]
    gu = {kk: jax.device_put(v) for kk, v in gu.items() if kk in
          ("qweight", "scales", "qzeros")}
    n_out = 2 * 14336
    for m in (256, 512, 768):
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (m, 4096)).astype(np.float32)).astype(jnp.bfloat16)
        for floor in (1024, 256):
            pallas_gemm.WS_MIN_M = floor  # read at trace time

            # chain reps inside one jit: per-dispatch tunnel RPC would
            # swamp a single sub-ms kernel (see scripts/bench_table.py)
            reps = 16

            @jax.jit
            def f(x):
                def body(i, acc):
                    y = pallas_gemm.awq_matmul_pallas(
                        jnp.roll(x, i, axis=0), gu["qweight"], gu["scales"],
                        gu.get("qzeros"), out_features=n_out)
                    return acc + y.mean().astype(jnp.float32)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            np.asarray(f(x))
            t0 = time.perf_counter()
            np.asarray(f(x))
            dt = (time.perf_counter() - t0) / reps
            tf = 2 * m * 4096 * n_out / dt / 1e12
            RESULTS[f"ws_m{m}_floor{floor}"] = round(tf, 1)
            print(f"M={m} WS floor {floor}: {tf:.1f} TFLOP/s", flush=True)
            f.clear_cache()
            pallas_gemm.awq_matmul_pallas.clear_cache()
        _flush()
    pallas_gemm.WS_MIN_M = 1024

    # 6. serving-engine A/B: slot pool vs paged pool, 8 concurrent
    # requests on the tinyllama shape (paged pays a block-table gather;
    # measure the tax/win at bs8 decode)
    from autoawq_tpu.serve.batching import BatchingEngine
    from autoawq_tpu.serve.paged import PagedBatchingEngine

    def engine_tok_s(make):
        rng = np.random.default_rng(0)
        eng = make()
        for i in range(8):
            eng.add_request(i, rng.integers(0, 32000, (64,)), 128)
        # admit + warm the compiled step
        for _ in range(3):
            eng.step()
        n0 = sum(len(r.output) for r in eng.slots if r is not None)
        t0 = time.perf_counter()
        steps = 0
        while eng.has_work and steps < 100:
            eng.step()
            steps += 1
        dt = time.perf_counter() - t0
        n1 = (sum(len(r.output) for r in eng.slots if r is not None)
              + sum(len(r.output) for r in eng.finished))
        return (n1 - n0) / dt

    r = engine_tok_s(lambda: BatchingEngine(
        tiny, tparams, max_batch=8, max_seq_len=256))
    RESULTS["engine_slot_bs8"] = round(r, 1)
    print(f"slot engine bs8: {r:.1f} tok/s", flush=True)
    r = engine_tok_s(lambda: PagedBatchingEngine(
        tiny, tparams, max_batch=8, page_size=32, total_pages=128,
        pages_per_seq=8))
    RESULTS["engine_paged_bs8"] = round(r, 1)
    print(f"paged engine bs8: {r:.1f} tok/s", flush=True)

    # ---- paged attention kernel A/B: stock (bf16) vs bespoke (bf16) vs
    # bespoke-int8 vs gather (ops/paged_attn.py selection flag)
    for label, env, kv_quant in (
        ("paged_stock_bf16", "1", False),
        ("paged_bespoke_bf16", "bespoke", False),
        ("paged_bespoke_int8", "1", True),
        ("paged_gather_int8", "0", True),
    ):
        os.environ["AWQ_TPU_PAGED_ATTN"] = env
        try:
            r = engine_tok_s(lambda: PagedBatchingEngine(
                tiny, tparams, max_batch=8, page_size=32, total_pages=128,
                pages_per_seq=8, kv_quant=kv_quant))
            RESULTS[f"engine_{label}_bs8"] = round(r, 1)
            print(f"{label} bs8: {r:.1f} tok/s", flush=True)
        finally:
            os.environ.pop("AWQ_TPU_PAGED_ATTN", None)
    _flush()
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
