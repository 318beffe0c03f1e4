"""Round-4b on-chip A/B: the legs r3 crashed on + new r4 kernels.

 1. int4 lm_head decode (quantize_lm_head capability): tinyllama bs1 —
    the bf16 lm_head matvec is ~20% of the per-token weight stream on a
    1.1B model; measure the win from streaming it int4.
 2. int8-cache megakernel at long context (new in r4): mistral bs1
    ctx2048 kv_quant, AWQ_TPU_FUSED_ATTN auto (B*T 2048+) vs 0.
 3. slot vs paged engine at bs8 (r3 crashed before these legs) with the
    bespoke paged kernel now default.

Run EXCLUSIVELY (no other TPU process):
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/chip_ab_r4b.py
"""

import json
import os
import time

import numpy as np

RESULTS = {}


def _flush():
    with open("/tmp/chip_ab_r4b.json", "w") as f:
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
    from autoawq_tpu.serve import generate as gen
    from autoawq_tpu.utils.synth import random_quantized_params

    print("backend:", jax.default_backend(), flush=True)

    tiny = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=2048,
        intermediate_size=5632, num_hidden_layers=22,
        num_attention_heads=32, num_key_value_heads=4, head_dim=64,
        max_position_embeddings=2048)

    def clear():
        gen.prefill.clear_cache()
        gen.decode_step.clear_cache()
        gen.generate_compiled.clear_cache()

    # 1. int4 lm_head: same body, lm_head streamed int4 instead of bf16
    tparams = random_quantized_params(tiny, seed=0, fp_dtype=jnp.bfloat16,
                                      fused=True)
    r = decode_tok_s(tiny, jax.device_put(tparams), b=1, ctx=64, n_gen=512)
    RESULTS["tiny_bs1_lmhead_bf16"] = round(r, 1)
    print(f"tiny bs1 lm_head bf16: {r:.1f} tok/s", flush=True)
    _flush()

    # repack the fp lm_head as a quant LIN (random ints — bandwidth only)
    rng = np.random.default_rng(7)
    from autoawq_tpu.core.packing import padded_out_features
    n_pad = padded_out_features(tiny.vocab_size)
    h = tiny.hidden_size
    tparams["lm_head"] = {
        "qweight": rng.integers(-(2**31), 2**31, (h // 2, n_pad // 4),
                                dtype=np.int64).astype(np.int32),
        "scales": ((rng.random((h // 128, n_pad), dtype=np.float32) + 0.5)
                   * 0.01),
        "qzeros": rng.integers(-(2**31), 2**31,
                               (h // 256, n_pad // 4),
                               dtype=np.int64).astype(np.int32),
    }
    clear()
    r = decode_tok_s(tiny, jax.device_put(tparams), b=1, ctx=64, n_gen=512)
    RESULTS["tiny_bs1_lmhead_int4"] = round(r, 1)
    print(f"tiny bs1 lm_head int4: {r:.1f} tok/s", flush=True)
    _flush()
    del tparams

    # 2. int8-cache megakernel at ctx2048 (auto engages at B*T >= 2048)
    mistral = ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        max_position_embeddings=8192)
    mparams = jax.device_put(random_quantized_params(
        mistral, seed=0, fp_dtype=jnp.bfloat16, fused=True))
    for flag in ("auto", "0"):
        os.environ["AWQ_TPU_FUSED_ATTN"] = flag
        try:
            clear()
            r = decode_tok_s(mistral, mparams, b=1, ctx=2048, n_gen=256,
                             kv_quant=True)
            RESULTS[f"mistral_bs1_ctx2048_int8_fattn_{flag}"] = round(r, 1)
            print(f"mistral bs1 ctx2048 int8 fattn={flag}: {r:.1f} tok/s",
                  flush=True)
        finally:
            os.environ.pop("AWQ_TPU_FUSED_ATTN", None)
        _flush()
    del mparams

    # 3. slot vs paged engine, tinyllama bs8 (bespoke kernel default now)
    from autoawq_tpu.serve.batching import BatchingEngine
    from autoawq_tpu.serve.paged import PagedBatchingEngine

    tparams = jax.device_put(random_quantized_params(
        tiny, seed=0, fp_dtype=jnp.bfloat16, fused=True))

    def engine_tok_s(make):
        rng = np.random.default_rng(0)
        eng = make()
        for i in range(8):
            eng.add_request(i, rng.integers(0, 32000, (64,)), 128)
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

    for label, make in (
        ("engine_slot_bs8", lambda: BatchingEngine(
            tiny, tparams, max_batch=8, max_seq_len=256)),
        ("engine_paged_bespoke_bs8", lambda: PagedBatchingEngine(
            tiny, tparams, max_batch=8, page_size=32, total_pages=128,
            pages_per_seq=8)),
        ("engine_paged_int8_bs8", lambda: PagedBatchingEngine(
            tiny, tparams, max_batch=8, page_size=32, total_pages=128,
            pages_per_seq=8, kv_quant=True)),
        ("engine_slot_int8_bs8", lambda: BatchingEngine(
            tiny, tparams, max_batch=8, max_seq_len=256, kv_quant=True)),
    ):
        try:
            r = engine_tok_s(make)
            RESULTS[label] = round(r, 1)
            print(f"{label}: {r:.1f} tok/s", flush=True)
        except Exception as e:  # record, keep going
            RESULTS[label] = f"ERROR: {type(e).__name__}: {e}"[:200]
            print(f"{label} FAILED: {e}", flush=True)
        _flush()
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
