"""Continuous batching engine (serve/batching.py): slot isolation — every
request's greedy output must match the same request generated alone."""

import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.serve.batching import BatchingEngine

CFG = ModelConfig(
    model_type="llama", vocab_size=64, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, max_position_embeddings=64,
)


def solo(params, prompt, n):
    out = gen.generate(CFG, params, jnp.asarray(prompt[None]), n,
                       method="jnp", dtype=jnp.float32,
                       max_seq_len=48)
    return list(np.asarray(out)[0][len(prompt):])


def test_batched_matches_solo(rng):
    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = BatchingEngine(CFG, params, max_batch=3, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    prompts = {f"r{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 9, 3, 7])}
    budgets = {"r0": 6, "r1": 4, "r2": 8, "r3": 5}

    # staggered arrival: two up front, two mid-flight (continuous admission)
    eng.add_request("r0", prompts["r0"], budgets["r0"])
    eng.add_request("r1", prompts["r1"], budgets["r1"])
    eng.step()
    eng.add_request("r2", prompts["r2"], budgets["r2"])
    eng.step()
    eng.add_request("r3", prompts["r3"], budgets["r3"])
    results = eng.run()

    assert set(results) == set(prompts)
    for rid, toks in results.items():
        assert toks == solo(params, prompts[rid], budgets[rid]), rid


def test_eos_and_capacity(rng):
    params = init_random_params(CFG, seed=6, scale=0.08)
    # 5 requests through a 2-slot pool: forces queueing + slot reuse
    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    prompts = [rng.integers(0, 64, (4 + i,)) for i in range(5)]
    for i, p in enumerate(prompts):
        eng.add_request(i, p, 5)
    results = eng.run()
    assert set(results) == set(range(5))
    for i, p in enumerate(prompts):
        assert results[i] == solo(params, p, 5), i

    # eos retirement: pick the first token solo generation emits as "eos"
    first = solo(params, prompts[0], 1)[0]
    eng2 = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                          eos_token_id=first, method="jnp",
                          dtype=jnp.float32)
    eng2.add_request("x", prompts[0], 50)
    res = eng2.run()
    assert res["x"][-1] == first and len(res["x"]) == 1

    with pytest.raises(ValueError):
        eng2.add_request("too-long", np.zeros(64, np.int32), 4)


def test_chunked_prefill_matches_whole(rng):
    """prefill_chunk_size bounds admission work without changing results:
    chunked and whole-prompt engines produce identical outputs, including a
    prompt that is not a multiple of the chunk (padded tail rows are dead)."""
    params = init_random_params(CFG, seed=7, scale=0.08)
    prompts = {f"r{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([11, 4, 7])}

    def run(chunk):
        eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                             method="jnp", dtype=jnp.float32,
                             prefill_chunk_size=chunk)
        for rid, p in prompts.items():
            eng.add_request(rid, p, 5)
        return eng.run()

    whole, chunked = run(None), run(4)
    assert whole == chunked
    for rid, p in prompts.items():
        assert chunked[rid] == solo(params, p, 5), rid


def test_chunk_must_divide_capacity():
    """Guards the dynamic_update_slice clamp: a final padded chunk starting
    at lo with lo + chunk > capacity would silently overwrite earlier KV."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    with pytest.raises(ValueError, match="multiple"):
        BatchingEngine(CFG, params, max_batch=2, max_seq_len=50,
                       method="jnp", dtype=jnp.float32,
                       prefill_chunk_size=4)


def test_alibi_batched_matches_solo(rng):
    """ALiBi bias in batched decode must be per-slot [B, H, 1, T] — the
    naive alibi_bias(pos[B], ki[T]) broadcasts a bogus extra batch dim."""
    acfg = ModelConfig(
        model_type="bloom", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=64,
        pos_embed="alibi")
    params = init_random_params(acfg, seed=11, scale=0.08)

    def asolo(prompt, n):
        out = gen.generate(acfg, params, jnp.asarray(prompt[None]), n,
                           method="jnp", dtype=jnp.float32, max_seq_len=48)
        return list(np.asarray(out)[0][len(prompt):])

    eng = BatchingEngine(acfg, params, max_batch=3, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    prompts = {f"r{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 9, 3])}
    for rid, p in prompts.items():
        eng.add_request(rid, p, 6)
    results = eng.run()
    for rid, p in prompts.items():
        assert results[rid] == asolo(p, 6), rid


def test_sample_batched_top_k1_and_tiny_top_p_are_greedy(rng):
    import jax

    from autoawq_tpu.serve.batching import sample_batched

    logits = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    greedy = np.asarray(jnp.argmax(logits, -1))
    for seed in range(3):
        k = jax.random.PRNGKey(seed)
        tk = np.asarray(sample_batched(
            logits, jnp.full((4,), 1.3, jnp.float32),
            jnp.full((4,), 1, jnp.int32), jnp.ones((4,), jnp.float32), k))
        tp = np.asarray(sample_batched(
            logits, jnp.full((4,), 1.3, jnp.float32),
            jnp.full((4,), 64, jnp.int32),
            jnp.full((4,), 1e-6, jnp.float32), k))
        assert (tk == greedy).all() and (tp == greedy).all()


def test_sample_batched_respects_top_k_support(rng):
    import jax

    from autoawq_tpu.serve.batching import sample_batched

    logits = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    top3 = np.argsort(-np.asarray(logits), -1)[:, :3]
    seen = [set(), set()]
    for seed in range(50):
        t = np.asarray(sample_batched(
            logits, jnp.ones((2,), jnp.float32),
            jnp.full((2,), 3, jnp.int32), jnp.ones((2,), jnp.float32),
            jax.random.PRNGKey(seed)))
        for b in range(2):
            assert t[b] in top3[b]
            seen[b].add(int(t[b]))
    # with temp 1 over 50 draws the support is actually explored
    assert all(len(s) > 1 for s in seen)


def test_mixed_pool_sampling_isolation(rng):
    """A sampling request must not perturb a greedy neighbour: the greedy
    request's tokens still bit-match its solo run."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32, seed=11)
    pg = rng.integers(0, 64, (5,))
    ps = rng.integers(0, 64, (4,))
    eng.add_request("greedy", pg, 6)
    eng.add_request("samp", ps, 6, temperature=1.0, top_k=8, top_p=0.9)
    results = eng.run()
    assert results["greedy"] == solo(params, pg, 6)
    assert len(results["samp"]) == 6
    assert all(0 <= t < 64 for t in results["samp"])


def test_sampling_deterministic_per_seed(rng):
    params = init_random_params(CFG, seed=5, scale=0.08)
    prompt = rng.integers(0, 64, (5,))

    def run(seed):
        eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                             method="jnp", dtype=jnp.float32, seed=seed)
        eng.add_request("s", prompt, 8, temperature=0.9, top_p=0.95)
        return eng.run()["s"]

    assert run(3) == run(3)
    outs = {tuple(run(s)) for s in (3, 4, 5, 6)}
    assert len(outs) > 1  # different seeds explore different tokens


def test_mla_batched_matches_solo(rng):
    """DeepSeek-style MLA (latent cache) in the continuous-batching
    engine: per-request streams match solo generation (absorbed
    latent-cache decode with per-slot write offsets)."""
    mla_cfg = ModelConfig(
        model_type="deepseek_v2", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=64,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16)
    params = init_random_params(mla_cfg, seed=7, scale=0.08)

    def solo_mla(prompt, n):
        out = gen.generate(mla_cfg, params, jnp.asarray(prompt[None]), n,
                           method="jnp", dtype=jnp.float32, max_seq_len=48)
        return list(np.asarray(out)[0][len(prompt):])

    eng = BatchingEngine(mla_cfg, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    prompts = {f"m{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 8, 4])}
    budgets = {"m0": 6, "m1": 5, "m2": 7}
    eng.add_request("m0", prompts["m0"], budgets["m0"])
    eng.add_request("m1", prompts["m1"], budgets["m1"])
    eng.step()
    eng.add_request("m2", prompts["m2"], budgets["m2"])
    results = eng.run()
    for rid, toks in results.items():
        assert toks == solo_mla(prompts[rid], budgets[rid]), rid


def test_cancel_in_every_state(rng):
    """cancel() aborts queued, prefilling, and active requests; survivors
    are unaffected (streams still match solo)."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = BatchingEngine(CFG, params, max_batch=3, max_seq_len=48,
                         method="jnp", dtype=jnp.float32,
                         prefill_chunk_size=4)
    keep_prompt = rng.integers(0, 64, (5,))
    eng.add_request("keep", keep_prompt, 6)
    eng.add_request("kill_active", rng.integers(0, 64, (4,)), 20)
    eng.step(); eng.step()  # both prefill (chunked) and start
    eng.add_request("kill_queued", rng.integers(0, 64, (4,)), 6)
    assert eng.cancel("kill_queued")
    eng.add_request("kill_prefilling", rng.integers(0, 64, (8,)), 6)
    eng.step()  # admitted into inflight (chunk=4 < prompt len 8)
    assert any(st["req"].id == "kill_prefilling"
               for st in eng.inflight.values())
    assert eng.cancel("kill_prefilling")
    assert eng.cancel("kill_active")
    assert not eng.cancel("nonexistent")
    results = eng.run()
    assert set(results) == {"keep"}
    assert results["keep"] == solo(params, keep_prompt, 6)
    assert eng.stats()["slots_busy"] == 0


def test_return_logprobs(rng):
    """return_logprobs=True records log p(token|prefix) for every output
    token (greedy: the max log-softmax of the step's logits)."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    prompt = rng.integers(0, 64, (5,))
    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32,
                         return_logprobs=True)
    eng.add_request("r", prompt, 6)
    eng.run()
    req = eng.finished[0]
    assert len(req.logprobs) == len(req.output) == 6
    assert all(lp <= 0.0 for lp in req.logprobs)

    # oracle for the first token: log-softmax of the prefill logits
    caches = gen.init_kv_cache(CFG, 1, 48, jnp.float32)
    logits, _ = gen.prefill(CFG, params, jnp.asarray(prompt[None]), caches,
                            "jnp", jnp.float32)
    import jax

    lp = np.asarray(jax.nn.log_softmax(np.asarray(logits[0],
                                                  dtype=np.float32)))
    assert abs(req.logprobs[0] - lp[req.output[0]]) < 1e-4


def test_repetition_penalty_matches_solo(rng):
    """Per-request repetition penalty (HF processor semantics: penalize
    every token already in prompt+output, before the warpers) must match
    the solo generate path token-for-token, and must not perturb
    penalty-free neighbors in the same pool."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    p1 = rng.integers(0, 64, (6,))
    p2 = rng.integers(0, 64, (4,))
    ref_pen = np.asarray(gen.generate(
        CFG, params, jnp.asarray(p1[None]), 8, repetition_penalty=1.8,
        method="jnp", dtype=jnp.float32))[0, len(p1):]
    ref_plain = np.asarray(gen.generate(
        CFG, params, jnp.asarray(p2[None]), 8, method="jnp",
        dtype=jnp.float32))[0, len(p2):]

    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    eng.add_request("pen", p1, 8, repetition_penalty=1.8)
    eng.add_request("plain", p2, 8)
    got = eng.run()
    assert got["pen"] == list(ref_pen)
    assert got["plain"] == list(ref_plain)
    assert got["pen"] != list(np.asarray(gen.generate(
        CFG, params, jnp.asarray(p1[None]), 8, method="jnp",
        dtype=jnp.float32))[0, len(p1):]), "penalty had no effect"


def test_top_logprobs(rng):
    """top_logprobs=N records the N most likely alternatives per position
    (unwarped distribution); the greedy token is always the top-1."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32, top_logprobs=3)
    eng.add_request("r", rng.integers(0, 64, (5,)), 6)
    eng.run()
    req = eng.finished[0]
    assert len(req.top_logprobs) == len(req.output) == 6
    for tok, lp, top in zip(req.output, req.logprobs, req.top_logprobs):
        assert len(top) == 3
        assert all(np.isfinite(v) and v <= 0.0 for v in top.values())
        # greedy: the emitted token IS the argmax -> top-1 alternative
        assert tok in top and abs(top[tok] - lp) < 1e-5
        assert top[tok] == max(top.values())


def test_moe_batched_matches_solo(rng):
    """Mixtral-style MoE models serve from the slot pool: per-request
    streams match solo generation (router + experts under vector-pos
    decode)."""
    moe_cfg = ModelConfig(
        model_type="mixtral", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, num_experts=4,
        num_experts_per_tok=2, max_position_embeddings=64)
    params = init_random_params(moe_cfg, seed=11, scale=0.08)

    def solo(prompt, n):
        out = gen.generate(moe_cfg, params, jnp.asarray(prompt[None]), n,
                           method="jnp", dtype=jnp.float32, max_seq_len=48)
        return list(np.asarray(out)[0][len(prompt):])

    eng = BatchingEngine(moe_cfg, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    prompts = {f"e{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 8, 4])}
    for rid, p in prompts.items():
        eng.add_request(rid, p, 6)
    got = eng.run()
    for rid, p in prompts.items():
        assert got[rid] == solo(p, 6), rid


def test_stop_sequences(rng):
    """Per-request stop sequences: a matched multi-token stop retires the
    request and trims the match (OpenAI semantics) in the slot engine,
    the paged engine, and mid-chunk under speculation."""
    from autoawq_tpu.serve.paged import PagedBatchingEngine
    from autoawq_tpu.serve.spec_batch import SpeculativeBatchingEngine

    params = init_random_params(CFG, seed=5, scale=0.08)
    prompt = rng.integers(0, 64, (5,))
    base = BatchingEngine(CFG, params, max_batch=1, max_seq_len=48,
                          method="jnp", dtype=jnp.float32)
    base.add_request("r", prompt, 10)
    full = base.run()["r"]
    assert len(full) == 10
    stop = [full[4:6]]  # stop on tokens 5-6 of the greedy stream
    want = full[:4]

    eng = BatchingEngine(CFG, params, max_batch=1, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    eng.add_request("r", prompt, 10, stop=stop)
    assert eng.run()["r"] == want

    peng = PagedBatchingEngine(CFG, params, max_batch=1, page_size=8,
                               total_pages=16, pages_per_seq=4,
                               method="jnp", dtype=jnp.float32)
    peng.add_request("r", prompt, 10, stop=stop)
    assert peng.run()["r"] == want

    seng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=1, max_seq_len=48,
        method="jnp", dtype=jnp.float32)
    seng.add_request("r", prompt, 10, stop=stop)
    assert seng.run()["r"] == want


def test_stop_boundary_and_longest_match(rng):
    """A stop match completing exactly at max_new_tokens must still trim
    (the budget check used to short-circuit first), step() must not emit
    trimmed pairs, and when one stop suffixes another the LONGEST match
    trims."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    prompt = rng.integers(0, 64, (5,))
    base = BatchingEngine(CFG, params, max_batch=1, max_seq_len=48,
                          method="jnp", dtype=jnp.float32)
    base.add_request("r", prompt, 6)
    full = base.run()["r"]

    # stop = last two tokens of a 6-token budget -> match AT the boundary
    eng = BatchingEngine(CFG, params, max_batch=1, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    eng.add_request("r", prompt, 6, stop=[full[4:6]])
    emitted = []
    while eng.has_work:
        emitted.extend(t for _, t in eng.step())
    got = eng.finished[0].output
    assert got == full[:4]
    # step() never emits the FINAL match token (earlier stop tokens were
    # emitted before the match was knowable — the HTTP layer compensates
    # via final_len; first token comes from admission)
    assert emitted == full[1:5]

    # longest-suffix: [B] alone would leak A; [A, B] must win
    eng2 = BatchingEngine(CFG, params, max_batch=1, max_seq_len=48,
                          method="jnp", dtype=jnp.float32)
    eng2.add_request("r", prompt, 6,
                     stop=[[full[5]], [full[4], full[5]]])
    assert eng2.run()["r"] == full[:4]


def _burst_vs_step(rng, **req_kw):
    params = init_random_params(CFG, seed=15, scale=0.08)
    prompts = {f"r{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 9, 3])}
    budgets = {"r0": 9, "r1": 6, "r2": 12}

    def drive(burst):
        eng = BatchingEngine(CFG, params, max_batch=3, max_seq_len=48,
                             method="jnp", dtype=jnp.float32,
                             return_logprobs=True, seed=3)
        for rid, p in prompts.items():
            eng.add_request(rid, p, budgets[rid], **req_kw)
        out = eng.run(burst=burst)
        lps = {r.id: list(r.logprobs) for r in eng.finished}
        return out, lps

    return drive(1), drive(4)


def test_burst_matches_single_step_greedy(rng):
    """run(burst=4) — n pool steps in one dispatch — must reproduce the
    single-step streams AND logprobs exactly, including mid-burst
    budget retirements."""
    (o1, l1), (o4, l4) = _burst_vs_step(rng)
    assert o1 == o4
    for rid in l1:
        np.testing.assert_allclose(l1[rid], l4[rid], rtol=1e-6, atol=1e-6)


def test_burst_matches_single_step_sampled_penalized(rng):
    """Sampled + repetition-penalty bursts share the single-step key
    schedule and presence updates — streams bit-match."""
    (o1, l1), (o4, l4) = _burst_vs_step(
        rng, temperature=0.8, top_k=12, repetition_penalty=1.3)
    assert o1 == o4


def test_burst_eos_and_stop_mid_burst(rng):
    """EOS and stop-sequence retirements landing inside a burst trim and
    retire exactly like single steps."""
    params = init_random_params(CFG, seed=15, scale=0.08)
    prompt = rng.integers(0, 64, (5,))
    ref = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    ref.add_request("a", prompt, 12)
    want = ref.run()["a"]
    eos, stop_tok = want[2], want[4]

    def drive(burst):
        eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                             method="jnp", dtype=jnp.float32,
                             eos_token_id=eos)
        eng.add_request("a", prompt, 12)
        eng.add_request("b", prompt, 12, stop=[[stop_tok]])
        return eng.run(burst=5)

    got = drive(5)
    assert got == drive(1)
    assert got["a"] == want[: want.index(eos) + 1]
    assert stop_tok not in got["b"]


def test_burst_top_logprobs_matches_single_step(rng):
    """top_logprobs no longer forces single-step: the burst scan computes
    the top-N alternatives in place; streams, logprobs AND the top-N
    dicts must match the single-step run exactly."""
    params = init_random_params(CFG, seed=15, scale=0.08)
    prompts = {f"r{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 9, 3])}
    budgets = {"r0": 9, "r1": 6, "r2": 12}

    def drive(burst):
        eng = BatchingEngine(CFG, params, max_batch=3, max_seq_len=48,
                             method="jnp", dtype=jnp.float32,
                             top_logprobs=3, seed=3)
        for rid, p in prompts.items():
            eng.add_request(rid, p, budgets[rid])
        out = eng.run(burst=burst)
        fin = {r.id: r for r in eng.finished}
        return out, fin

    o1, f1 = drive(1)
    o4, f4 = drive(4)
    assert o1 == o4
    for rid in f1:
        r1, r4 = f1[rid], f4[rid]
        np.testing.assert_allclose(r1.logprobs, r4.logprobs,
                                   rtol=1e-5, atol=1e-5)
        assert len(r4.top_logprobs) == len(r4.output)
        for d1, d4 in zip(r1.top_logprobs, r4.top_logprobs):
            assert set(d1) == set(d4)
            np.testing.assert_allclose(
                [d1[t] for t in sorted(d1)], [d4[t] for t in sorted(d4)],
                rtol=1e-5, atol=1e-5)
