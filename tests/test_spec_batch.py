"""Speculative continuous batching (serve/spec_batch.py): pool-wide
draft/verify must emit exactly the plain engine's greedy streams (which
bit-match solo generation), at any draft quality."""

import jax.numpy as jnp
import numpy as np

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve.batching import BatchingEngine
from autoawq_tpu.serve.spec_batch import SpeculativeBatchingEngine

CFG = ModelConfig(
    model_type="llama", vocab_size=64, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, max_position_embeddings=128)
DRAFT = ModelConfig(
    model_type="llama", vocab_size=64, hidden_size=32,
    intermediate_size=64, num_hidden_layers=1, num_attention_heads=2,
    num_key_value_heads=1, head_dim=16, max_position_embeddings=128)


def _plain(params, work, max_seq=96):
    eng = BatchingEngine(CFG, params, max_batch=3, max_seq_len=max_seq,
                         method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    return eng.run()


def _work(rng):
    return [(f"r{i}", rng.integers(0, 64, (l,)), n)
            for i, (l, n) in enumerate([(5, 9), (9, 7), (3, 12), (7, 6)])]


def test_spec_pool_matches_plain_engine(rng):
    params = init_random_params(CFG, seed=5, scale=0.08)
    dparams = init_random_params(DRAFT, seed=9, scale=0.08)
    work = _work(rng)
    ref = _plain(params, work)
    eng = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    got = eng.run()
    assert got == ref
    assert eng.proposed > 0


def test_spec_pool_self_draft_accepts_everything(rng):
    params = init_random_params(CFG, seed=5, scale=0.08)
    work = _work(rng)
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    got = eng.run()
    assert got == _plain(params, work)
    assert eng.accept_rate == 1.0


def test_spec_pool_capacity_fallback(rng):
    """Near max_seq the engine falls back to single-token pool decode and
    still finishes with correct streams."""
    params = init_random_params(CFG, seed=6, scale=0.08)
    dparams = init_random_params(DRAFT, seed=9, scale=0.08)
    work = [("a", rng.integers(0, 64, (5,)), 12)]
    ref = _plain(params, work, max_seq=24)
    eng = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=4, max_batch=3, max_seq_len=24,
        method="jnp", dtype=jnp.float32)
    eng.add_request(*work[0])
    assert eng.run() == ref


def test_spec_pool_mixed_sampling_keeps_greedy_exact(rng):
    """A sampled request in the pool must not perturb greedy neighbors:
    the greedy slot's stream still bit-matches the plain engine, and the
    sampled slot completes with its full budget."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    greedy_work = [("g", rng.integers(0, 64, (6,)), 10)]
    ref = _plain(params, greedy_work)
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=2, max_seq_len=64,
        method="jnp", dtype=jnp.float32)
    eng.add_request(*greedy_work[0])
    eng.add_request("s", rng.integers(0, 64, (4,)), 10, temperature=0.9,
                    top_k=16)
    got = eng.run()
    assert got["g"] == ref["g"]
    assert len(got["s"]) == 10


def test_spec_pool_sampled_self_draft_accepts_everything(rng):
    """Self-draft with temperature-only warping: p == q up to ULP, so the
    sampled acceptance rate is ~1 (the pool analogue of the solo test in
    test_speculative.py); per-seed determinism must hold."""
    params = init_random_params(CFG, seed=4, scale=0.08)
    rng_prompt = rng.integers(0, 64, (5,))

    def run(seed):
        eng = SpeculativeBatchingEngine(
            CFG, params, CFG, params, k=3, max_batch=2, max_seq_len=64,
            method="jnp", dtype=jnp.float32, seed=seed)
        eng.add_request("a", rng_prompt, 12, temperature=0.8)
        out = eng.run()
        return out["a"], eng.accept_rate

    out1, rate = run(3)
    out2, _ = run(3)
    out3, _ = run(8)
    assert rate == 1.0
    assert out1 == out2
    assert out1 != out3  # different seeds explore different streams


def test_pool_accept_marginal_matches_target():
    """Speculative-sampling theorem, pool form: for ANY draft q, the first
    emitted token is distributed exactly as the warped target p. One
    pool_accept call over B=8192 identical rows = 8192 trials."""
    import jax

    from autoawq_tpu.serve.spec_batch import pool_accept

    nprng = np.random.default_rng(7)
    v, b, k = 8, 8192, 1
    p = nprng.random((v,)); p /= p.sum()
    q = nprng.random((v,)) ** 2; q /= q.sum()
    tlog = jnp.asarray(np.broadcast_to(np.log(p), (b, k + 1, v)))
    dlog = jnp.asarray(np.broadcast_to(np.log(q), (b, k, v)))
    temp = jnp.ones((b,), jnp.float32)        # identity warp
    topk = jnp.full((b,), v, jnp.int32)
    topp = jnp.ones((b,), jnp.float32)
    counts = np.zeros(v)
    for s in range(3):
        drafts = nprng.choice(v, size=(b, k), p=q)  # fresh proposals ~ q
        a, nxt = pool_accept(tlog, dlog, jnp.asarray(drafts), temp, topk,
                             topp, jax.random.PRNGKey(s))
        a, nxt = np.asarray(a), np.asarray(nxt)
        first = np.where(a >= 1, drafts[:, 0], nxt)
        counts += np.bincount(first, minlength=v)
    emp = counts / counts.sum()
    # 24576 trials: per-bin std <= sqrt(p(1-p)/n) ~ 0.003; 4 sigma rail
    assert np.abs(emp - p).max() < 0.013, (emp, p)


def test_fallback_rounds_keep_draft_cache_aligned(rng):
    """Regression: single-token fallback rounds (near cache capacity) must
    mirror the consumed token into the draft cache; otherwise the draft
    stream desyncs and self-draft acceptance collapses once speculative
    rounds resume."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    work = [("big", rng.integers(0, 64, (5,)), 20),
            ("small", rng.integers(0, 64, (4,)), 30)]
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=2, max_seq_len=36,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    got = eng.run()
    assert got == _plain(params, work, max_seq=36)
    # self-draft: every speculative proposal (incl. post-fallback rounds)
    # must have been accepted
    assert eng.proposed > 0 and eng.accept_rate == 1.0


def test_spec_pool_int8_kv_matches_plain_int8(rng):
    """Speculative pool over an int8 target cache: greedy streams equal
    the plain int8 engine's (quantization changes numerics identically
    on both paths — prefill and chunk-verify share the cache writes)."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    work = _work(rng)
    ref_eng = BatchingEngine(CFG, params, max_batch=3, max_seq_len=96,
                             method="jnp", dtype=jnp.float32, kv_quant=True)
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32, kv_quant=True)
    for rid, prompt, n in work:
        ref_eng.add_request(rid, prompt, n)
        eng.add_request(rid, prompt, n)
    ref, got = ref_eng.run(), eng.run()
    assert got == ref
    assert eng.caches[0]["k"].dtype == jnp.int8


def test_spec_pool_chunked_prefill_matches_plain(rng):
    """Chunked target admission under speculation: long prompts prefill
    in chunks interleaved with speculative pool rounds; streams still
    bit-match the plain engine."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    dparams = init_random_params(DRAFT, seed=9, scale=0.08)
    work = [("long", rng.integers(0, 64, (37,)), 8),
            ("short", rng.integers(0, 64, (4,)), 10)]
    ref = _plain(params, work)
    eng = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32, prefill_chunk_size=16)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    assert eng.run() == ref
    assert eng.proposed > 0


def test_spec_pool_mla_matches_plain(rng):
    """DeepSeek-style MLA under pool speculation: the chunk-verify pass
    runs the absorbed latent path at s=k+1 with vector positions; greedy
    streams bit-match the plain MLA engine."""
    mla_cfg = ModelConfig(
        model_type="deepseek_v2", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=96,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16)
    params = init_random_params(mla_cfg, seed=7, scale=0.08)
    work = [("a", rng.integers(0, 64, (5,)), 8),
            ("b", rng.integers(0, 64, (8,)), 6)]
    ref_eng = BatchingEngine(mla_cfg, params, max_batch=2, max_seq_len=96,
                             method="jnp", dtype=jnp.float32)
    eng = SpeculativeBatchingEngine(
        mla_cfg, params, mla_cfg, params, k=3, max_batch=2, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        ref_eng.add_request(rid, prompt, n)
        eng.add_request(rid, prompt, n)
    assert eng.run() == ref_eng.run()
    assert eng.accept_rate == 1.0  # self-draft


def test_admission_during_fallback_keeps_draft_aligned(rng):
    """Regression: the near-capacity fallback's draft mirror must use
    post-step state. A CHUNKED admission whose final chunk completes
    inside the fallback's inner base step (the second _advance_prefill
    of that engine step) used to get a garbage row written into its
    freshly-installed draft prefix from the stale pre-step snapshot,
    silently collapsing that slot's acceptance."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=2, max_seq_len=36,
        method="jnp", dtype=jnp.float32, prefill_chunk_size=12)
    a_prompt = rng.integers(0, 64, (20,))
    b_prompt = rng.integers(0, 64, (20,))  # 2 chunks of 12
    eng.add_request("a", a_prompt, 14)
    while eng.has_work and int(eng.pos.max()) + 3 + 2 < 36:
        eng.step()
    assert eng.has_work  # "a" alive and inside fallback territory
    # b's chunk 1 runs in the spec step's own advance; chunk 2 completes
    # inside the fallback's super().step() -> activation mid-fallback
    eng.add_request("b", b_prompt, 12)
    got = eng.run()
    ref = _plain(params, [("a", a_prompt, 14), ("b", b_prompt, 12)],
                 max_seq=36)
    assert got == ref
    assert eng.proposed > 0 and eng.accept_rate == 1.0  # self-draft


def test_spec_pool_repetition_penalty_matches_plain(rng):
    """Greedy speculative streams under repetition_penalty bit-match the
    plain engine: the verify chunk penalizes position i with prompt+output
    presence PLUS drafts[:, :i], exactly the token-at-a-time semantics."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    dparams = init_random_params(DRAFT, seed=9, scale=0.08)
    work = [(f"r{i}", rng.integers(0, 64, (l,)), n, p)
            for i, (l, n, p) in enumerate(
                [(5, 12, 1.8), (7, 10, 1.0), (4, 12, 1.3)])]
    eng = BatchingEngine(CFG, params, max_batch=3, max_seq_len=96,
                         method="jnp", dtype=jnp.float32)
    for rid, prompt, n, p in work:
        eng.add_request(rid, prompt, n, repetition_penalty=p)
    ref = eng.run()
    spec = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n, p in work:
        spec.add_request(rid, prompt, n, repetition_penalty=p)
    got = spec.run()
    assert got == ref
    # with a small vocab and strong penalty the streams genuinely diverge
    # from the penalty-free run (the test bites)
    free = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n, _ in work:
        free.add_request(rid, prompt, n)
    assert free.run()["r0"] != got["r0"]


def test_spec_pool_penalty_self_draft_accepts_everything(rng):
    """Self-draft + penalty: proposal and verify see identical penalized
    distributions, so greedy acceptance stays 1.0 (catches a drift between
    the draft-loop presence and the chunk-cumulative presence)."""
    params = init_random_params(CFG, seed=4, scale=0.08)
    eng = SpeculativeBatchingEngine(
        CFG, params, CFG, params, k=3, max_batch=2, max_seq_len=64,
        method="jnp", dtype=jnp.float32)
    eng.add_request("a", rng.integers(0, 64, (5,)), 12,
                    repetition_penalty=1.5)
    out = eng.run()
    assert len(out["a"]) == 12
    assert eng.accept_rate == 1.0


def test_spec_pool_sampled_penalty_runs(rng):
    """Sampled + penalized speculative pool: emits the full budget and is
    per-seed deterministic (q is the penalized+warped proposal dist)."""
    params = init_random_params(CFG, seed=4, scale=0.08)

    def run(seed):
        eng = SpeculativeBatchingEngine(
            CFG, params, CFG, params, k=3, max_batch=2, max_seq_len=64,
            method="jnp", dtype=jnp.float32, seed=seed)
        eng.add_request("a", rng.integers(0, 64, (5,)), 12,
                        temperature=0.8, repetition_penalty=1.4)
        return eng.run()["a"]

    rng = np.random.default_rng(11)
    out1 = run(3)
    rng = np.random.default_rng(11)
    out2 = run(3)
    assert out1 == out2 and len(out1) == 12


def test_spec_pool_mla_target_matches_plain(rng):
    """MLA targets (latent cache) speculate too: pool streams must equal
    the plain engine's greedy streams."""
    mla = ModelConfig(
        model_type="deepseek_v2", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, q_lora_rank=None, kv_lora_rank=16,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        max_position_embeddings=128)
    from autoawq_tpu.io.hf import init_random_params as irp

    params = irp(mla, seed=21, scale=0.08)
    dparams = irp(DRAFT, seed=22, scale=0.08)
    work = [(f"r{i}", rng.integers(0, 64, (l,)), n)
            for i, (l, n) in enumerate([(5, 8), (9, 6), (3, 10)])]

    plain = BatchingEngine(mla, params, max_batch=3, max_seq_len=96,
                           method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        plain.add_request(rid, prompt, n)
    want = plain.run()

    eng = SpeculativeBatchingEngine(
        mla, params, DRAFT, dparams, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    got = eng.run()
    assert got == want


def test_spec_pool_top_logprobs_matches_plain(rng):
    """top_logprobs on the verify path (the chunk pass holds full-vocab
    target logits for every emitted position): chosen-token logprobs AND
    the top-N alternative dicts must match the plain engine's exactly
    (same model distribution — speculation changes scheduling, not
    numerics)."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    dparams = init_random_params(DRAFT, seed=9, scale=0.08)
    work = _work(rng)

    plain = BatchingEngine(CFG, params, max_batch=3, max_seq_len=96,
                           method="jnp", dtype=jnp.float32, top_logprobs=3)
    for rid, prompt, n in work:
        plain.add_request(rid, prompt, n)
    plain.run()
    want = {r.id: (r.output, r.logprobs, r.top_logprobs)
            for r in plain.finished}

    eng = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=3, max_batch=3, max_seq_len=96,
        method="jnp", dtype=jnp.float32, top_logprobs=3)
    for rid, prompt, n in work:
        eng.add_request(rid, prompt, n)
    eng.run()
    assert eng.proposed > 0
    for req in eng.finished:
        out, lps, tops = want[req.id]
        assert req.output == out
        assert len(req.top_logprobs) == len(req.output)
        np.testing.assert_allclose(req.logprobs, lps, rtol=1e-5, atol=1e-5)
        for got_d, want_d in zip(req.top_logprobs, tops):
            assert set(got_d) == set(want_d)
            np.testing.assert_allclose(
                [got_d[t] for t in sorted(got_d)],
                [want_d[t] for t in sorted(want_d)], rtol=1e-5, atol=1e-5)


def test_spec_pool_embeds_matches_plain(rng):
    """Multimodal prompts speculate: the target prefills from the spliced
    embeds, the draft proposes from the placeholder token ids — draft
    quality only moves acceptance, so the emitted stream must equal the
    plain engine's image-conditioned stream."""
    from autoawq_tpu.nn import modules

    params = init_random_params(CFG, seed=5, scale=0.08)
    dparams = init_random_params(DRAFT, seed=9, scale=0.08)
    prompt = rng.integers(6, 64, (11,))
    prompt[1:5] = 3  # image placeholder run
    emb = np.array(modules.embed(
        CFG, params, jnp.asarray(prompt[None]), jnp.float32,
        jnp.arange(len(prompt))[None]))[0]
    emb[1:5] = rng.standard_normal((4, emb.shape[1])).astype(np.float32) * 0.1

    plain = BatchingEngine(CFG, params, max_batch=2, max_seq_len=96,
                           method="jnp", dtype=jnp.float32)
    plain.add_request("img", prompt, 9, prompt_embeds=emb)
    plain.add_request("txt", prompt, 9)
    ref = plain.run()
    assert ref["img"] != ref["txt"]

    eng = SpeculativeBatchingEngine(
        CFG, params, DRAFT, dparams, k=3, max_batch=2, max_seq_len=96,
        method="jnp", dtype=jnp.float32)
    eng.add_request("img", prompt, 9, prompt_embeds=emb)
    eng.add_request("txt", prompt, 9)
    got = eng.run()
    assert got == ref
    assert eng.proposed > 0
