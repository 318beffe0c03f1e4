"""Paged KV serving (serve/paged.py + nn/modules._paged_decode): per-request
outputs must bit-match solo contiguous-cache generation, pages must be
recycled across requests, and the trash-page discipline must keep inactive
slots from corrupting live ones."""

import jax.numpy as jnp
import numpy as np
import pytest

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve import generate as gen
from autoawq_tpu.serve.paged import PagedBatchingEngine

CFG = ModelConfig(
    model_type="llama", vocab_size=128, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=8,
    num_key_value_heads=2, head_dim=8, max_position_embeddings=128)


def _solo(params, prompt, n):
    out = np.asarray(gen.generate_compiled(
        CFG, params, jnp.asarray(prompt[None]), n, method="auto",
        dtype=jnp.float32))[0]
    return list(out[len(prompt):])


def test_paged_matches_solo(rng):
    params = init_random_params(CFG, seed=3)
    prompts = [rng.integers(0, 128, (n,)) for n in (5, 11, 8)]
    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=32, pages_per_seq=8,
                              dtype=jnp.float32)
    for i, p in enumerate(prompts):
        eng.add_request(i, p, max_new_tokens=6)
    got = eng.run()
    assert set(got) == {0, 1, 2}
    for i, p in enumerate(prompts):
        assert got[i] == _solo(params, p, 6), f"request {i} diverged"


def test_page_recycling(rng):
    """A pool too small to hold all requests at once still serves them all
    once earlier requests retire and free their pages."""
    params = init_random_params(CFG, seed=4)
    # budget per request: 8 + 4 + 1 = 13 tokens -> 2 pages of 8; pool of 5
    # usable pages (1 reserved for trash) fits two requests concurrently
    eng = PagedBatchingEngine(CFG, params, max_batch=4, page_size=8,
                              total_pages=6, pages_per_seq=4,
                              dtype=jnp.float32)
    prompts = [rng.integers(0, 128, (8,)) for _ in range(5)]
    for i, p in enumerate(prompts):
        eng.add_request(i, p, max_new_tokens=4)
    got = eng.run()
    assert set(got) == set(range(5))
    for i, p in enumerate(prompts):
        assert got[i] == _solo(params, p, 4), f"request {i} diverged"
    # every page returned to the free list (5 usable pages, page 0 trash)
    assert sorted(eng.free) == [1, 2, 3, 4, 5]


def test_budget_validation(rng):
    params = init_random_params(CFG, seed=5)
    eng = PagedBatchingEngine(CFG, params, max_batch=1, page_size=8,
                              total_pages=8, pages_per_seq=2,
                              dtype=jnp.float32)
    with pytest.raises(ValueError):
        eng.add_request(0, rng.integers(0, 128, (14,)), max_new_tokens=8)


def test_paged_mixed_sampling_isolation(rng):
    """Per-request sampling in the paged engine: a sampling neighbour must
    not perturb a greedy request's stream (same guarantee as the
    contiguous engine)."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=32, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32, seed=7)
    solo_eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                                   total_pages=32, pages_per_seq=4,
                                   method="jnp", dtype=jnp.float32)
    pg = rng.integers(0, CFG.vocab_size, (5,))
    ps = rng.integers(0, CFG.vocab_size, (4,))
    solo_eng.add_request("greedy", pg, 6)
    solo_out = solo_eng.run()["greedy"]
    eng.add_request("greedy", pg, 6)
    eng.add_request("samp", ps, 6, temperature=1.0, top_k=8)
    results = eng.run()
    assert results["greedy"] == solo_out
    assert len(results["samp"]) == 6


def test_prefix_cache_hit_matches_cold(rng):
    """A repeated prompt reuses cached prompt pages (suffix-only prefill)
    and must produce the exact same greedy stream as a cold admission."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=3, scale=0.08)
    prompt = rng.integers(0, CFG.vocab_size, (17,))  # 2 full pages + 1

    cold = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                               total_pages=32, pages_per_seq=5,
                               method="jnp", dtype=jnp.float32,
                               prefix_cache=False)
    cold.add_request("r", prompt, 6)
    ref = cold.run()["r"]

    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=32, pages_per_seq=5,
                              method="jnp", dtype=jnp.float32)
    eng.add_request("first", prompt, 6)
    assert eng.run()["first"] == ref
    assert eng.prefix_hits == 0  # cold: nothing cached yet
    eng.add_request("second", prompt, 6)
    assert eng.run()["second"] == ref
    assert eng.prefix_hits == 1
    assert eng.prefix_pages_reused == 2  # (17-1)//8 full pages


def test_prefix_cache_shared_while_owner_active(rng):
    """A request sharing cached pages with a STILL-DECODING owner must not
    corrupt either stream (shared pages are read-only: decode writes land
    past the prompt)."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=4, scale=0.08)
    prompt = rng.integers(0, CFG.vocab_size, (16,))

    def solo(p, n):
        e = PagedBatchingEngine(CFG, params, max_batch=1, page_size=8,
                                total_pages=32, pages_per_seq=5,
                                method="jnp", dtype=jnp.float32,
                                prefix_cache=False)
        e.add_request("s", p, n)
        return e.run()["s"]

    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=32, pages_per_seq=5,
                              method="jnp", dtype=jnp.float32)
    eng.add_request("a", prompt, 10)
    eng.step()  # admit a, decode 1 — a still active
    eng.add_request("b", prompt, 4)  # shares a's prompt pages mid-flight
    res = eng.run()
    assert eng.prefix_hits == 1
    assert res["a"] == solo(prompt, 10)
    assert res["b"] == solo(prompt, 4)


def test_prefix_cache_eviction_under_pressure(rng):
    """When the free pool runs dry, unreferenced cached pages are evicted
    and admission proceeds."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=5, scale=0.08)
    # pool sized so cached pages MUST be evicted for the second request
    eng = PagedBatchingEngine(CFG, params, max_batch=1, page_size=8,
                              total_pages=9, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32)
    p1 = rng.integers(0, CFG.vocab_size, (16,))
    p2 = rng.integers(0, CFG.vocab_size, (16,))
    eng.add_request("a", p1, 6)
    out_a = eng.run()["a"]
    assert out_a and eng.prefix_cache  # a's page cached
    eng.add_request("b", p2, 6)  # different prompt: needs eviction
    out_b = eng.run()["b"]
    assert len(out_b) == 6


def test_prefix_cache_eviction_never_frees_matched_pages(rng):
    """Regression: under pool pressure, eviction must not free the pages
    just matched as `shared` for the incoming request — the old code could
    evict the matched page and immediately re-allocate it as fresh, mapping
    two logical prompt pages onto one physical page (silent corruption +
    a poisoned cache entry)."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=6, scale=0.08)
    prompt = rng.integers(0, CFG.vocab_size, (16,))  # 1 sharable page
    other = rng.integers(0, CFG.vocab_size, (16,))

    def solo(p, n):
        e = PagedBatchingEngine(CFG, params, max_batch=1, page_size=8,
                                total_pages=16, pages_per_seq=4,
                                method="jnp", dtype=jnp.float32,
                                prefix_cache=False)
        e.add_request("s", p, n)
        return e.run()["s"]

    # usable pages: 6 (7 minus trash). A(3 pages) retires -> 1 cached,
    # free=5. C(4 pages) stays active -> free=1. B shares A's cached page,
    # needs 2 fresh with only 1 free + the matched page as the only
    # eviction candidate: B must WAIT (not corrupt), then admit after C.
    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=7, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32)
    eng.add_request("a", prompt, 6)
    out_a = eng.run()["a"]
    assert len(eng.prefix_cache) == 1
    eng.add_request("c", other, 9)   # 16+9+1 = 26 -> 4 pages, active
    eng.step()
    eng.add_request("b", prompt, 6)  # same prompt as a: 1 shared page
    res = eng.run()
    assert res["b"] == out_a == solo(prompt, 6)
    assert res["c"] == solo(other, 9)
    assert eng.prefix_hits == 1  # b actually reused a's page


def test_paged_chunked_prefill_matches_whole(rng):
    """Chunked paged admission (prefill advanced one chunk per engine
    step) yields identical streams to whole-prompt admission, including
    with a prefix-cache hit mid-chunking."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=4, scale=0.08)
    long_prompt = rng.integers(0, CFG.vocab_size, (21,))
    short = rng.integers(0, CFG.vocab_size, (4,))

    def run(chunk):
        eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                                  total_pages=32, pages_per_seq=5,
                                  method="jnp", dtype=jnp.float32,
                                  prefill_chunk_size=chunk)
        eng.add_request("long", long_prompt, 6)
        eng.add_request("short", short, 8)
        res = eng.run()
        # repeat the long prompt: prefix hit path under chunking too
        eng.add_request("again", long_prompt, 6)
        res.update(eng.run())
        return res, eng.prefix_hits

    whole, _ = run(None)
    chunked, hits = run(8)
    assert chunked == whole
    assert hits == 1  # the repeat reused cached pages
    assert chunked["long"] == chunked["again"]


def test_paged_chunk_must_divide_page():
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=4, scale=0.08)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of page_size"):
        PagedBatchingEngine(CFG, params, page_size=8,
                            prefill_chunk_size=12, method="jnp",
                            dtype=jnp.float32)


def test_inflight_chunked_admission_never_corrupts_shared_pages(rng):
    """Regression: while a chunked admission is in flight, the pool decode
    step (running for OTHER active slots) must not write into the inflight
    slot's reserved/shared pages — the table points at trash until
    activation. Under the bug, the concurrent decode trashed offset 0 of
    the SHARED prefix page every step."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=3, scale=0.08)
    base = rng.integers(0, CFG.vocab_size, (16,))
    long_b = np.concatenate([base, rng.integers(0, CFG.vocab_size, (24,))])
    other = rng.integers(0, CFG.vocab_size, (5,))

    def solo(p, n):
        e = PagedBatchingEngine(CFG, params, max_batch=1, page_size=8,
                                total_pages=64, pages_per_seq=8,
                                method="jnp", dtype=jnp.float32,
                                prefix_cache=False)
        e.add_request("s", p, n)
        return e.run()["s"]

    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=64, pages_per_seq=8,
                              method="jnp", dtype=jnp.float32,
                              prefill_chunk_size=8)
    eng.add_request("a", base, 4)
    out_a = eng.run()["a"]        # registers base's prefix page(s)
    eng.add_request("c", other, 20)   # keeps decoding while b admits
    eng.step(); eng.step()
    eng.add_request("b", long_b, 5)   # prefix hit + 4 inflight chunks
    res = eng.run()
    assert eng.prefix_hits == 1
    assert res["b"] == solo(long_b, 5)
    assert res["c"] == solo(other, 20)
    # and the shared page survived for future hits
    eng.add_request("d", base, 4)
    assert eng.run()["d"] == out_a == solo(base, 4)
    assert eng.prefix_hits >= 2


def test_chunked_prefix_hit_unaligned_chunk_no_clamp(rng):
    """Regression: chunking starts at the shared-prefix boundary (a page
    multiple, not necessarily a chunk multiple); the scratch row must be
    sized from the LAST chunk's end or the final padded write clamps and
    overwrites valid KV."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=5, scale=0.08)
    base = rng.integers(0, CFG.vocab_size, (16,))
    long_b = np.concatenate([base[:8], rng.integers(0, CFG.vocab_size,
                                                    (23,))])  # len 31

    def solo(p, n):
        e = PagedBatchingEngine(CFG, params, max_batch=1, page_size=8,
                                total_pages=64, pages_per_seq=8,
                                method="jnp", dtype=jnp.float32,
                                prefix_cache=False)
        e.add_request("s", p, n)
        return e.run()["s"]

    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=64, pages_per_seq=8,
                              method="jnp", dtype=jnp.float32,
                              prefill_chunk_size=16)
    eng.add_request("a", base, 4)   # caches base's first page
    eng.run()
    eng.add_request("b", long_b, 6)  # shared=1 page, suffix 23, chunk 16
    res = eng.run()
    assert eng.prefix_hits == 1
    assert res["b"] == solo(long_b, 6)


def test_paged_cancel_releases_pages(rng):
    """cancel() on the paged engine returns the request's pages to the
    pool (cached prefix pages stay cached) and survivors are unaffected."""
    import jax.numpy as jnp

    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=16, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32)
    free0 = len(eng.free)
    keep = rng.integers(0, CFG.vocab_size, (4,))
    eng.add_request("keep", keep, 6)
    eng.add_request("kill", rng.integers(0, CFG.vocab_size, (9,)), 12)
    eng.step()
    assert eng.cancel("kill")
    res = eng.run()
    assert set(res) == {"keep"}
    # all pages released except those retained by the prefix cache
    assert len(eng.free) + len(eng.page_chain) == free0
    assert eng.stats()["slots_busy"] == 0


def test_paged_decode_int8_matches_dequant_oracle(rng):
    """modules._paged_decode on an int8 pool must equal the bf16/f32 path
    run on the explicitly dequantized pages (the scale fold is pure
    reassociation)."""
    import jax

    from autoawq_tpu.nn import modules

    b, nkv, nh, hd, ps, npg, pps = 2, 2, 8, 8, 8, 16, 4
    q = jnp.asarray(rng.standard_normal((b, 1, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, 1, nkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, 1, nkv, hd)), jnp.float32)
    kq, ks = modules._kv_quantize(
        jnp.asarray(rng.standard_normal((nkv, npg, ps, hd)), jnp.float32))
    vq, vs = modules._kv_quantize(
        jnp.asarray(rng.standard_normal((nkv, npg, ps, hd)), jnp.float32))
    table = jnp.asarray(rng.permutation(npg)[: b * pps].reshape(b, pps)
                        .astype(np.int32))
    pos = jnp.asarray([13, 21], jnp.int32)
    cache8 = {"k_pages": kq, "v_pages": vq, "k_page_s": ks, "v_page_s": vs,
              "page_table": table, "pos": pos}
    out8, new8 = modules._paged_decode(CFG, {}, q, k, v, cache8,
                                       hd ** -0.5, "jnp")
    cache_f = {"k_pages": kq.astype(jnp.float32) * ks[..., None],
               "v_pages": vq.astype(jnp.float32) * vs[..., None],
               "page_table": table, "pos": pos}
    outf, _ = modules._paged_decode(CFG, {}, q, k, v, cache_f,
                                    hd ** -0.5, "jnp")
    # identical math up to one quantization of the NEW token's K/V
    assert np.allclose(np.asarray(out8), np.asarray(outf), atol=2e-2)
    assert new8["k_pages"].dtype == jnp.int8
    assert set(new8) == set(cache8)


def test_paged_int8_engine_matches_contiguous_int8(rng):
    """The paged int8 engine's greedy streams equal the contiguous int8
    engine's (same per-token quantization at prefill; decode folds scales
    instead of dequantizing — identical math, fixed seeds)."""
    from autoawq_tpu.serve.batching import BatchingEngine

    params = init_random_params(CFG, seed=3, scale=0.08)
    prompts = [rng.integers(0, 128, (n,)) for n in (5, 11, 8)]
    ref_eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=32,
                             method="jnp", dtype=jnp.float32, kv_quant=True)
    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=32, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32, kv_quant=True)
    for i, p in enumerate(prompts):
        ref_eng.add_request(i, p, max_new_tokens=6)
        eng.add_request(i, p, max_new_tokens=6)
    ref, got = ref_eng.run(), eng.run()
    assert got == ref
    # pool really is int8 and pages were recycled back
    assert eng.pages[0]["k_pages"].dtype == jnp.int8


def test_paged_int8_prefix_cache_shares_quantized_pages(rng):
    """Prefix caching composes with int8 pools: a repeated system prompt
    reuses the quantized pages (hit counted) and the suffix stream matches
    a cold run."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    system = rng.integers(0, 128, (16,))
    tails = [rng.integers(0, 128, (4,)) for _ in range(2)]

    def run(prefix_cache):
        eng = PagedBatchingEngine(CFG, params, max_batch=1, page_size=8,
                                  total_pages=32, pages_per_seq=4,
                                  method="jnp", dtype=jnp.float32,
                                  kv_quant=True, prefix_cache=prefix_cache)
        for i, t in enumerate(tails):
            eng.add_request(i, np.concatenate([system, t]), 5)
        return eng.run(), eng.prefix_hits

    warm, hits = run(True)
    cold, _ = run(False)
    assert hits >= 1
    assert warm == cold


def test_paged_mla_matches_solo(rng):
    """DeepSeek-style MLA in the PAGED engine: latent rows page into the
    shared pool (c_pages) and absorbed decode against the gathered slab
    matches solo generation — including prefix-cache reuse of latent
    pages and page recycling."""
    mla_cfg = ModelConfig(
        model_type="deepseek_v2", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=64,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16)
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(mla_cfg, seed=7, scale=0.08)

    def solo(prompt, n):
        out = gen.generate(mla_cfg, params, jnp.asarray(prompt[None]), n,
                           method="jnp", dtype=jnp.float32, max_seq_len=48)
        return list(np.asarray(out)[0][len(prompt):])

    eng = PagedBatchingEngine(mla_cfg, params, max_batch=2, page_size=8,
                              total_pages=16, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32)
    system = rng.integers(0, 64, (10,))
    prompts = {f"m{i}": np.concatenate([system, rng.integers(0, 64, (l,))])
               for i, l in enumerate([3, 5, 2])}
    for rid, p in prompts.items():
        eng.add_request(rid, p, 6)
    got = eng.run()
    for rid, p in prompts.items():
        assert got[rid] == solo(p, 6), rid
    assert eng.prefix_hits >= 1  # latent pages shared across requests
    assert eng.pages[0]["c_pages"].shape[0] == 1


def test_paged_sliding_window_matches_solo(rng):
    """Mistral-style sliding-window models in the paged engine: window
    masking lives in the kernel/gather path; streams match solo."""
    win_cfg = ModelConfig(
        model_type="mistral", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=64,
        sliding_window=7)
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(win_cfg, seed=4, scale=0.08)

    def solo(prompt, n):
        out = gen.generate(win_cfg, params, jnp.asarray(prompt[None]), n,
                           method="jnp", dtype=jnp.float32, max_seq_len=32)
        return list(np.asarray(out)[0][len(prompt):])

    eng = PagedBatchingEngine(win_cfg, params, max_batch=2, page_size=8,
                              total_pages=16, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32)
    prompts = {f"w{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 9])}
    for rid, p in prompts.items():
        eng.add_request(rid, p, 12)  # generation crosses the window edge
    got = eng.run()
    for rid, p in prompts.items():
        assert got[rid] == solo(p, 12), rid


def test_paged_alibi_matches_solo(rng):
    """ALiBi models (bloom-style) in the paged engine: per-head bias in
    the gather path / bespoke kernel; streams match solo generation."""
    ab_cfg = ModelConfig(
        model_type="bloom", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=64,
        pos_embed="alibi")
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(ab_cfg, seed=9, scale=0.08)

    def solo(prompt, n):
        out = gen.generate(ab_cfg, params, jnp.asarray(prompt[None]), n,
                           method="jnp", dtype=jnp.float32, max_seq_len=32)
        return list(np.asarray(out)[0][len(prompt):])

    eng = PagedBatchingEngine(ab_cfg, params, max_batch=2, page_size=8,
                              total_pages=16, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32)
    prompts = {f"a{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 9])}
    for rid, p in prompts.items():
        eng.add_request(rid, p, 8)
    got = eng.run()
    for rid, p in prompts.items():
        assert got[rid] == solo(p, 8), rid


def test_window_pages_recycle_midflight(rng):
    """Pages wholly behind the sliding window return to the pool while
    the request is still running; streams stay exact and a queued
    request can be admitted with the recycled pages."""
    win_cfg = ModelConfig(
        model_type="mistral", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=64,
        sliding_window=8)
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(win_cfg, seed=4, scale=0.08)

    def solo(prompt, n):
        out = gen.generate(win_cfg, params, jnp.asarray(prompt[None]), n,
                           method="jnp", dtype=jnp.float32, max_seq_len=64)
        return list(np.asarray(out)[0][len(prompt):])

    prompt = rng.integers(0, 64, (6,))
    # budget 6+40+1 -> 6 pages of 8; pool has 7 usable pages
    eng = PagedBatchingEngine(win_cfg, params, max_batch=2, page_size=8,
                              total_pages=8, pages_per_seq=6,
                              method="jnp", dtype=jnp.float32,
                              prefix_cache=False)
    eng.add_request("long", prompt, 40)
    free_during = []
    while eng.has_work:
        eng.step()
        free_during.append(len(eng.free))
    assert eng.finished[0].output == solo(prompt, 40)
    # recycling returned pages to the pool while the request ran
    assert max(free_during[:-1]) > min(free_during[:-1])
    assert sorted(eng.free) == list(range(1, 8))

    # a second request whose admission NEEDS recycled pages still serves
    eng2 = PagedBatchingEngine(win_cfg, params, max_batch=2, page_size=8,
                               total_pages=10, pages_per_seq=6,
                               method="jnp", dtype=jnp.float32,
                               prefix_cache=False)
    p2 = rng.integers(0, 64, (5,))
    eng2.add_request("a", prompt, 40)   # 6 pages
    eng2.add_request("b", p2, 24)       # needs 4: only 3 free at start
    got = eng2.run()
    assert got["a"] == solo(prompt, 40)
    assert got["b"] == solo(p2, 24)


def test_paged_moe_matches_solo(rng):
    """MoE models page like dense ones (standard KV attention; experts
    only touch the MLP): streams match solo."""
    moe_cfg = ModelConfig(
        model_type="mixtral", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, num_experts=4,
        num_experts_per_tok=2, max_position_embeddings=64)
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(moe_cfg, seed=11, scale=0.08)

    def solo(prompt, n):
        out = gen.generate(moe_cfg, params, jnp.asarray(prompt[None]), n,
                           method="jnp", dtype=jnp.float32, max_seq_len=32)
        return list(np.asarray(out)[0][len(prompt):])

    eng = PagedBatchingEngine(moe_cfg, params, max_batch=2, page_size=8,
                              total_pages=16, pages_per_seq=4,
                              method="jnp", dtype=jnp.float32)
    prompts = {f"e{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 9])}
    for rid, p in prompts.items():
        eng.add_request(rid, p, 6)
    got = eng.run()
    for rid, p in prompts.items():
        assert got[rid] == solo(p, 6), rid


def test_sliding_window_zero_means_off(rng, monkeypatch):
    """Regression: sliding_window=0 (as some HF configs carry) must mean
    NO window — the bespoke kernel used to treat it as a zero-width
    window and mask every key, zeroing attention for int8 pools."""
    cfg0 = ModelConfig(
        model_type="mistral", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=8,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=64,
        sliding_window=0)
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(cfg0, seed=3, scale=0.08)
    prompt = rng.integers(0, 64, (6,))

    def run():
        eng = PagedBatchingEngine(cfg0, params, max_batch=1, page_size=8,
                                  total_pages=16, pages_per_seq=4,
                                  method="auto", dtype=jnp.float32,
                                  kv_quant=True)
        eng.add_request("r", prompt, 6)
        return eng.run()["r"]

    monkeypatch.setenv("AWQ_TPU_PAGED_ATTN", "force")  # bespoke kernel
    via_kernel = run()
    monkeypatch.setenv("AWQ_TPU_PAGED_ATTN", "0")      # gather oracle
    assert via_kernel == run()


def test_paged_mla_int8(rng):
    """int8 latent pages: separate compressed-kv/rope scales fold into
    the absorbed decode; streams match the fp paged engine at tiny
    scales (fixed seed), and prefix sharing round-trips bit-exactly
    (requantizing dequantized rows is idempotent)."""
    mla_cfg = ModelConfig(
        model_type="deepseek_v2", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=64,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16)
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(mla_cfg, seed=7, scale=0.08)
    system = rng.integers(0, 64, (10,))
    prompts = {f"q{i}": np.concatenate([system, rng.integers(0, 64, (l,))])
               for i, l in enumerate([3, 5])}

    def run(kv_quant):
        eng = PagedBatchingEngine(mla_cfg, params, max_batch=2, page_size=8,
                                  total_pages=16, pages_per_seq=4,
                                  method="jnp", dtype=jnp.float32,
                                  kv_quant=kv_quant)
        for rid, p in prompts.items():
            eng.add_request(rid, p, 6)
        out = eng.run()
        return out, eng

    fp, _ = run(False)
    q8, eng8 = run(True)
    assert q8 == fp  # int8 latent error does not flip greedy at 0.08
    assert eng8.pages[0]["c_pages"].dtype == jnp.int8
    assert eng8.prefix_hits >= 1


def test_paged_alibi_int8_kernel_matches_gather(rng, monkeypatch):
    """int8 pages + ALiBi in ONE kernel (scale fold + slope sheet):
    forced-kernel streams equal the gather path exactly."""
    ab_cfg = ModelConfig(
        model_type="bloom", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, head_dim=16, max_position_embeddings=64,
        pos_embed="alibi")
    from autoawq_tpu.io.hf import init_random_params

    params = init_random_params(ab_cfg, seed=9, scale=0.08)
    prompt = rng.integers(0, 64, (6,))

    def run():
        eng = PagedBatchingEngine(ab_cfg, params, max_batch=1, page_size=8,
                                  total_pages=16, pages_per_seq=4,
                                  method="auto", dtype=jnp.float32,
                                  kv_quant=True)
        eng.add_request("r", prompt, 6)
        return eng.run()["r"]

    monkeypatch.setenv("AWQ_TPU_PAGED_ATTN", "force")
    via_kernel = run()
    monkeypatch.setenv("AWQ_TPU_PAGED_ATTN", "0")
    assert via_kernel == run()


def test_paged_burst_matches_single_step(rng):
    """run(burst=n) on the page pool reproduces single-step streams
    exactly (greedy + sampled + penalty), incl. mid-burst retirements."""
    params = init_random_params(CFG, seed=15, scale=0.08)
    prompts = {f"r{i}": rng.integers(0, 64, (l,))
               for i, l in enumerate([5, 9, 3])}
    budgets = {"r0": 9, "r1": 6, "r2": 12}

    def drive(burst, **kw):
        eng = PagedBatchingEngine(CFG, params, max_batch=3, page_size=8,
                                  total_pages=24, pages_per_seq=4,
                                  method="jnp", dtype=jnp.float32, seed=3)
        for rid, p in prompts.items():
            eng.add_request(rid, p, budgets[rid], **kw)
        return eng.run(burst=burst)

    assert drive(1) == drive(4)
    kw = dict(temperature=0.7, top_k=12, repetition_penalty=1.2)
    assert drive(1, **kw) == drive(4, **kw)


def test_paged_burst_sliding_window_recycles(rng):
    """Bursts on a windowed model still recycle behind-window pages
    (after each burst) and match single-step streams."""
    wcfg = ModelConfig(
        model_type="mistral", vocab_size=64, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, max_position_embeddings=128,
        sliding_window=16)
    params = init_random_params(wcfg, seed=9, scale=0.08)
    prompt = rng.integers(0, 64, (10,))

    def drive(burst):
        eng = PagedBatchingEngine(wcfg, params, max_batch=2, page_size=8,
                                  total_pages=16, pages_per_seq=8,
                                  method="jnp", dtype=jnp.float32)
        eng.add_request("a", prompt, 40)
        out = eng.run(burst=burst)
        return out, eng.stats()["free_pages"]

    (o1, f1), (o4, f4) = drive(1), drive(4)
    assert o1 == o4
    assert f1 == f4  # recycling converges to the same pool state


def _fake_embeds(params, prompt, img_lo, img_hi, rng):
    """Spliced-embeds stand-in: embedding rows with 'vision features'
    (noise) replacing the placeholder span — the engines treat
    prompt_embeds opaquely, so any [S, H] array drives the path."""
    from autoawq_tpu.nn import modules

    emb = np.array(modules.embed(
        CFG, params, jnp.asarray(prompt[None]), jnp.float32,
        jnp.arange(len(prompt))[None]))[0]
    emb[img_lo:img_hi] = rng.standard_normal(
        (img_hi - img_lo, emb.shape[1])).astype(np.float32) * 0.1
    return emb


def test_paged_embeds_matches_contiguous_engine(rng):
    """Multimodal prompts serve from the PAGE pool: the stream matches the
    contiguous engine's embeds stream, and differs from the text-only
    (placeholder ids) stream — the image conditioned the output."""
    from autoawq_tpu.serve.batching import BatchingEngine

    params = init_random_params(CFG, seed=3, scale=0.08)
    prompt = rng.integers(6, 128, (18,))
    prompt[2:8] = 5  # placeholder run
    embeds = _fake_embeds(params, prompt, 2, 8, rng)

    ref_eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=64,
                             method="jnp", dtype=jnp.float32)
    ref_eng.add_request("img", prompt, 8, prompt_embeds=embeds)
    ref_eng.add_request("txt", prompt, 8)
    ref = ref_eng.run()
    assert ref["img"] != ref["txt"]

    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=32, pages_per_seq=5,
                              method="jnp", dtype=jnp.float32)
    eng.add_request("img", prompt, 8, prompt_embeds=embeds)
    eng.add_request("txt", prompt, 8)
    got = eng.run()
    assert got["img"] == ref["img"]
    assert got["txt"] == ref["txt"]


def test_paged_embeds_prefix_reuse_same_image_only(rng):
    """Prefix caching for image prompts hashes the embed CONTENT per page:
    the same (ids, image) resubmitted hits the cache; the same ids with a
    DIFFERENT image must NOT (placeholder ids alone don't identify an
    image), and a text-only request with identical ids must not match the
    embed pages either."""
    params = init_random_params(CFG, seed=3, scale=0.08)
    prompt = rng.integers(6, 128, (17,))  # 2 full pages + 1
    prompt[1:7] = 5
    emb_a = _fake_embeds(params, prompt, 1, 7, rng)
    emb_b = _fake_embeds(params, prompt, 1, 7, rng)  # different image

    eng = PagedBatchingEngine(CFG, params, max_batch=2, page_size=8,
                              total_pages=32, pages_per_seq=5,
                              method="jnp", dtype=jnp.float32)
    eng.add_request("a1", prompt, 6, prompt_embeds=emb_a)
    out_a1 = eng.run()["a1"]
    assert eng.prefix_hits == 0

    eng.add_request("a2", prompt, 6, prompt_embeds=emb_a)
    out_a2 = eng.run()["a2"]
    assert eng.prefix_hits == 1  # same image: pages reused
    assert out_a2 == out_a1      # ... and the stream is identical

    eng.add_request("b", prompt, 6, prompt_embeds=emb_b)
    out_b = eng.run()["b"]
    assert eng.prefix_hits == 1  # different image: NO reuse
    assert out_b != out_a1

    eng.add_request("txt", prompt, 6)
    eng.run()
    assert eng.prefix_hits == 1  # ids alone never match embed pages


def test_paged_burst_top_logprobs_matches_single_step(rng):
    """top_logprobs no longer forces the page pool to single-step: the
    paged burst scan computes top-N alternatives in place; streams,
    logprobs and the alternative dicts must match single-step runs."""
    params = init_random_params(CFG, seed=3, scale=0.08)
    prompts = {f"r{i}": rng.integers(0, 128, (l,))
               for i, l in enumerate([5, 9, 3])}

    def drive(burst):
        eng = PagedBatchingEngine(CFG, params, max_batch=3, page_size=8,
                                  total_pages=32, pages_per_seq=4,
                                  method="jnp", dtype=jnp.float32,
                                  top_logprobs=3, seed=3)
        for rid, p in prompts.items():
            eng.add_request(rid, p, 8)
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
