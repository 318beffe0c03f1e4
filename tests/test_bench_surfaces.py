"""The driver-run benchmark surfaces must not rot: bench_serve's tiny
mode exercises the whole HTTP + slot-pool + page-pool + prefix-cache
stack end to end, and bench_table's fit math gates real chip runs."""

import pytest


@pytest.mark.slow
def test_bench_serve_tiny_end_to_end(monkeypatch):
    import scripts.bench_serve as bs

    monkeypatch.setattr(bs, "TINY", True)
    monkeypatch.setattr(bs, "N_CLIENTS", 4)
    monkeypatch.setattr(bs, "PROMPT_LEN", 16)
    monkeypatch.setattr(bs, "MAX_TOKENS", 8)
    monkeypatch.setattr(bs, "MAX_BATCH", 2)
    cfg, params = bs._model()

    r1 = bs.run_config(cfg, params, burst=4)
    assert r1["tokens_streamed"] == 4 * 8
    assert r1["throughput_tok_s"] > 0 and r1["ttft_p50_s"] > 0

    rp = bs.run_config(cfg, params, burst=4, paged=True, sys_prefix=32)
    assert rp["engine"] == "paged"
    assert rp["tokens_streamed"] == 4 * 8
    # the two warmup clients prime the prefix cache; every timed client
    # then reuses the shared system-prompt pages
    assert rp["prefix_hits"] >= 4


def test_bench_table_fit_math():
    from autoawq_tpu.models.config import ModelConfig
    import scripts.bench_table as bt

    cfg34 = ModelConfig(max_position_embeddings=8192, model_type="llama",
                        **bt.MODELS["codellama-34b"])
    ok, note = bt.fits(cfg34, 1, 128, "bf16", 16 * 1024**3)
    assert not ok and "weights" in note  # 34B int4 can't fit 16 GB

    cfg7 = ModelConfig(max_position_embeddings=8192, model_type="llama",
                       **bt.MODELS["mistral-7b"])
    assert bt.fits(cfg7, 8, 4096, "bf16", 16 * 1024**3)[0]

    # stream-byte accounting: int4 + f32 scales + packed qzeros + bf16 head
    b = bt.weight_stream_bytes(cfg7)
    params = 32 * (4096 * 48 * 128 + 32 * 128 * 4096 + 3 * 4096 * 14336)
    assert b == (params // 2 + params // 128 * 4 + params // 256
                 + 4096 * 32000 * 2)

    # every RUNS row has a baseline for its decode kind
    for name, bsz, ctx, dec, kv in bt.RUNS:
        assert (name, bsz, ctx, "decode") in bt.BASELINES, (name, bsz, ctx)
