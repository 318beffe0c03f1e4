"""OpenAI-compatible HTTP front-end (serve/server.py) over the batching
engine: completions (greedy + sampled + streaming) round-trip over
localhost, greedy output matching direct engine use."""

import json
import urllib.request

import jax.numpy as jnp
import numpy as np

from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.serve.batching import BatchingEngine
from autoawq_tpu.serve.server import start_server

CFG = ModelConfig(
    model_type="llama", vocab_size=64, hidden_size=64,
    intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, max_position_embeddings=64)


def _post(port, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/completions",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_http_completions_roundtrip(rng):
    params = init_random_params(CFG, seed=5, scale=0.08)
    prompt = [int(t) for t in rng.integers(0, 64, (5,))]

    ref_eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                             method="jnp", dtype=jnp.float32)
    ref_eng.add_request("r", np.asarray(prompt), 6)
    ref = ref_eng.run()["r"]

    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32, seed=3)
    es, httpd = start_server(eng, tokenizer=None)
    port = httpd.server_address[1]
    try:
        # health + models
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        status, body = _post(port, {"prompt": prompt, "max_tokens": 6})
        assert status == 200
        out = json.loads(body)
        assert out["choices"][0]["token_ids"] == ref
        assert out["usage"]["completion_tokens"] == 6

        # sampled request (different params per request through the pool)
        status, body = _post(port, {"prompt": prompt, "max_tokens": 6,
                                    "temperature": 1.0, "top_k": 8})
        assert status == 200
        samp = json.loads(body)["choices"][0]["token_ids"]
        assert len(samp) == 6 and all(0 <= t < 64 for t in samp)

        # streaming: one SSE chunk per token, then [DONE]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": prompt, "max_tokens": 6,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        toks = []
        with urllib.request.urlopen(req, timeout=120) as r:
            for line in r:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                if line == "data: [DONE]":
                    break
                toks.extend(json.loads(line[6:])["choices"][0]["token_ids"])
        assert toks == ref

        # malformed request -> 400, server stays alive
        try:
            _post(port, {"max_tokens": 4})
        except urllib.error.HTTPError as e:
            assert e.code == 400
        status, _ = _post(port, {"prompt": prompt, "max_tokens": 2})
        assert status == 200
    finally:
        httpd.shutdown()
        es.shutdown()


import urllib.error  # noqa: E402  (used in the 400 check above)


def test_bad_request_does_not_brick_the_engine_thread(rng):
    """Regression: an oversized request raises inside the engine thread;
    the request must fail with a 400-style error and the NEXT request must
    still be served (the thread survives)."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=32,
                         method="jnp", dtype=jnp.float32)
    from autoawq_tpu.serve.server import start_server as _start

    es, httpd = _start(eng, tokenizer=None)
    port = httpd.server_address[1]
    try:
        # prompt longer than max_seq_len -> engine.add_request raises
        too_long = [int(t) for t in rng.integers(0, 64, (40,))]
        try:
            _post(port, {"prompt": too_long, "max_tokens": 4})
            raise AssertionError("oversized prompt was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "max_seq_len" in json.loads(e.read())["error"]
        ok = [int(t) for t in rng.integers(0, 64, (5,))]
        status, body = _post(port, {"prompt": ok, "max_tokens": 4})
        assert status == 200
        assert json.loads(body)["usage"]["completion_tokens"] == 4
        # string prompt without tokenizer -> clean 400, not a 500
        try:
            _post(port, {"prompt": "hello", "max_tokens": 2})
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400
            assert "tokenizer" in json.loads(e.read())["error"]
        assert raised
    finally:
        httpd.shutdown()
        es.shutdown()


def test_http_cancel_via_engine_thread(rng):
    """POST /v1/cancel aborts a long streaming request thread-safely (the
    engine thread applies it) and the waiting client unblocks with an
    error rather than hanging."""
    import threading

    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=512,
                         method="jnp", dtype=jnp.float32)
    from autoawq_tpu.serve.server import start_server as _start

    es, httpd = _start(eng, tokenizer=None)
    port = httpd.server_address[1]
    try:
        result = {}

        def long_req():
            try:
                _post(port, {"prompt": [1, 2, 3], "max_tokens": 4000,
                             "request_id": "victim"})
                result["r"] = "completed"
            except urllib.error.HTTPError as e:
                result["r"] = json.loads(e.read()).get("error")

        t = threading.Thread(target=long_req)
        t.start()
        import time as _t

        _t.sleep(1.0)  # let it admit and start decoding
        creq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/cancel",
            data=json.dumps({"request_id": "victim"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(creq, timeout=30) as r:
            assert json.loads(r.read())["status"] == "cancelling"
        t.join(timeout=60)
        assert not t.is_alive()
        assert result["r"] == "cancelled"
    finally:
        httpd.shutdown()
        es.shutdown()


class _FakeTok:
    """Maps each character to a token id (mod vocab); decode inverts."""

    def encode(self, s):
        return [ord(c) % 64 for c in s]

    def decode(self, ids):
        return "".join(chr(65 + (int(t) % 26)) for t in ids)


class _FakeChatTok(_FakeTok):
    chat_template = "stub"  # presence selects apply_chat_template

    def apply_chat_template(self, msgs, add_generation_prompt, tokenize):
        assert add_generation_prompt and tokenize
        return self.encode("|".join(m["content"] for m in msgs) + "|A:")


def _post_path(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_http_chat_completions(rng):
    """Chat endpoint: messages render through the tokenizer's template,
    the response is chat.completion-shaped, and the content equals the
    engine's own generation for the templated prompt."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    tok = _FakeChatTok()
    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"}]
    prompt = tok.apply_chat_template(msgs, True, True)

    ref_eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                             method="jnp", dtype=jnp.float32)
    ref_eng.add_request("r", np.asarray(prompt), 6)
    ref = ref_eng.run()["r"]

    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    es, httpd = start_server(eng, tokenizer=tok)
    port = httpd.server_address[1]
    try:
        status, body = _post_path(port, "/v1/chat/completions",
                                  {"messages": msgs, "max_tokens": 6})
        assert status == 200
        out = json.loads(body)
        assert out["object"] == "chat.completion"
        ch = out["choices"][0]
        assert ch["token_ids"] == ref
        assert ch["message"]["role"] == "assistant"
        assert ch["message"]["content"] == tok.decode(ref)

        # generic-template fallback (no chat_template attribute)
        es.tok = _FakeTok()
        status, body = _post_path(port, "/v1/chat/completions",
                                  {"messages": msgs, "max_tokens": 4})
        assert status == 200
        assert json.loads(body)["choices"][0]["message"]["content"]

        # malformed messages -> 400, engine stays alive
        import pytest as _p

        with _p.raises(urllib.error.HTTPError) as ei:
            _post_path(port, "/v1/chat/completions",
                       {"messages": [{"role": "user"}], "max_tokens": 2})
        assert ei.value.code == 400
        status, _ = _post_path(port, "/v1/chat/completions",
                               {"messages": msgs, "max_tokens": 2})
        assert status == 200
    finally:
        httpd.shutdown()
        es.shutdown()


def test_http_stop_sequences(rng):
    """"stop" in the HTTP body (token-id form) retires the request at the
    match and the response excludes the stop tokens — even the ones
    already pushed before the engine trimmed them."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    prompt = [int(t) for t in rng.integers(0, 64, (5,))]
    ref = BatchingEngine(CFG, params, max_batch=1, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    ref.add_request("r", np.asarray(prompt), 10)
    full = ref.run()["r"]

    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    es, httpd = start_server(eng)
    port = httpd.server_address[1]
    try:
        status, body = _post(port, {"prompt": prompt, "max_tokens": 10,
                                    "stop": [full[4:6]]})
        assert status == 200
        out = json.loads(body)
        assert out["choices"][0]["token_ids"] == full[:4]
        assert out["usage"]["completion_tokens"] == 4
    finally:
        httpd.shutdown()
        es.shutdown()


def test_http_n_completions(rng):
    """"n": K returns K independently sampled choices (indices 0..K-1);
    greedy n>1 and streaming n>1 are rejected."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    eng = BatchingEngine(CFG, params, max_batch=4, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    es, httpd = start_server(eng)
    port = httpd.server_address[1]
    prompt = [int(t) for t in rng.integers(0, 64, (5,))]
    try:
        status, body = _post(port, {"prompt": prompt, "max_tokens": 8,
                                    "n": 3, "temperature": 1.0})
        assert status == 200
        out = json.loads(body)
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        streams = [tuple(c["token_ids"]) for c in out["choices"]]
        assert len(set(streams)) > 1  # independent samples
        assert out["usage"]["completion_tokens"] == sum(
            len(s) for s in streams)

        import pytest as _p

        for bad in ({"n": 2}, {"n": 2, "stream": True,
                               "temperature": 1.0}):
            with _p.raises(urllib.error.HTTPError) as ei:
                _post(port, {"prompt": prompt, "max_tokens": 4, **bad})
            assert ei.value.code == 400
    finally:
        httpd.shutdown()
        es.shutdown()


def test_http_streaming_stop_holds_back_match(rng):
    """Streaming with stop sequences must never emit the stop tokens:
    the handler holds back the longest possible match and flushes the
    tail only when generation ends without one."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    prompt = [int(t) for t in rng.integers(0, 64, (5,))]
    ref = BatchingEngine(CFG, params, max_batch=1, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    ref.add_request("r", np.asarray(prompt), 10)
    full = ref.run()["r"]
    # choose the first 2-token window with no earlier duplicate match
    stop = full[4:6]

    eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                         method="jnp", dtype=jnp.float32)
    es, httpd = start_server(eng)
    port = httpd.server_address[1]

    def stream(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        toks = []
        for line in urllib.request.urlopen(req, timeout=120) \
                .read().decode().split("\n\n"):
            if line.startswith("data: ") and line != "data: [DONE]":
                ch = json.loads(line[6:])["choices"][0]
                toks.extend(ch.get("token_ids", []))
        return toks

    try:
        got = stream({"prompt": prompt, "max_tokens": 10, "stream": True,
                      "stop": [stop]})
        # streamed tokens + the stop must prefix the unrestricted stream
        assert got + stop == full[: len(got) + len(stop)]
        # no-stop streaming still delivers everything (tail flushed)
        assert stream({"prompt": prompt, "max_tokens": 10,
                       "stream": True}) == full
    finally:
        httpd.shutdown()
        es.shutdown()


def test_http_burst_server_matches_single_step(rng):
    """A burst>1 server emits the same completions as the single-step
    server (tokens just arrive in bigger flushes)."""
    params = init_random_params(CFG, seed=5, scale=0.08)
    prompt = [int(t) for t in rng.integers(0, 64, (5,))]

    def serve_once(burst):
        eng = BatchingEngine(CFG, params, max_batch=2, max_seq_len=48,
                             method="jnp", dtype=jnp.float32, seed=3)
        es, httpd = start_server(eng, tokenizer=None, burst=burst)
        port = httpd.server_address[1]
        try:
            status, body = _post(port, {"prompt": prompt,
                                        "max_tokens": 9})
            assert status == 200
            return json.loads(body)["choices"][0]["token_ids"]
        finally:
            httpd.shutdown()
            es.shutdown()

    assert serve_once(4) == serve_once(1)
