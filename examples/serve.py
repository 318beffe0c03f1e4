"""Continuous-batching serving example.

The reference's generation examples run one static batch per call
(examples/generate.py, examples/benchmark.py). This engine admits requests
into a fixed slot pool mid-flight and retires them at their own EOS —
static shapes, one compiled decode step regardless of traffic.

Usage:
    python examples/serve.py --model /path/to/quantized [--max-batch 8]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="per-request sampling (0 = greedy)")
    ap.add_argument("--top-k", type=int, default=None)
    ap.add_argument("--top-p", type=float, default=None)
    ap.add_argument("--prompts", nargs="*", default=[
        "The capital of France is",
        "def fibonacci(n):",
        "Once upon a time",
    ])
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from autoawq_tpu.api import AutoAWQForCausalLM
    from autoawq_tpu.serve.batching import BatchingEngine

    model = AutoAWQForCausalLM.from_quantized(args.model)
    tok = AutoTokenizer.from_pretrained(args.model)

    eng = BatchingEngine(model.cfg, model.params, max_batch=args.max_batch,
                         max_seq_len=args.max_seq_len,
                         eos_token_id=tok.eos_token_id)
    for i, text in enumerate(args.prompts):
        ids = np.asarray(tok.encode(text))
        eng.add_request(i, ids, args.max_new_tokens,
                        temperature=args.temperature,
                        top_k=args.top_k, top_p=args.top_p)

    # stream tokens as slots produce them. For batch jobs where
    # per-token latency doesn't matter, eng.step_burst(16) (or
    # eng.run(burst=16)) decodes 16 tokens per device dispatch —
    # measured 4.7-5.6x the single-step engine throughput.
    while eng.has_work:
        for rid, t in eng.step():
            print(f"[req {rid}] {tok.decode([t])!r}")
    for req in eng.finished:
        print(f"\n=== request {req.id} ===")
        print(args.prompts[req.id] + tok.decode(req.output))


if __name__ == "__main__":
    main()
