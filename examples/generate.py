"""Generation example on a quantized checkpoint
(reference: examples/generate.py).

    python examples/generate.py --model /path/to/awq --prompt "Hello" \
        [--max-new-tokens 64] [--temperature 0.7]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--prompt", default="The meaning of life is")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args()

    import numpy as np
    from transformers import AutoTokenizer

    from autoawq_tpu import AutoAWQForCausalLM

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    model = AutoAWQForCausalLM.from_quantized(args.model).to_device()
    ids = np.asarray([tokenizer(args.prompt)["input_ids"]])

    def stream(token):
        print(tokenizer.decode(np.asarray(token)[0]), end="", flush=True)

    print(args.prompt, end="")
    model.generate(
        ids,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        eos_token_id=tokenizer.eos_token_id,
        stream_callback=stream,
    )
    print()


if __name__ == "__main__":
    main()
