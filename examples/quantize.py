"""Golden-path quantization example (reference: examples/quantize.py).

    python examples/quantize.py --model /path/to/hf-fp16 --out /path/to/awq \
        [--calib pileval] [--group-size 128] [--no-zero-point]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF fp16 checkpoint dir")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--calib", default="pileval")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--w-bit", type=int, default=4)
    ap.add_argument("--no-zero-point", action="store_true")
    ap.add_argument("--max-calib-samples", type=int, default=128)
    ap.add_argument("--max-calib-seq-len", type=int, default=512)
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from autoawq_tpu import AutoAWQForCausalLM, AwqConfig

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    model = AutoAWQForCausalLM.from_pretrained(args.model)
    model.quantize(
        tokenizer,
        quant_config=AwqConfig(
            w_bit=args.w_bit,
            q_group_size=args.group_size,
            zero_point=not args.no_zero_point,
        ),
        calib_data=args.calib,
        max_calib_samples=args.max_calib_samples,
        max_calib_seq_len=args.max_calib_seq_len,
    )
    model.save_quantized(args.out)
    tokenizer.save_pretrained(args.out)
    print(f"saved AWQ model to {args.out}")


if __name__ == "__main__":
    main()
