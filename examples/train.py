"""LoRA fine-tuning on a frozen quantized base
(reference: examples/train.py — PEFT adapters over WQLinear with gradients
through the dequantized int4 weights).

  python examples/train.py --model /path/to/quantized --steps 100 \
      --dataset mit-han-lab/pile-val-backup --rank 8 --lr 1e-4
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="quantized checkpoint dir")
    ap.add_argument("--dataset", default="mit-han-lab/pile-val-backup")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--optimizer", choices=["adamw", "sgd"], default="adamw",
                    help="adamw matches the reference's HF-Trainer default")
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--out", default="lora_adapters.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from autoawq_tpu.api import AutoAWQForCausalLM
    from autoawq_tpu.quantize.calib import get_calib_dataset
    from autoawq_tpu.train import lora as lora_mod

    tokenizer = AutoTokenizer.from_pretrained(args.model)
    model = AutoAWQForCausalLM.from_quantized(args.model).to_device(
        jnp.float32)
    cfg = model.cfg

    tokens = get_calib_dataset(
        args.dataset, tokenizer,
        n_samples=args.steps * args.batch_size,
        max_seq_len=args.seq_len,
    )

    params = lora_mod.add_lora(cfg, model.params, rank=args.rank)
    lora, base = lora_mod.split_lora(jax.device_put(params))

    tx = lora_mod.make_optimizer(args.optimizer, args.lr, args.weight_decay)
    opt_state = tx.init(lora)
    step_fn = jax.jit(
        lambda lora, base, opt_state, batch: lora_mod.lora_train_step_optax(
            cfg, lora, base, opt_state, batch, tx)
    )
    for step in range(args.steps):
        lo = (step * args.batch_size) % max(1, len(tokens) - args.batch_size)
        batch = jnp.asarray(tokens[lo : lo + args.batch_size])
        loss, lora, opt_state = step_fn(lora, base, opt_state, batch)
        if step % 10 == 0:
            print(f"step {step:4d}  loss {float(loss):.4f}")

    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}.{k}" if prefix else k)
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}.{i}")
        elif tree is not None:
            flat[prefix] = np.asarray(tree)

    walk(lora)
    np.savez(args.out, **flat)
    print(f"saved {len(flat)} adapter tensors to {args.out}")


if __name__ == "__main__":
    main()
