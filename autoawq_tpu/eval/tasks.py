"""Multiple-choice (MMLU-style) evaluation and word-error-rate.

Reference analogues: ``eval_mmlu`` (awq/evaluation/eval_utils.py:117-164,
which defers to lm-eval) and ``eval_librispeech``
(eval_utils.py:61-114, whisper + jiwer). Here both are self-contained:
multiple-choice scoring runs directly on our functional model via summed
continuation log-likelihoods, and WER ships its own edit-distance.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.nn import modules


@functools.partial(jax.jit, static_argnames=("cfg", "method"))
def _seq_logprobs(cfg, params, tokens, method="auto"):
    """Per-position next-token log-probs for a [B, S] batch."""
    logits = modules.forward(cfg, params, tokens, method=method)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    return jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]


def choice_loglikelihood(
    cfg: ModelConfig,
    params: Dict[str, Any],
    context_ids: Sequence[int],
    continuation_ids: Sequence[int],
    pad_to: Optional[int] = None,
    method: str = "auto",
) -> float:
    """Sum log P(continuation | context) — the lm-eval "loglikelihood"
    primitive used by MMLU/ARC/HellaSwag-style tasks."""
    ids = list(context_ids) + list(continuation_ids)
    n_cont = len(continuation_ids)
    seq = np.asarray(ids, np.int32)[None]
    if pad_to and seq.shape[1] < pad_to:  # stable jit shapes across choices
        seq = np.pad(seq, ((0, 0), (0, pad_to - seq.shape[1])))
    lp = np.asarray(_seq_logprobs(cfg, params, jnp.asarray(seq), method))
    start = len(context_ids) - 1
    return float(lp[0, start : start + n_cont].sum())


MMLU_CHOICES = ("A", "B", "C", "D")


def format_mmlu_prompt(question: str, choices: Sequence[str],
                       subject: str = "") -> str:
    subj = subject.replace("_", " ")
    head = (f"The following are multiple choice questions (with answers) "
            f"about {subj}.\n\n" if subject else "")
    body = question.strip() + "\n"
    for letter, choice in zip(MMLU_CHOICES, choices):
        body += f"{letter}. {choice}\n"
    return head + body + "Answer:"


def eval_multiple_choice(
    cfg: ModelConfig,
    params: Dict[str, Any],
    tokenizer,
    examples: List[Dict[str, Any]],  # {"question", "choices", "answer"(int)}
    subject: str = "",
    method: str = "auto",
    progress: bool = False,
) -> Dict[str, float]:
    """Accuracy via max continuation log-likelihood over the answer letters
    (the lm-eval MMLU recipe, minus the harness dependency)."""
    it = examples
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(examples, desc="mmlu", unit="q")
        except ImportError:
            pass
    correct = 0
    for ex in it:
        prompt = format_mmlu_prompt(ex["question"], ex["choices"], subject)
        ctx = tokenizer(prompt)["input_ids"]
        scores = []
        conts = [tokenizer(" " + letter, add_special_tokens=False)["input_ids"]
                 for letter in MMLU_CHOICES[: len(ex["choices"])]]
        pad_to = max(len(ctx) + len(c) for c in conts)
        for cont in conts:
            scores.append(choice_loglikelihood(cfg, params, ctx, cont,
                                               pad_to=pad_to, method=method))
        if int(np.argmax(scores)) == int(ex["answer"]):
            correct += 1
    return {"accuracy": correct / max(1, len(examples)),
            "n": len(examples)}


def load_mmlu(subjects: Optional[List[str]] = None, split: str = "test",
              n_per_subject: Optional[int] = None):
    """Fetch cais/mmlu via ``datasets`` (needs network)."""
    from datasets import load_dataset

    subjects = subjects or ["all"]
    out: Dict[str, List[Dict[str, Any]]] = {}
    for s in subjects:
        ds = load_dataset("cais/mmlu", s, split=split)
        rows = [dict(r) for r in ds]
        out[s] = rows[:n_per_subject] if n_per_subject else rows
    return out


# --------------------------------------------------------------------------
# Word error rate (LibriSpeech-style ASR eval)
# --------------------------------------------------------------------------

def word_error_rate(references: Sequence[str],
                    hypotheses: Sequence[str]) -> float:
    """Corpus WER via Levenshtein distance over words (jiwer-free)."""
    errors = total = 0
    for ref, hyp in zip(references, hypotheses):
        r, h = ref.split(), hyp.split()
        d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
        d[:, 0] = np.arange(len(r) + 1)
        d[0, :] = np.arange(len(h) + 1)
        for i in range(1, len(r) + 1):
            for j in range(1, len(h) + 1):
                sub = d[i - 1, j - 1] + (r[i - 1] != h[j - 1])
                d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
        errors += int(d[len(r), len(h)])
        total += len(r)
    return errors / max(1, total)


def eval_librispeech(model_id: str, n_samples: int = 100) -> Dict[str, float]:
    """Whisper-family WER on LibriSpeech test.clean via the HF pipeline —
    same recipe as the reference (eval_utils.py:61-114); needs network and
    torch audio deps."""
    from datasets import load_dataset
    from transformers import pipeline

    ds = load_dataset("librispeech_asr", "clean", split="test",
                      streaming=True)
    pipe = pipeline("automatic-speech-recognition", model=model_id)
    refs, hyps = [], []
    for i, sample in enumerate(ds):
        if i >= n_samples:
            break
        pred = pipe(sample["audio"])["text"]
        refs.append(sample["text"].lower().strip())
        hyps.append(pred.lower().strip())
    return {"wer": word_error_rate(refs, hyps), "n": len(refs)}
