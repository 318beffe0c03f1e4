"""lm-evaluation-harness adapter.

The reference defers MMLU and friends to lm-eval with an HF-model wrapper
(awq/evaluation/eval_utils.py:117-164). This adapter exposes our functional
runtime as an ``lm_eval.api.model.LM`` so any harness task runs against a
quantized TPU model:

    import lm_eval
    from autoawq_tpu import AutoAWQForCausalLM
    from autoawq_tpu.eval.lm_eval_adapter import AwqTpuLM

    model = AutoAWQForCausalLM.from_quantized(path)
    results = lm_eval.simple_evaluate(
        model=AwqTpuLM(model, tokenizer), tasks=["mmlu"])

lm-eval is an optional dependency (not bundled in every image); importing
this module without it raises with guidance. The in-house scorers in
eval/tasks.py cover MMLU / HumanEval / WER without the extra dependency.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import numpy as np

try:
    from lm_eval.api.model import LM as _LM
    from lm_eval.api.registry import register_model as _register
    HAVE_LM_EVAL = True
except ImportError as _e:  # pragma: no cover - dependency-gated
    HAVE_LM_EVAL = False
    _IMPORT_ERROR = _e

    class _LM:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise ImportError(
                "lm-eval is not installed; `pip install lm-eval` or use the "
                "built-in scorers in autoawq_tpu.eval.tasks"
            ) from _IMPORT_ERROR

    def _register(*names):
        def deco(cls):
            return cls
        return deco


@_register("autoawq_tpu")
class AwqTpuLM(_LM):
    """lm-eval LM over an AwqCausalLM (or any (cfg, params) pair)."""

    def __init__(self, model, tokenizer, batch_size: int = 1,
                 max_length: int = 2048, method: str = "auto"):
        super().__init__()
        self.model = model
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length
        self.method = method

    # ------------------------------------------------------------ helpers
    def _loglikelihood_tokens(self, context: List[int],
                              continuation: List[int]) -> Tuple[float, bool]:
        import jax
        import jax.numpy as jnp

        from autoawq_tpu.nn import modules

        ids = (context + continuation)[-self.max_length:]
        n_ctx = len(ids) - len(continuation)
        logits = modules.forward(
            self.model.cfg, self.model.params,
            jnp.asarray(np.asarray(ids)[None]), method=self.method)
        logp = np.asarray(
            jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1))
        tgt = np.asarray(ids[n_ctx:])
        rows = np.arange(n_ctx - 1, len(ids) - 1)
        token_logp = logp[rows, tgt]
        greedy = logp[rows].argmax(-1)
        return float(token_logp.sum()), bool((greedy == tgt).all())

    def _encode_pair(self, context: str, continuation: str):
        whole = self.tokenizer.encode(context + continuation)
        ctx = self.tokenizer.encode(context) if context else [
            self.tokenizer.eos_token_id]
        # harness convention: continuation tokens = whole minus the longest
        # matching context prefix
        n = 0
        while n < min(len(ctx), len(whole)) and ctx[n] == whole[n]:
            n += 1
        return whole[:n], whole[n:]

    # --------------------------------------------------------- LM surface
    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        out = []
        for req in requests:
            context, continuation = req.args
            ctx_ids, cont_ids = self._encode_pair(context, continuation)
            out.append(self._loglikelihood_tokens(ctx_ids, cont_ids))
        return out

    def loglikelihood_rolling(self, requests) -> List[float]:
        out = []
        for req in requests:
            (text,) = req.args
            ids = self.tokenizer.encode(text)[: self.max_length]
            ll, _ = self._loglikelihood_tokens(
                [self.tokenizer.eos_token_id], ids)
            out.append(ll)
        return out

    def generate_until(self, requests) -> List[str]:
        from autoawq_tpu.serve import generate as gen

        out = []
        for req in requests:
            context, kwargs = req.args
            until = kwargs.get("until", [])
            max_new = kwargs.get("max_gen_toks", 128)
            ids = self.tokenizer.encode(context)[-self.max_length:]
            import jax.numpy as jnp

            toks = gen.generate(
                self.model.cfg, self.model.params,
                jnp.asarray(np.asarray(ids)[None]), max_new,
                method=self.method, dtype=jnp.bfloat16)
            text = self.tokenizer.decode(np.asarray(toks)[0][len(ids):])
            for stop in until:
                text = text.split(stop)[0]
            out.append(text)
        return out
