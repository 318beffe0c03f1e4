"""Shared fixtures. The CPU-mesh environment swap happens earlier, in the
``autoawq_tpu._testenv`` plugin loaded via addopts (see that module's
docstring for why it cannot live here)."""

import jax
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def requires_multidevice():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")


# ---- two-tier suite: the files whose suites dominate wall-clock carry
# the `slow` marker (measured via --durations=50, r4); the fast tier
# (`-m "not slow"`) keeps a broad kernel/quant/serving signal < 5 min.
_SLOW_FILES = {
    "test_arch_parity.py", "test_audio.py", "test_batching.py",
    "test_beam.py", "test_e2e.py", "test_fused_attn_step.py",
    "test_interop_layouts.py", "test_kv_quant.py",
    "test_lm_head_quant.py", "test_mla_latent.py", "test_moe_a2a.py",
    "test_moe_gemm.py", "test_multibit.py", "test_multimodal.py",
    "test_paged.py", "test_paged_attn.py", "test_parallel.py",
    "test_pipeline.py", "test_quantize_archs.py", "test_quantizer.py",
    "test_qwen_vl.py", "test_reference_oracle.py", "test_server.py",
    "test_sharded_mlp.py", "test_spec_batch.py", "test_speculative.py",
    "test_talker.py", "test_token2wav.py", "test_tp_attn.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
