"""Non-4-bit AWQ: the search/export path is bit-generic (reference
awq/quantize/quantizer.py:86-98 accepts any w_bit) while the packed
kernel layout stays 4-bit-only (reference gemm.py:122 raises the same
way). export_compatible=True at w_bit=3/8 must run the full AWQ search;
packing at those widths must fail loudly."""

import numpy as np
import pytest

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.core.quant import pseudo_quantize_weight
from autoawq_tpu.io.hf import init_random_params
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.quantize.quantizer import AwqQuantizer

CFG = ModelConfig(
    model_type="llama", vocab_size=256, hidden_size=64,
    intermediate_size=128, num_hidden_layers=1, num_attention_heads=4,
    num_key_value_heads=2, head_dim=16, max_position_embeddings=64)


def test_wbit_error_monotone(rng):
    import jax.numpy as jnp

    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    errs = {
        bits: float(abs(np.asarray(
            pseudo_quantize_weight(w, bits=bits, group_size=32) - w)).mean())
        for bits in (2, 3, 4, 8)
    }
    assert errs[8] < errs[4] < errs[3] < errs[2], errs


@pytest.mark.parametrize("bits", [3, 8])
def test_export_compatible_multibit(rng, bits):
    params = init_random_params(CFG, seed=1)
    calib = rng.integers(0, CFG.vocab_size, (2, 16))
    q = AwqQuantizer(CFG, AwqConfig(w_bit=bits, q_group_size=32), params,
                     calib, progress=False)
    out = q.quantize(export_compatible=True)
    lp = out["layers"][0]["self_attn"]["q_proj"]
    assert "kernel" in lp and "qweight" not in lp  # fp weights, scaled
    # the search actually ran: scales were chosen per layer
    assert q.all_scales

    with pytest.raises(ValueError, match="4-bit"):
        q.pack(out)


def test_wbit_out_of_range():
    with pytest.raises(ValueError, match="w_bit"):
        AwqConfig(w_bit=1)
    with pytest.raises(ValueError, match="w_bit"):
        AwqConfig(w_bit=9)


def test_direct_quantize_multibit_raises(rng):
    params = init_random_params(CFG, seed=1)
    calib = rng.integers(0, CFG.vocab_size, (2, 16))
    q = AwqQuantizer(CFG, AwqConfig(w_bit=3, q_group_size=32), params,
                     calib, progress=False)
    with pytest.raises(ValueError, match="4-bit"):
        q.quantize()
