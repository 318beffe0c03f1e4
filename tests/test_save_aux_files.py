"""save_quantized carries tokenizer / processor / generation_config files
from the source checkpoint so the output dir is drop-in for HF pipelines
(reference: awq/models/base.py:294-301 — the processor is saved for vision
models; HF's save_pretrained writes tokenizer + generation_config). Without
this, AutoTokenizer.from_pretrained(quantized_dir) fails and users must
hand-copy files (round-4 VERDICT missing #4)."""

import json

import numpy as np
import pytest
from safetensors.numpy import save_file

from autoawq_tpu import AwqCausalLM
from autoawq_tpu.io import serialize
from autoawq_tpu.io.hf import (init_random_params, role_out_features,
                               state_dict_from_params)
from autoawq_tpu.models.config import ModelConfig

CFG = ModelConfig(model_type="llama", vocab_size=64, hidden_size=64,
                  intermediate_size=128, num_hidden_layers=1,
                  num_attention_heads=4, num_key_value_heads=2,
                  max_position_embeddings=32)

AUX = {
    "tokenizer.json": '{"version": "1.0"}',
    "tokenizer_config.json": '{"model_max_length": 32}',
    "special_tokens_map.json": '{"eos_token": "</s>"}',
    "tokenizer.model": "spm-binary-stand-in",
    "preprocessor_config.json": '{"image_mean": [0.5, 0.5, 0.5]}',
    "chat_template.jinja": "{{ messages }}",
}


def _fp_src(tmp_path, rng, with_gen_cfg: bool):
    src = tmp_path / "fp"
    src.mkdir()
    raw = CFG.to_hf_dict()
    raw["bos_token_id"] = 1
    raw["eos_token_id"] = 2
    with open(src / "config.json", "w") as f:
        json.dump(raw, f)
    params = init_random_params(CFG, seed=0)
    sd = state_dict_from_params(CFG, params, role_out_features(CFG),
                                dtype=np.float32)
    save_file(sd, str(src / "model.safetensors"))
    for name, body in AUX.items():
        (src / name).write_text(body)
    if with_gen_cfg:
        (src / "generation_config.json").write_text(
            '{"eos_token_id": 2, "do_sample": true}')
    return src


def _quantize_save(src, out, rng):
    m = AwqCausalLM.from_pretrained(str(src))
    calib = [list(r) for r in rng.integers(0, 64, (2, 16)).tolist()]
    m.quantize(quant_config={"q_group_size": 32}, calib_data=calib,
               max_calib_seq_len=16, progress=False)
    m.save_quantized(str(out))


def test_aux_files_copied(tmp_path, rng):
    src = _fp_src(tmp_path, rng, with_gen_cfg=True)
    out = tmp_path / "q"
    _quantize_save(src, out, rng)
    for name, body in AUX.items():
        assert (out / name).exists(), name
        assert (out / name).read_text() == body
    # source generation_config is copied verbatim, not synthesized over
    gen = json.loads((out / "generation_config.json").read_text())
    assert gen == {"eos_token_id": 2, "do_sample": True}
    # model weights + config untouched by the aux copy
    assert (out / "model.safetensors").exists()
    cfg = json.loads((out / "config.json").read_text())
    assert "quantization_config" in cfg
    # and the result still loads through the public API
    m = AwqCausalLM.from_quantized(str(out))
    assert m.quant_config is not None


def test_generation_config_synthesized(tmp_path, rng):
    src = _fp_src(tmp_path, rng, with_gen_cfg=False)
    out = tmp_path / "q"
    _quantize_save(src, out, rng)
    gen = json.loads((out / "generation_config.json").read_text())
    assert gen == {"bos_token_id": 1, "eos_token_id": 2}


def test_copy_aux_files_no_source(tmp_path):
    # direct-constructed models (no from_pretrained) have no source dir;
    # save must still work and simply skip the copy
    out = tmp_path / "o"
    out.mkdir()
    assert serialize.copy_aux_files(None, str(out)) == []
    assert list(out.iterdir()) == []


def test_copy_aux_files_same_dir(tmp_path):
    d = tmp_path / "d"
    d.mkdir()
    (d / "tokenizer.json").write_text("{}")
    # in-place save (src == dst) must not try to copy onto itself
    copied = serialize.copy_aux_files(str(d), str(d))
    assert copied == []
    assert (d / "tokenizer.json").read_text() == "{}"


def test_transformers_ecosystem_loads_saved_dir(tmp_path, rng):
    """The reference's saved dirs work with AutoTokenizer/AutoConfig out of
    the box (HF save_pretrained writes tokenizer files alongside;
    base.py:294-301). Ours must too: build a REAL (minimal) fast
    tokenizer, quantize+save, then load the saved dir through
    transformers' AutoTokenizer + AutoConfig with zero manual copying."""
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    src = _fp_src(tmp_path, rng, with_gen_cfg=True)
    vocab = {f"w{i}": i for i in range(60)}
    vocab["[UNK]"] = 60
    tk = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tk.pre_tokenizer = Whitespace()
    tk.save(str(src / "tokenizer.json"))
    (src / "tokenizer_config.json").write_text(
        '{"tokenizer_class": "PreTrainedTokenizerFast"}')

    out = tmp_path / "q"
    _quantize_save(src, out, rng)

    tok = transformers.AutoTokenizer.from_pretrained(str(out))
    assert tok("w1 w2")["input_ids"] == [1, 2]
    cfg = transformers.AutoConfig.from_pretrained(str(out))
    assert cfg.model_type == "llama"
    assert cfg.quantization_config["quant_method"] == "awq"
    gen = transformers.GenerationConfig.from_pretrained(str(out))
    assert gen.eos_token_id == 2
