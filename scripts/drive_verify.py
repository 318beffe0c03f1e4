"""Round-2 verify drive: core interop, kernel-vs-oracle (incl. sharded TP),
e2e quantize->save->load->generate->ppl, rope_scaling sanity."""
import numpy as np, tempfile, os

def main():
    import jax, jax.numpy as jnp
    rng = np.random.default_rng(0)

    # 1. core quant/pack/interop
    from autoawq_tpu.core.quant import quantize_weight, dequantize_weight
    from autoawq_tpu.core import packing
    w = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))
    q, s, z = quantize_weight(w, bits=4, group_size=128, zero_point=True)
    dq = dequantize_weight(q, s, z)
    err = float(jnp.abs(w - dq).mean())
    assert 0.07 < err < 0.11, err
    awq = packing.planar_to_awq(
        packing.pack_planar(np.asarray(q)),
        packing.pack_planar(np.asarray(z)),
        packing.pad_scales_planar(np.asarray(s)), 512)
    back = packing.dequantize_awq(*awq)
    assert np.abs(back - np.asarray(dq)).max() < 2e-3
    print("1. core quant/pack/interop OK, mean|w-dq| =", round(err, 4))

    # 2. pallas interpret vs jnp (single + sharded col/row)
    from autoawq_tpu.ops.gemm import awq_matmul_jnp
    from autoawq_tpu.ops.pallas_gemm import awq_matmul_pallas
    from autoawq_tpu.config import AwqConfig
    from autoawq_tpu.quantize.quantizer import quantize_linear_params
    p = quantize_linear_params({"kernel": np.asarray(w)*0.05}, AwqConfig())
    x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
    ref = awq_matmul_jnp(x, p["qweight"], p["scales"], p["qzeros"], out_features=512)
    got = awq_matmul_pallas(x, p["qweight"], p["scales"], p["qzeros"],
                            out_features=512, interpret=True)
    assert float(jnp.abs(got - ref).max()) < 2e-4
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from autoawq_tpu.ops.sharded_gemm import awq_matmul_sharded
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "tensor"))
    with mesh:
        for spec, kk, nn in [(P(None, "tensor"), 256, 4096), (P("tensor", None), 4096, 256)]:
            w2 = rng.standard_normal((kk, nn)).astype(np.float32) * 0.05
            p2 = quantize_linear_params({"kernel": w2}, AwqConfig())
            x2 = jnp.asarray(rng.standard_normal((8, kk)).astype(np.float32))
            ref2 = awq_matmul_jnp(x2, p2["qweight"], p2["scales"], p2["qzeros"], out_features=nn)
            args = [jax.device_put(x2, NamedSharding(mesh, P("data", None)))] + [
                jax.device_put(p2[k2], NamedSharding(mesh, spec))
                for k2 in ("qweight", "scales", "qzeros")]
            out = jax.jit(lambda *a: awq_matmul_sharded(*a, out_features=nn, interpret=True))(*args)
            assert float(jnp.abs(out - ref2).max()) < 2e-3, spec
    print("2. pallas kernel (interpret) single + TP col/row OK")

    # 3. (standalone decode-attention kernel deleted in r4 — fused into
    # ops/fused_attn_step.py; see CHIP_AB_R4_RESULTS.json)

    # 4. e2e: quantize tiny llama -> save -> load -> generate -> ppl
    from autoawq_tpu.api import AwqCausalLM, AutoAWQForCausalLM
    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.io.hf import init_random_params
    from autoawq_tpu.io import serialize
    from autoawq_tpu.eval.perplexity import perplexity
    cfg = ModelConfig(model_type="llama", vocab_size=256, hidden_size=128,
                      intermediate_size=256, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=32, max_position_embeddings=64,
                      rope_scaling=(("factor", 2.0), ("rope_type", "linear")))
    params = init_random_params(cfg, seed=0, scale=0.08)
    model = AwqCausalLM(cfg, params)
    stream = rng.integers(0, 256, (2048,))
    ppl_fp = perplexity(cfg, params, stream, seq_len=64, method="jnp")
    calib = rng.integers(0, 256, (4, 32))
    model.quantize(quant_config={"q_group_size": 32},
                   calib_data=[list(r) for r in calib.tolist()], max_calib_seq_len=32,
                   n_parallel_calib_samples=2, offload_taps=True,
                   progress=False)
    with tempfile.TemporaryDirectory() as d:
        model.save_quantized(d)
        m2 = AutoAWQForCausalLM.from_quantized(d)
        assert m2.cfg.rope_scaling == cfg.rope_scaling  # survives round-trip
        out = m2.generate(np.array([[1, 2, 3]]), max_new_tokens=8)
        assert out.shape == (1, 11)
        ppl_q = perplexity(m2.cfg, m2.params, stream, seq_len=64, method="jnp")
    dppl = abs(ppl_q - ppl_fp) / ppl_fp
    assert dppl < 0.05, (ppl_fp, ppl_q)
    print(f"4. e2e quantize->save->load->generate->ppl OK (dppl={dppl:.3%})")
    print("DRIVE VERIFY: ALL OK")

main()
