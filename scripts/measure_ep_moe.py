"""EP MoE dispatch A/B: replicate+psum (ops/sharded_moe.py) vs ragged
all-to-all (ops/moe_a2a.py) on the 8-virtual-device CPU mesh, token counts
512-4096 (VERDICT r2 #9 — turn the documented tradeoff into a measured one).

Two readings per point:
- wall: median wall time of the jitted step on the CPU mesh. CAVEAT: CPU
  collectives are memcpys and the Pallas kernels run interpreted, so wall
  times exaggerate compute differences and understate collective latency;
  they are evidence of dispatch structure, not TPU ICI performance.
- bytes: the analytic per-shard traffic model (activation reads + psum vs
  2x a2a entry rows), which IS the TPU-relevant quantity — ICI-bound at
  prefill, HBM-bound at decode.

Run:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python scripts/measure_ep_moe.py
"""

import json
import time

import numpy as np

H, INTER, E, K = 512, 512, 8, 2
TOKENS = [512, 1024, 2048, 4096]


def main():
    import jax
    import jax.numpy as jnp

    from autoawq_tpu.models.config import ModelConfig
    from autoawq_tpu.nn.fuse import fuse_model
    from autoawq_tpu.ops import moe_a2a, sharded_moe
    from autoawq_tpu.utils.synth import random_quantized_params

    cfg = ModelConfig(
        model_type="mixtral", vocab_size=64, hidden_size=H,
        intermediate_size=INTER, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=2, head_dim=64, num_experts=E,
        num_experts_per_tok=K, max_position_embeddings=32)
    params = fuse_model(cfg, random_quantized_params(cfg, seed=3,
                                                     group_size=128))
    stacked = params["layers"][0]["mlp"]["experts_stacked"]

    d = 8
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:d]), ("expert",))
    rng = np.random.default_rng(0)
    rows = []
    with mesh:
        ssharded = jax.device_put(
            stacked, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("expert")))
        for t in TOKENS:
            x = jnp.asarray(rng.standard_normal((t, H)).astype(np.float32))
            topi = jnp.asarray(rng.integers(0, E, (t, K)).astype(np.int32))
            topw = jax.nn.softmax(jnp.asarray(
                rng.standard_normal((t, K)).astype(np.float32)), -1)

            rep = jax.jit(lambda x, w, i: sharded_moe.moe_mlp_sharded(
                ssharded, x, w, i, "silu", INTER, interpret=True))
            a2a = jax.jit(lambda x, w, i: moe_a2a.moe_mlp_a2a(
                ssharded, x, w, i, "silu", INTER, mesh=mesh,
                capacity_factor=2.0, interpret=True))

            out = {}
            for name, fn in (("replicate_psum", rep), ("a2a", a2a)):
                y = fn(x, topw, topi).block_until_ready()  # compile
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(x, topw, topi).block_until_ready()
                    ts.append(time.perf_counter() - t0)
                out[name] = float(np.median(ts))
                out[f"{name}_sum"] = float(jnp.abs(y).sum())

            # analytic per-shard traffic (bytes, f32 activations):
            # replicate: reads all T*k routed rows (dominant) + psum [T, H]
            # a2a: 2 exchanges of (T/d)*k*cf rows + local (T/d)*k compute
            act = 4 * H
            rep_bytes = t * K * act + t * act  # local reads + psum width
            a2a_bytes = 2 * (t // d) * K * 2.0 * act
            rows.append(dict(
                tokens=t,
                wall_replicate_ms=round(out["replicate_psum"] * 1e3, 2),
                wall_a2a_ms=round(out["a2a"] * 1e3, 2),
                pershard_bytes_replicate=rep_bytes,
                pershard_bytes_a2a=int(a2a_bytes),
                byte_ratio=round(rep_bytes / a2a_bytes, 2),
            ))
            print(rows[-1], flush=True)

    with open("EP_MOE_AB.json", "w") as f:
        json.dump({"config": dict(H=H, inter=INTER, E=E, k=K, shards=d,
                                  capacity_factor=2.0),
                   "caveat": "CPU-mesh walls; bytes model is the "
                             "TPU-relevant quantity",
                   "rows": rows}, f, indent=1)
    print("wrote EP_MOE_AB.json")


if __name__ == "__main__":
    main()
