"""The AWQ calibration engine: activation-aware scale search + clip search.

Functional JAX re-implementation of the reference ``AwqQuantizer``
(awq/quantize/quantizer.py:28-704). Differences by design:

* No forward hooks / Catcher hack: the functional decoder records every
  linear's input via ``taps`` (nn/modules.py), and block-to-block activations
  propagate by just calling ``modules.block`` (quantizer.py:556-625 becomes
  one embed call).
* The 20-point scale grid (quantizer.py:368-442) and the 20-step clip shrink
  grid (quantizer.py:495-554) are jitted ``lax.map`` loops — one compiled
  step evaluates the whole grid; jitted searchers are cached per group shape
  so layer 2..N reuse layer-1 compilations.
* Statistics run in fp32 (the reference chunks fp16 tensors through fp32
  accumulators, quantizer.py:329-348, 444-474 — on TPU fp32 is just free).

Semantics preserved: duo-scaling formula, s /= sqrt(max*min) normalization,
per-group weight normalization for w_mean, MSE-vs-fp16-output objective, q/k
exclusion from clipping, 512-token clip sampling, scale/clip application
order, and propagation of *unquantized* block outputs to the next block
(quantizer.py:155-216 captures inputs before scaling the block).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoawq_tpu.config import AwqConfig
from autoawq_tpu.core import packing
from autoawq_tpu.core.quant import pseudo_quantize_weight, quantize_weight
from autoawq_tpu.models.config import ModelConfig
from autoawq_tpu.models.plugins import (
    CLIP_AVOID,
    ScaleGroup,
    get_plugin,
    make_inspect_fn,
)
from autoawq_tpu.io.hf import role_out_features
from autoawq_tpu.nn import modules
from autoawq_tpu.quantize import scale as scale_mod
from autoawq_tpu.utils.tree import get_by_path, set_by_path


def _clone(tree):
    """Clone dict/list structure, sharing array leaves."""
    if isinstance(tree, dict):
        return {k: _clone(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_clone(v) for v in tree]
    return tree


def quantize_linear_params(p: Dict[str, Any], qcfg: AwqConfig) -> Dict[str, Any]:
    """fp LIN -> packed planar quantized LIN (host-side packing)."""
    if qcfg.w_bit != 4:
        raise ValueError(
            f"packed kernels are 4-bit only (got w_bit={qcfg.w_bit}); "
            "run quantize(export_compatible=True) and pack externally "
            "(reference parity: awq/modules/linear/gemm.py:122)")
    from autoawq_tpu.ops.gemm import (pack_planar_jnp, pad_k_nibbles_jnp,
                                      pad_scales_jnp)

    w = jnp.asarray(p["kernel"])
    q, s, z = quantize_weight(
        w, bits=qcfg.w_bit, group_size=qcfg.q_group_size,
        zero_point=qcfg.zero_point,
    )
    # K not a multiple of 2*group (falcon-7b h=4544 @ g64): zero-pad K for
    # the fused kernel's even-group blocking (exact; save strips it back).
    # Everything stays ON DEVICE (jnp pack, bit-identical to the host
    # packer): fetching nibble tensors for host packing cost ~1 GB/layer
    # of tunnel traffic at 7B and dominated quantization wall-clock.
    gs = qcfg.q_group_size if qcfg.q_group_size > 0 else int(q.shape[0])
    q4, s4, z4 = pad_k_nibbles_jnp(q, s, z, group_size=gs)
    out = {
        "qweight": pack_planar_jnp(q4),
        "scales": pad_scales_jnp(s4),
    }
    if z4 is not None:
        out["qzeros"] = pack_planar_jnp(z4)
    # symmetric (zero_point=False): omit qzeros — the kernels use the
    # constant mid-range zero-point 8 (Marlin-parity fast path)
    if p.get("bias") is not None:
        out["bias"] = p["bias"]
    return out


class AwqQuantizer:
    def __init__(
        self,
        cfg: ModelConfig,
        qcfg: AwqConfig,
        params: Dict[str, Any],
        calib_tokens: Optional[np.ndarray],  # [n_samples, seq_len]
        *,
        calib_inputs: Optional[np.ndarray] = None,  # [n, s, h] embeds
        calib_rope: Optional[Tuple] = None,  # (cos, sin) override
        duo_scaling: bool = True,
        apply_clip: bool = True,
        n_grid: int = 20,
        max_clip_shrink: float = 0.5,
        n_clip_sample_tokens: int = 512,
        compute_dtype=jnp.float32,
        weight_dtype=None,
        progress: bool = True,
        resume_dir: Optional[str] = None,
        n_parallel_calib_samples: Optional[int] = None,
        offload_taps: bool = False,
        max_chunk_memory: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        quantize_lm_head: bool = False,
        keep_on_device: bool = False,
    ):
        self.cfg = cfg
        self.qcfg = qcfg
        self.params = params
        # multimodal calibration (reference recipe: a custom quantizer
        # whose calib forward carries image features spliced at the
        # image-token positions, docs/examples.md:267-420): instead of
        # token ids, accept PRECOMPUTED input embeds [n, s, h] (vision
        # features already spliced) plus the matching rope tables (M-RoPE
        # for qwen2-vl) — the tapped block loop is modality-agnostic.
        self.calib_inputs = (np.asarray(calib_inputs)
                             if calib_inputs is not None else None)
        self.calib_rope = calib_rope
        if calib_tokens is None and calib_inputs is None:
            raise ValueError("need calib_tokens or calib_inputs")
        self.calib_tokens = (np.asarray(calib_tokens)
                             if calib_tokens is not None else None)
        self.duo_scaling = duo_scaling
        self.do_clip = apply_clip
        self.n_grid = n_grid
        self.max_clip_shrink = max_clip_shrink
        self.n_clip_sample_tokens = n_clip_sample_tokens
        self.compute_dtype = compute_dtype
        # weight_dtype=bf16 halves the per-layer host->device weight
        # upload (the reference calibrates fp16 weights on GPU, so bf16
        # search inputs are parity-in-spirit); scale/clip statistics and
        # the quantize math stay f32 internally either way. None = f32.
        self.weight_dtype = weight_dtype
        # keep_on_device=True leaves each finished layer's packed result
        # as device arrays instead of device_get-ing it (the packed body
        # is ~115 MB/layer at 7B — minutes of tunnel download across 32
        # layers when the chip is remote). Incompatible with resume_dir
        # (checkpoints need host arrays).
        self.keep_on_device = keep_on_device
        if keep_on_device and resume_dir:
            raise ValueError("keep_on_device=True cannot checkpoint "
                             "(resume_dir needs host arrays)")
        self.progress = progress
        self.resume_dir = resume_dir
        # memory choreography for big-model calibration on one chip
        # (reference: n_parallel_calib_samples sample chunking,
        # awq/quantize/quantizer.py:268-292, and CPU offload of input
        # features, quantizer.py:631). Model params already stream
        # layer-by-layer: self.params stays host-resident and only layer i
        # is uploaded (quantize() below), the third leg of the reference's
        # choreography.
        self.n_parallel = n_parallel_calib_samples
        self.offload_taps = offload_taps
        # byte budget for the fp32 statistics intermediates — the direct
        # analogue of the reference's max_chunk_memory
        # (awq/quantize/quantizer.py:329-348 chunks the x_mean sums,
        # :444-474 the clip-search MSE buffers). Here it bounds (a) the
        # token-chunk size of the |x| channel-mean accumulation and
        # (b) the clip search's out-channel chunk width so its
        # [T', K/g, nc] org/cur fp32 buffers fit. None = single pass
        # (XLA fuses most of these anyway; the knob exists for truly
        # huge layers where even the fused buffers exceed HBM).
        self.max_chunk_memory = max_chunk_memory
        # opt-in: the reference (and AWQ generally) leaves lm_head fp16 —
        # but at bs1 decode the bf16 lm_head matvec is ~10-20% of the
        # weight stream (h*V*2 bytes vs the int4 body). Clip-searched
        # int4 lm_head (calibrated on the final-norm activations) trades
        # a small logit perturbation for that bandwidth. Tied-embedding
        # models skip it (quantizing would corrupt the input embedding).
        self.quantize_lm_head = quantize_lm_head
        # data-parallel calibration (SURVEY §2.6: the TPU-native replacement
        # for the reference's round-robin layer placement,
        # awq/quantize/quantizer.py:130-138): shard the calib batch over the
        # mesh's ``data`` axis; GSPMD turns the batch reductions inside the
        # jitted block forwards and scale/clip grid searches (x_mean, MSE)
        # into psums over ICI — no other code changes.
        self.mesh = mesh
        self._ddp = int(mesh.shape.get("data", 1)) if mesh is not None else 1
        n_calib = len(self.calib_tokens if self.calib_tokens is not None
                      else self.calib_inputs)
        if self._ddp > 1 and n_calib % self._ddp:
            import logging

            logging.getLogger(__name__).warning(
                "calib sample count %d not divisible by data axis %d; "
                "calibration runs replicated",
                n_calib, self._ddp)
            self.mesh, self._ddp = None, 1
        self.plugin = get_plugin(cfg.model_type)
        self._skip = tuple(qcfg.modules_to_not_convert or ())
        self.out_features_map = role_out_features(cfg)
        self._search_cache: Dict[Any, Any] = {}
        # recorded per-layer artifacts (for introspection / resume)
        self.all_scales: List[List[Tuple[ScaleGroup, np.ndarray]]] = []
        self.all_clips: List[List[Tuple[str, np.ndarray]]] = []

    # ------------------------------------------------------------------ #

    def quantize(self, export_compatible: bool = False) -> Dict[str, Any]:
        """Run AWQ over all layers; returns the new param pytree.

        export_compatible=True leaves scaled+clipped fp weights in place
        (reference base.py:156-161); call :meth:`pack` afterwards.
        """
        if not export_compatible and self.qcfg.w_bit != 4:
            # fail FAST: without this the error would only surface from
            # quantize_linear_params after layer 0's full calibration +
            # grid search — minutes to hours wasted on a big model
            raise ValueError(
                f"packed kernels are 4-bit only (w_bit={self.qcfg.w_bit}); "
                "use quantize(export_compatible=True) and pack externally")
        cfg = self.cfg
        if self.calib_inputs is not None:
            # precomputed (e.g. vision-spliced) input embeds
            x = self._shard_batch(
                jnp.asarray(self.calib_inputs).astype(self.compute_dtype))
            s = x.shape[1]
            positions = jnp.arange(s)[None, :]
        else:
            tokens = self._shard_batch(jnp.asarray(self.calib_tokens))
            emb = self._replicate({
                k: _to_jnp(self.params[k])
                for k in ("embed_tokens", "embed_positions", "embed_ln")
                if k in self.params
            })
            s = tokens.shape[1]
            positions = jnp.arange(s)[None, :]
            x = modules.embed(cfg, emb, tokens, dtype=self.compute_dtype,
                              positions=positions)
        if self.calib_rope is not None:
            cos, sin = (jnp.asarray(self.calib_rope[0]),
                        jnp.asarray(self.calib_rope[1]))
        else:
            cos, sin = modules.rope_tables(cfg, positions, seq_len=s)
        mask = modules.causal_mask(s, sliding_window=cfg.sliding_window)
        if cfg.pos_embed == "alibi":
            mask = mask + modules.alibi_bias(cfg.num_attention_heads,
                                             jnp.arange(s), jnp.arange(s))
        cos, sin, mask = self._replicate((cos, sin, mask))

        new_layers = []
        iterator = range(cfg.num_hidden_layers)
        if self.progress:
            try:
                from tqdm import tqdm

                iterator = tqdm(iterator, desc="AWQ", unit="layer")
            except ImportError:
                pass
        for i in iterator:
            # per-layer resume: the AWQ loop is per-block, so a crashed
            # 70B-class calibration restarts from the last finished layer
            # (the reference has no mid-quantization resume, SURVEY §5)
            ck = self._resume_path(i)
            if ck is not None and os.path.exists(ck):
                lp, x = _load_layer_ckpt(ck)
                x = self._shard_batch(x)
                new_layers.append(lp)
                continue
            lp = self._replicate(_to_jnp(self.params["layers"][i],
                                         self.weight_dtype))
            # [1] capture per-linear inputs + propagate fp activations
            taps: Dict[str, jax.Array] = {}
            next_x, _ = self._block_tapped(lp, x, cos, sin, mask, taps)
            # [2] scale search + fold
            layer_scales = []
            for group in self.plugin.scale_groups(cfg, lp):
                scales = self._search_best_scale(lp, group, taps, cos, sin, mask)
                scale_mod.apply_scale(lp, group, scales, taps,
                                      norm_offset=cfg.norm_offset)
                layer_scales.append((group, np.asarray(scales)))
            self.all_scales.append(layer_scales)
            # [3] clip search + clamp
            layer_clips = []
            if self.do_clip:
                avoid = CLIP_AVOID + getattr(self.plugin, "extra_clip_avoid", ())
                for path in self._quantizable(lp):
                    if any(a in path for a in avoid):
                        continue
                    if path not in taps:
                        continue
                    inp = taps[path]
                    w = get_by_path(lp, path)["kernel"]
                    max_val = self._search_best_clip(w, inp)
                    scale_mod.apply_clip(lp, path, max_val)
                    layer_clips.append((path, np.asarray(max_val)))
            self.all_clips.append(layer_clips)
            taps.clear()  # searches done: release the tap set (~3.5 GB at
            # 7B) before packing allocates its nibble intermediates
            # [4] quantize + pack
            if not export_compatible:
                for path in self._quantizable(lp):
                    set_by_path(lp, path,
                                quantize_linear_params(get_by_path(lp, path),
                                                       self.qcfg))
            lp_host = lp if self.keep_on_device else jax.device_get(lp)
            new_layers.append(lp_host)
            x = next_x
            ck = self._resume_path(i)
            if ck is not None:
                _save_layer_ckpt(ck, lp_host, jax.device_get(x))

        out = _clone(self.params)
        out["layers"] = new_layers
        if (self.quantize_lm_head and not export_compatible
                and self.params.get("lm_head") is not None):
            # x is the post-last-layer activation stream; the lm_head's
            # true calibration input is the final-norm output of it
            head = {"lm_head": self._replicate(_to_jnp(self.params["lm_head"]))}
            hin = modules.norm(
                cfg, self._replicate(_to_jnp(self.params["norm"])), x)
            if self.do_clip:
                mv = self._search_best_clip(head["lm_head"]["kernel"], hin)
                scale_mod.apply_clip(head, "lm_head", mv)
                self.all_clips.append([("lm_head", np.asarray(mv))])
            out["lm_head"] = jax.device_get(
                quantize_linear_params(head["lm_head"], self.qcfg))
        return out

    def pack(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Pack an export_compatible result (deferred packing,
        reference base.py:250-268)."""
        out = _clone(params)
        for i, lp in enumerate(out["layers"]):
            for path in self._quantizable(lp):
                p = get_by_path(lp, path)
                if "kernel" in p:
                    set_by_path(lp, path, quantize_linear_params(p, self.qcfg))
        return out

    # ------------------------------------------------------------------ #

    def _shard_batch(self, x):
        """Place a batch-leading array on the mesh, sharded over ``data``."""
        if self.mesh is None or self._ddp == 1:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P("data", *(None,) * (np.ndim(x) - 1))
        return jax.device_put(jnp.asarray(x), NamedSharding(self.mesh, spec))

    def _replicate(self, tree):
        """Replicate weights/tables on the mesh (no-op without one)."""
        if self.mesh is None or self._ddp == 1:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), rep), tree)

    def _chunk_size(self, b: int) -> Optional[int]:
        """Largest divisor of the sample count <= n_parallel_calib_samples
        (None = no chunking). Divisor-rounding keeps chunk shapes static;
        under data-parallel calibration chunks must also split evenly over
        the ``data`` axis."""
        c = self.n_parallel
        if not c or c >= b:
            return None
        c = max(1, min(c, b))
        while b % c or c % self._ddp:
            c -= 1
            if c < self._ddp:
                return None
        return c

    def _block_tapped(self, lp, x, cos, sin, mask, taps: Dict):
        """Tapped block forward; returns (next_x, taps-filled).

        With ``n_parallel_calib_samples`` the batch runs through the jitted
        block in sample chunks (reference: _module_forward,
        awq/quantize/quantizer.py:268-292); with ``offload_taps`` each
        chunk's captured inputs move to host immediately, so device memory
        holds one block's weights + one chunk of activations instead of
        every linear's full input features (reference offload:
        quantizer.py:631)."""
        key = ("block", x.shape)
        if key not in self._search_cache:
            def f(lp, x, cos, sin, mask):
                t: Dict[str, jax.Array] = {}
                y, _ = modules.block(self.cfg, lp, x, cos, sin, mask,
                                     taps=t, method="jnp")
                return y, t

            self._search_cache[key] = jax.jit(f)

        b = x.shape[0]
        c = self._chunk_size(b)
        if c is None:
            y, t = self._search_cache[key](lp, x, cos, sin, mask)
            if self.offload_taps:
                t = jax.device_get(t)
            taps.update(t)
            return y, taps

        ys, chunk_taps = [], []  # jit retraces once for the chunk shape
        for lo in range(0, b, c):
            yc, tc = self._search_cache[key](lp, x[lo:lo + c], cos, sin, mask)
            ys.append(yc)
            chunk_taps.append(jax.device_get(tc) if self.offload_taps else tc)
        y = jnp.concatenate(ys, axis=0)
        cat = np.concatenate if self.offload_taps else jnp.concatenate
        # concatenate ONE tap at a time, releasing its chunk pieces as we
        # go — cat-ing all taps while every chunk piece stays referenced
        # doubles the whole tap set's footprint (~7 GB at 7B x 128x512,
        # the difference between fitting a 16 GB chip and OOM)
        for name in list(chunk_taps[0]):
            taps[name] = cat([tc.pop(name) for tc in chunk_taps], axis=0)
        return y, taps

    def _search_best_scale(self, lp, group: ScaleGroup, taps, cos, sin, mask):
        inp = taps.get(group.inp)
        if inp is None:
            raise KeyError(f"tap {group.inp} missing; have {list(taps)}")
        inp = self._shard_batch(inp)  # host tap (offload_taps) -> device
        key = ("scale", group, inp.shape)
        if key not in self._search_cache:
            inspect = make_inspect_fn(self.cfg, group, self.out_features_map)
            qz, g, bits = self.qcfg.zero_point, self.qcfg.q_group_size, self.qcfg.w_bit
            duo, n_grid = self.duo_scaling, self.n_grid
            c = self._chunk_size(inp.shape[0]) if inp.ndim >= 3 else None

            def chunked_inspect(lp_, x_, cos, sin, mask):
                """module2inspect forward in sample chunks (lax.map runs
                chunks sequentially, bounding attention/MLP intermediates
                — reference quantizer.py:268-292)."""
                if c is None:
                    return inspect(lp_, x_, cos, sin, mask)
                xc = x_.reshape(x_.shape[0] // c, c, *x_.shape[1:])
                out = jax.lax.map(
                    lambda z: inspect(lp_, z, cos, sin, mask), xc)
                return out.reshape(x_.shape[0], *out.shape[2:])

            def search(lp, inp, cos, sin, mask):
                layers = [get_by_path(lp, p) for p in group.layers]
                w_cat = jnp.concatenate(
                    [l["kernel"].astype(jnp.float32) for l in layers], axis=1
                )  # [K, N_sum]
                k = w_cat.shape[0]
                gs = g if g > 0 else k
                # per-group-normalized |w| channel mean (quantizer.py:314-327)
                wg = jnp.abs(w_cat).reshape(k // gs, gs, -1)
                wg = wg / (wg.max(axis=1, keepdims=True) + 1e-6)
                w_mean = wg.reshape(k, -1).mean(axis=1)
                flat = inp.reshape(-1, k)
                t_tot = flat.shape[0]
                rows = (t_tot if self.max_chunk_memory is None
                        else max(1, self.max_chunk_memory // (4 * k)))
                if rows >= t_tot:
                    x_mean = jnp.abs(flat.astype(jnp.float32)).mean(0)
                else:
                    # byte-budgeted accumulation (reference
                    # max_chunk_memory, quantizer.py:329-348): sum of
                    # chunk sums / total — identical result, bounded
                    # fp32 intermediates
                    acc = jnp.zeros((k,), jnp.float32)
                    for s0 in range(0, t_tot, rows):
                        acc = acc + jnp.abs(
                            flat[s0:s0 + rows].astype(jnp.float32)).sum(0)
                    x_mean = acc / t_tot
                fp_out = chunked_inspect(lp, inp, cos, sin, mask).astype(
                    jnp.float32)

                def compute_scales(ratio):
                    if duo:
                        s = jnp.clip(
                            x_mean**ratio / (w_mean ** (1 - ratio) + 1e-4),
                            min=1e-4,
                        )
                    else:
                        s = jnp.clip(x_mean**ratio, min=1e-4)
                    s = s / jnp.sqrt(s.max() * s.min())
                    return jnp.where(jnp.isfinite(s), s, 1.0)

                def eval_ratio(ratio):
                    s = compute_scales(ratio)
                    lp2 = _clone(lp)
                    for path in group.layers:
                        fc = get_by_path(lp2, path)
                        w2 = fc["kernel"].astype(jnp.float32) * s[:, None]
                        w2 = pseudo_quantize_weight(
                            w2, bits=bits, group_size=g, zero_point=qz
                        ) / s[:, None]
                        fc = dict(fc)
                        fc["kernel"] = w2.astype(inp.dtype)
                        set_by_path(lp2, path, fc)
                    out = chunked_inspect(lp2, inp, cos, sin, mask).astype(
                        jnp.float32)
                    return jnp.mean((fp_out - out) ** 2)

                ratios = jnp.arange(n_grid, dtype=jnp.float32) / n_grid
                losses = jax.lax.map(eval_ratio, ratios)
                best = jnp.nanargmin(losses)
                return compute_scales(ratios[best]), losses

            self._search_cache[key] = jax.jit(search)
        scales, _losses = self._search_cache[key](lp, inp, cos, sin, mask)
        return scales

    def _search_best_clip(self, w: jax.Array, inp: jax.Array) -> jax.Array:
        inp = self._shard_batch(inp)  # host tap (offload_taps) -> device
        k, n = w.shape
        key = ("clip", w.shape, inp.shape)
        if key not in self._search_cache:
            g = self.qcfg.q_group_size if self.qcfg.q_group_size > 0 else k
            bits, qz = self.qcfg.w_bit, self.qcfg.zero_point
            n_steps = int(self.max_clip_shrink * self.n_grid)
            n_chunk = 256 if n % 256 == 0 else (64 if n % 64 == 0 else n)
            t_total = int(np.prod(inp.shape[:-1]))
            step = max(1, t_total // self.n_clip_sample_tokens)
            if self.max_chunk_memory is not None:
                # bound the out-channel chunk so the search's two
                # [T', K/g, nc] fp32 buffers fit the byte budget
                # (reference max_chunk_memory, quantizer.py:444-474)
                t_eff = -(-t_total // step)
                nc_max = max(1, self.max_chunk_memory
                             // (8 * t_eff * max(k // g, 1)))
                cand = [c for c in (256, 128, 64, 32, 16, 8, 4, 2, 1)
                        if n % c == 0 and c <= min(nc_max, n_chunk)]
                if cand:
                    n_chunk = cand[0]

            def search(w, inp):
                x = inp.astype(jnp.float32).reshape(-1, k)[::step]  # [T', K]
                xg = x.reshape(x.shape[0], k // g, g)

                def one_chunk(wc):  # wc [K, n_chunk]
                    wgrp = wc.astype(jnp.float32).reshape(k // g, g, -1)
                    org_max = jnp.abs(wgrp).max(axis=1)  # [K/g, nc]
                    org_out = jnp.einsum("tkg,kgn->tkn", xg, wgrp)
                    best_max = org_max
                    min_err = jnp.full_like(org_max, 1e9)
                    for i_s in range(n_steps):
                        mv = org_max * (1 - i_s / self.n_grid)  # [K/g, nc]
                        cur = jnp.clip(wgrp, -mv[:, None, :], mv[:, None, :])
                        qw = pseudo_quantize_weight(
                            cur.reshape(k, -1), bits=bits, group_size=g,
                            zero_point=qz,
                        ).reshape(k // g, g, -1)
                        cur_out = jnp.einsum("tkg,kgn->tkn", xg, qw)
                        err = ((cur_out - org_out) ** 2).mean(axis=0)  # [K/g, nc]
                        better = err < min_err
                        min_err = jnp.where(better, err, min_err)
                        best_max = jnp.where(better, mv, best_max)
                    return best_max

                chunks = w.reshape(k, n // n_chunk, n_chunk)
                best = jax.lax.map(one_chunk, jnp.moveaxis(chunks, 1, 0))
                return jnp.moveaxis(best, 0, 1).reshape(k // g, n)

            self._search_cache[key] = jax.jit(search)
        return self._search_cache[key](w, inp)


    def _quantizable(self, lp) -> List[str]:
        """Plugin's quantizable paths minus modules_to_not_convert
        (reference: awq/utils/module.py:56 exclude_layers_to_not_quantize)."""
        return [
            path for path in self.plugin.quantizable(self.cfg, lp)
            if not any(skip in path for skip in self._skip)
        ]

    def _resume_path(self, layer: int) -> Optional[str]:
        if self.resume_dir is None:
            return None
        os.makedirs(self.resume_dir, exist_ok=True)
        return os.path.join(self.resume_dir, f"layer_{layer:04d}.npz")


def _save_layer_ckpt(path: str, lp, x) -> None:
    flat: Dict[str, np.ndarray] = {"__x__": np.asarray(x)}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}")
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}/#{i}")
        elif tree is not None:
            flat[prefix] = np.asarray(tree)

    walk(lp, "p")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def _load_layer_ckpt(path: str):
    data = np.load(path)
    x = jnp.asarray(data["__x__"])
    tree: Dict = {}
    for key in data.files:
        if key == "__x__":
            continue
        parts = key.split("/")[1:]
        node = tree
        for i, p in enumerate(parts[:-1]):
            child_is_list = parts[i + 1].startswith("#")
            if p.startswith("#"):
                idx = int(p[1:])
                while len(node) <= idx:
                    node.append([] if child_is_list else {})
                node = node[idx]
            else:
                if p not in node:
                    node[p] = [] if child_is_list else {}
                node = node[p]
        node[parts[-1]] = data[key]
    return tree, x


def _to_jnp(tree, weight_dtype=None):
    if weight_dtype is None:
        return jax.tree_util.tree_map(jnp.asarray, tree)

    def conv(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(weight_dtype)
        return x

    return jax.tree_util.tree_map(conv, tree)
