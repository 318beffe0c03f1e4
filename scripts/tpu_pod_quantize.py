"""Quantize a model on a Cloud TPU pod slice — create, run, fetch, delete.

TPU-native analogue of the reference's cloud orchestration
(/root/reference/scripts/runpod_quantize.py: create a RunPod GPU pod,
install, quantize, upload). Here the accelerator is a TPU pod slice and
the quantization itself is the multi-host path this framework ships:
``jax.distributed`` bootstrap + a hybrid ICI/DCN mesh
(parallel/distributed.py) with the calibration batch data-parallel over
all hosts (quantize/quantizer.py ``mesh=``).

Two modes:

* ``--launch`` (runs on your workstation): prints/executes the gcloud
  commands that create the slice, push this repo, run the worker on every
  host, fetch the quantized checkpoint, and delete the slice.
  ``--dry-run`` prints the commands without executing (also what the unit
  test checks).
* ``--worker`` (runs on every TPU VM host, via ``gcloud ... ssh
  --worker=all``): initializes jax.distributed, builds the hybrid mesh,
  quantizes with DP calibration, and saves on host 0.

Example:
  python scripts/tpu_pod_quantize.py --launch \
      --model meta-llama/Llama-2-7b-hf --out llama2-7b-awq \
      --tpu-name awq-quant --accelerator v5litepod-16 --zone us-east5-b
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys

REPO_TAR = "/tmp/autoawq_tpu.tar.gz"


def launch_commands(args) -> list:
    """The gcloud command sequence (returned, not run, so tests and
    --dry-run can inspect it)."""
    ssh = (f"gcloud compute tpus tpu-vm ssh {args.tpu_name} "
           f"--zone={args.zone} --worker=all --command=")
    worker_cmd = (
        f"cd ~/autoawq_tpu && python scripts/tpu_pod_quantize.py --worker "
        f"--model {shlex.quote(args.model)} --out {shlex.quote(args.out)} "
        f"--w-bit {args.w_bit} --group-size {args.group_size} "
        f"--tensor {args.tensor} --calib-samples {args.calib_samples}")
    return [
        # 1. create the slice (queued resources API for pod slices)
        f"gcloud compute tpus tpu-vm create {args.tpu_name} "
        f"--zone={args.zone} --accelerator-type={args.accelerator} "
        f"--version={args.runtime_version}",
        # 2. ship this framework to every host
        f"tar czf {REPO_TAR} --exclude .git -C {args.repo_root} .",
        f"gcloud compute tpus tpu-vm scp {REPO_TAR} {args.tpu_name}:~ "
        f"--zone={args.zone} --worker=all",
        ssh + shlex.quote(
            "mkdir -p ~/autoawq_tpu && tar xzf ~/autoawq_tpu.tar.gz "
            "-C ~/autoawq_tpu && pip install -q jax[tpu] transformers "
            "safetensors datasets"),
        # 3. run the worker entry on EVERY host simultaneously —
        # jax.distributed auto-discovers coordinator/rank on TPU VMs
        ssh + shlex.quote(worker_cmd),
        # 4. fetch the checkpoint from host 0
        f"gcloud compute tpus tpu-vm scp --recurse "
        f"{args.tpu_name}:~/autoawq_tpu/{args.out} . --zone={args.zone} "
        f"--worker=0",
        # 5. tear down
        f"gcloud compute tpus tpu-vm delete {args.tpu_name} "
        f"--zone={args.zone} --quiet",
    ]


def run_worker(args) -> None:
    """Per-host entry: multi-host quantize with DP calibration."""
    import jax

    from autoawq_tpu.api import AutoAWQForCausalLM
    from autoawq_tpu.config import AwqConfig
    from autoawq_tpu.parallel import distributed

    distributed.initialize()  # no-op args: TPU pod auto-discovery
    mesh = distributed.hybrid_mesh(tensor=args.tensor)
    print(f"[host {jax.process_index()}/{jax.process_count()}] "
          f"mesh={dict(mesh.shape)}", flush=True)

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.model)
    model = AutoAWQForCausalLM.from_pretrained(args.model)
    model.quantize(
        tok,
        quant_config=AwqConfig(w_bit=args.w_bit,
                               q_group_size=args.group_size),
        max_calib_samples=args.calib_samples,
        mesh=mesh,  # calibration batch sharded over every chip in the pod
    )
    if jax.process_index() == 0:
        model.save_quantized(args.out)
        tok.save_pretrained(args.out)
        print(f"saved -> {args.out}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--launch", action="store_true")
    mode.add_argument("--worker", action="store_true")
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--w-bit", type=int, default=4)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--calib-samples", type=int, default=128)
    ap.add_argument("--tensor", type=int, default=1,
                    help="TP degree within each slice (ICI)")
    ap.add_argument("--tpu-name", default="awq-quant")
    ap.add_argument("--zone", default="us-east5-b")
    ap.add_argument("--accelerator", default="v5litepod-16")
    ap.add_argument("--runtime-version", default="tpu-ubuntu2204-base")
    ap.add_argument("--repo-root", default=".")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    if args.worker:
        run_worker(args)
        return

    cmds = launch_commands(args)
    for c in cmds:
        print(f"$ {c}")
        if not args.dry_run:
            subprocess.run(c, shell=True, check=True)


if __name__ == "__main__":
    sys.exit(main())
