#!/usr/bin/env python
"""Batch job submission (ref parity: slurm/nbody-sim/submit_job.py —
sbatch wrapper becomes a TPU queued-resource / GKE job emitter).

Emits the job spec; submits via gcloud when --submit is passed and gcloud
is on PATH, otherwise prints it (dry-run default keeps CI hermetic).
"""
from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys


def build_spec(args) -> dict:
    return {
        "name": args.name,
        "accelerator": args.accelerator,
        "zone": args.zone,
        "command": args.command,
        "queued_resource": {
            "tpu": {
                "node_spec": {
                    "parent": f"projects/{args.project}/locations/{args.zone}",
                    "node": {
                        "accelerator_type": args.accelerator,
                        "runtime_version": "tpu-ubuntu2204-base",
                    },
                }
            }
        },
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("command", help="command to run on the TPU VM")
    p.add_argument("--name", default="njw-job")
    p.add_argument("--accelerator", default="v5litepod-8")
    p.add_argument("--zone", default="us-central2-b")
    p.add_argument("--project", default="my-project")
    p.add_argument("--submit", action="store_true")
    args = p.parse_args(argv)

    spec = build_spec(args)
    print(json.dumps(spec, indent=2))
    if args.submit:
        if shutil.which("gcloud") is None:
            print("gcloud not found; dry-run only", file=sys.stderr)
            return 1
        subprocess.run([
            "gcloud", "compute", "tpus", "queued-resources", "create",
            args.name, f"--zone={args.zone}",
            f"--accelerator-type={args.accelerator}",
            "--runtime-version=tpu-ubuntu2204-base", "--node-id", args.name,
        ], check=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
