#!/usr/bin/env bash
# Deploy the framework to a TPU VM / pod slice and smoke-test it.
# ref parity: scripts/deploy.sh (rsync to jetson hosts orin1-4) -> gcloud
# scp to TPU VM workers.
set -euo pipefail

TPU_NAME="${1:?usage: deploy_pod.sh <tpu-name> [zone]}"
ZONE="${2:-us-central2-b}"

echo "==> syncing repo to ${TPU_NAME} (all workers)"
gcloud compute tpus tpu-vm scp --recurse \
    --zone "${ZONE}" --worker=all \
    ./njw_tpu ./weather_sim ./native ./tests \
    ./pyproject.toml ./bench.py ./__graft_entry__.py \
    "${TPU_NAME}":~/njw_tpu/

echo "==> installing + building native lib on all workers"
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker=all \
    --command "cd ~/njw_tpu && pip install -q -e . && make -C native"

echo "==> smoke test (worker 0)"
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" --worker=0 \
    --command "cd ~/njw_tpu && python bench.py"
