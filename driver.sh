#!/usr/bin/env bash
# Sync the framework to a TPU VM and open a shell there — the TPU-era
# equivalent of the reference's driver.sh (scp to a GPU server).
#
# Usage: ./driver.sh <tpu-vm-name> [zone] [project]
set -euo pipefail

VM=${1:?usage: driver.sh <tpu-vm-name> [zone] [project]}
ZONE=${2:-us-central1-a}
PROJECT=${3:-}
FLAGS=(--zone "$ZONE")
[ -n "$PROJECT" ] && FLAGS+=(--project "$PROJECT")

gcloud compute tpus tpu-vm scp --recurse "${FLAGS[@]}" \
    gan_tpu tools tests pix2pix.py cycle_gan.py bench.py pytest.ini \
    "$VM":~/gan_tpu_run/

gcloud compute tpus tpu-vm ssh "${FLAGS[@]}" "$VM"
