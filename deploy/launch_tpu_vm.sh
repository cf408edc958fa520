#!/usr/bin/env bash
# Cluster launch counterpart of the reference's HTCondor submit file
# (run.submit_file): provision a Cloud TPU VM, sync the repo + data, and
# run the flagship experiment. Preemption recovery = the checkpointer's
# --resume-from contract (atomic orbax saves).
#
# STATUS: documentation/template — this script has never been executed in
# this environment (no gcloud / no GCP project here); treat it as the
# deployment recipe, not tested capability. The resume contract it relies
# on IS tested (tests/test_train_smoke.py save/resume bit-equality).
#
# Usage: PROJECT=my-proj ZONE=us-central2-b ACCEL=v5litepod-8 ./deploy/launch_tpu_vm.sh
set -euo pipefail

PROJECT="${PROJECT:?set PROJECT}"
ZONE="${ZONE:-us-central2-b}"
ACCEL="${ACCEL:-v5litepod-8}"
NAME="${NAME:-textreid-tpu}"
CONFIG="${CONFIG:-configs/cuhkpedes/moco_gru_cliprn50_ls_bs128_2048.yaml}"
DATA_BUCKET="${DATA_BUCKET:?set DATA_BUCKET (gs://... with datasets/ and pretrained/)}"

gcloud compute tpus tpu-vm create "$NAME" \
  --project="$PROJECT" --zone="$ZONE" \
  --accelerator-type="$ACCEL" --version=tpu-ubuntu2204-base \
  --preemptible || true

gcloud compute tpus tpu-vm scp --recurse . "$NAME:~/textreid_tpu" \
  --project="$PROJECT" --zone="$ZONE" --worker=all

gcloud compute tpus tpu-vm ssh "$NAME" --project="$PROJECT" --zone="$ZONE" \
  --worker=all --command="
set -e
cd ~/textreid_tpu
pip install -q -e . 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
gsutil -m rsync -r $DATA_BUCKET/datasets datasets
gsutil -m rsync -r $DATA_BUCKET/pretrained pretrained
RESUME=\$(ls -d output/*/*/epoch_* 2>/dev/null | sort -V | tail -1 || true)
python train_net.py --root . --config-file $CONFIG \
  \${RESUME:+--resume-from \$RESUME}
"
