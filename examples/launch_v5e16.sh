#!/usr/bin/env bash
# Launcher: provision a v5e-16 pod slice, push this package, run the pod
# driver on every host, and fetch the per-shard outputs.
#
# TPU-native counterpart of the reference's cluster launchers
# (/root/reference/examples/run_jax_emulator.slurm, my_py_gpu_job.sh):
# where those wrap a single-GPU batch loop in SLURM, a TPU pod slice is
# provisioned once and every host runs the SAME multi-controller SPMD
# program (examples/run_pod.py). See docs/RUNBOOK_v5e16.md for the
# geometry reasoning behind the defaults.
#
# Usage:
#   ZONE=us-west4-a ./examples/launch_v5e16.sh [--size 2048] [--ic-seed 42]
#
# Steps are idempotent: re-running skips an existing TPU VM and re-pushes
# only changed files. Requires: gcloud CLI authenticated for the project.

set -euo pipefail

TPU_NAME="${TPU_NAME:-nbody-v5e16}"
ZONE="${ZONE:?set ZONE (e.g. us-west4-a)}"
ACCEL="${ACCEL:-v5litepod-16}"
RUNTIME_VERSION="${RUNTIME_VERSION:-tpu-ubuntu2204-base}"
PARAMS="${PARAMS:-}"            # optional local weights .npz to push
OUT_DIR="${OUT_DIR:-pod_out}"   # remote per-shard output directory
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"

# Everything after the launcher's own flags is forwarded to run_pod.py.
RUN_ARGS=("$@")
if [ ${#RUN_ARGS[@]} -eq 0 ]; then
  RUN_ARGS=(--size 2048 --vel --ic-seed 42 --boxsize 2000 --validate)
fi

echo ">> [1/4] provision ${TPU_NAME} (${ACCEL}, ${ZONE})"
if ! gcloud compute tpus tpu-vm describe "${TPU_NAME}" --zone "${ZONE}" \
    >/dev/null 2>&1; then
  gcloud compute tpus tpu-vm create "${TPU_NAME}" \
    --zone "${ZONE}" \
    --accelerator-type "${ACCEL}" \
    --version "${RUNTIME_VERSION}"
else
  echo "   ${TPU_NAME} already exists — reusing"
fi

echo ">> [2/4] push package + driver to every worker"
gcloud compute tpus tpu-vm scp --worker=all --recurse --zone "${ZONE}" \
  "${REPO_ROOT}/jax_nbody_emulator_with_dj_tpu" \
  "${REPO_ROOT}/examples" \
  "${TPU_NAME}":~/
if [ -n "${PARAMS}" ]; then
  gcloud compute tpus tpu-vm scp --worker=all --zone "${ZONE}" \
    "${PARAMS}" "${TPU_NAME}":~/weights.npz
  RUN_ARGS+=(--params "\$HOME/weights.npz")
fi
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --worker=all --zone "${ZONE}" \
  --command="python3 -c 'import jax' 2>/dev/null || pip -q install 'jax[tpu]' \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html"

echo ">> [3/4] run the pod program on all hosts: run_pod.py ${RUN_ARGS[*]}"
# Every worker runs the same command; jax.distributed discovers the pod
# topology from the TPU metadata (initialize() needs no arguments here).
gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --worker=all --zone "${ZONE}" \
  --command="cd ~ && mkdir -p ${OUT_DIR} && \
    python3 examples/run_pod.py ${RUN_ARGS[*]} --out-dir ${OUT_DIR}"

echo ">> [4/4] fetch per-shard outputs from every worker"
# OUT_DIR may be absolute (remote scratch disk) or relative to the remote
# home; fetch from wherever step 3 actually wrote.
case "${OUT_DIR}" in
  /*) REMOTE_OUT="${OUT_DIR}" ; LOCAL_OUT="pod_out" ;;
  *)  REMOTE_OUT="~/${OUT_DIR}" ; LOCAL_OUT="${OUT_DIR}" ;;
esac
mkdir -p "${LOCAL_OUT}"
gcloud compute tpus tpu-vm scp --worker=all --recurse --zone "${ZONE}" \
  "${TPU_NAME}:${REMOTE_OUT}/*" "${LOCAL_OUT}/" || true

echo ">> done. Outputs in ${LOCAL_OUT}/ — delete the slice when finished:"
echo "   gcloud compute tpus tpu-vm delete ${TPU_NAME} --zone ${ZONE}"
