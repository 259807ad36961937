#!/usr/bin/env bash
# Multi-host launcher — the egot2x analogue of the reference's SLURM
# plumbing (HOI/scripts/lta/run_lta.py:38-43 maps SLURM_LOCALID ->
# RANK/LOCAL_RANK; submitit wraps sbatch). JAX is single-controller per
# process: each TPU host runs the SAME command; this script maps the
# scheduler's env onto EGOT2X_COORDINATOR / EGOT2X_NUM_PROCESSES /
# EGOT2X_PROCESS_ID, which egot2x.core.dist.maybe_initialize_from_env
# feeds to jax.distributed.initialize.
#
# Under SLURM:
#   srun --ntasks-per-node=1 tools/launch_multihost.sh \
#       python -m egot2x.cli.run_lta --task classification ...
#
# Manual (one invocation per host):
#   EGOT2X_COORDINATOR=host0:9876 EGOT2X_NUM_PROCESSES=4 \
#   EGOT2X_PROCESS_ID=<i> tools/launch_multihost.sh python -m ...
#
# On Cloud TPU pods, jax.distributed.initialize() can also autodetect
# from the TPU metadata server — then run the command directly with
# EGOT2X_AUTODETECT=1.
set -euo pipefail

PORT="${EGOT2X_PORT:-9876}"

if [[ -n "${SLURM_PROCID:-}" ]]; then
  if [[ -z "${EGOT2X_COORDINATOR:-}" ]]; then
    head_node=$(scontrol show hostnames "$SLURM_NODELIST" | head -n1)
    export EGOT2X_COORDINATOR="${head_node}:${PORT}"
  fi
  export EGOT2X_NUM_PROCESSES="${EGOT2X_NUM_PROCESSES:-$SLURM_NTASKS}"
  export EGOT2X_PROCESS_ID="${EGOT2X_PROCESS_ID:-$SLURM_PROCID}"
fi

if [[ -z "${EGOT2X_COORDINATOR:-}" && -z "${EGOT2X_AUTODETECT:-}" ]]; then
  echo "launch_multihost: no SLURM env and no EGOT2X_COORDINATOR set;" \
       "running single-process" >&2
fi

exec "$@"
