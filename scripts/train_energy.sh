#!/bin/bash
# reference: scripts/train_energy.sh — energy model w/ ranking, init from score ckpt
python -m genpose2_tpu.cli train \
    --agent_type energy_with_ranking \
    --data_path "${DATA_PATH:?set DATA_PATH}" \
    --score_ckpt "${SCORE_CKPT:?set SCORE_CKPT}" \
    --log_dir results/energy "$@"
