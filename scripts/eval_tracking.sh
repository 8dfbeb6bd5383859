#!/bin/bash
# reference: scripts/eval_tracking.sh — multiplexed video tracking (T0=0.25)
python -m genpose2_tpu.cli track \
    --data_path "${DATA_PATH:?set DATA_PATH}" \
    --score_ckpt "${SCORE_CKPT:?set SCORE_CKPT}" \
    --T0 0.25 \
    --log_dir results/eval_tracking "$@"
