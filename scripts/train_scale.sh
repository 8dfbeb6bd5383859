#!/bin/bash
# reference: scripts/train_scale.sh — ScaleNet on frozen score features
python -m genpose2_tpu.cli train \
    --agent_type scale \
    --data_path "${DATA_PATH:?set DATA_PATH}" \
    --score_ckpt "${SCORE_CKPT:?set SCORE_CKPT}" \
    --log_dir results/scale "$@"
