#!/bin/bash
# reference: scripts/train_score.sh — score-model training entry
python -m genpose2_tpu.cli train \
    --agent_type score \
    --data_path "${DATA_PATH:?set DATA_PATH}" \
    --source "${SOURCE:-Omni6DPose}" \
    --dino "${DINO:-pointwise}" \
    --batch_size "${BATCH_SIZE:-192}" \
    --sampling_steps 500 \
    --log_dir results/score "$@"
