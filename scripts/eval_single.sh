#!/bin/bash
# reference: scripts/eval_single.sh — staged single-frame eval (T0=0.55, K=50)
python -m genpose2_tpu.cli eval \
    --data_path "${DATA_PATH:?set DATA_PATH}" \
    --score_ckpt "${SCORE_CKPT:?set SCORE_CKPT}" \
    ${ENERGY_CKPT:+--energy_ckpt "$ENERGY_CKPT"} \
    --T0 0.55 --eval_repeat_num 50 --batch_size 128 \
    --log_dir results/eval_single "$@"
