#!/bin/bash
# Canonical train/test/embeddings launches — the reference demo.sh
# (src/demo.sh:14-38) re-expressed for the TPU-native CLI. Run from the
# repo root with MIND data unpacked under data/.

mode=$1
model_dir='model/NAML'
model='NAML'
train_data_dir='data/MINDsmall_train'
test_data_dir='data/MINDsmall_dev'

if [ "${mode}" == train ]; then
  # reference train config: NAML multi-view, frozen title table, 5 epochs,
  # per-shard batch 32, lr 3e-4, pad-doc user path (demo.sh:14-23)
  python -m newsrecommendation_tpu.cli --mode train --model ${model} \
    --title_source doc_table --use_category True --use_subcategory True \
    --freeze_embedding True --epochs 5 --batch_size 32 --lr 0.0003 \
    --user_log_mask False --model_dir ${model_dir} \
    --train_data_dir ${train_data_dir}
elif [ "${mode}" == test ]; then
  # reference test config: batch 128, masked user attention (demo.sh:24-32)
  load_ckpt_name=$2
  python -m newsrecommendation_tpu.cli --mode test --model ${model} \
    --title_source doc_table --use_category True --use_subcategory True \
    --freeze_embedding True --batch_size 128 --user_log_mask True \
    --load_ckpt_name "${load_ckpt_name}" --model_dir ${model_dir} \
    --test_data_dir ${test_data_dir}
elif [ "${mode}" == embeddings ]; then
  # offline per-title table build for both splits (demo.sh:33-35);
  # backend=bpemb matches the fork, backend=hash needs no downloads
  python -m newsrecommendation_tpu.cli --mode create_embeddings \
    --train_data_dir ${train_data_dir} --test_data_dir ${test_data_dir}
elif [ "${mode}" == parity ]; then
  # one-command accuracy-parity run against the reference's published rows
  # (README.md:68-80); add --dry_run for the offline synthetic validation
  python tools/parity_run.py --data_root data "${@:2}"
elif [ "${mode}" == nrms ]; then
  # reference README NRMS row: title-only word-id pipeline, 4 epochs.
  # TPU tip: add --num_attention_heads 8 (d=50) for +44% step throughput
  # at equal-or-better synthetic AUC (docs/PERF.md round 5) — off here to
  # keep the published-row parity semantics (20 heads x d=20).
  python -m newsrecommendation_tpu.cli --mode train_test --model NRMS \
    --title_source word_ids --epochs 4 --batch_size 32 --lr 0.0003 \
    --model_dir model/NRMS --train_data_dir ${train_data_dir} \
    --test_data_dir ${test_data_dir}
elif [ "${mode}" == serve ]; then
  # production serving from the newest checkpoint: micro-batching HTTP API
  #   curl -s -XPOST localhost:8000/score \
  #     -d '{"history":["N1","N2"],"candidates":["N5","N9"]}'
  python -m newsrecommendation_tpu.cli --mode serve --model NRMS \
    --title_source word_ids --user_log_mask True --deterministic True \
    --model_dir model/NRMS --test_data_dir ${test_data_dir} \
    --load_ckpt_name latest --serve_port "${2:-8000}"
else
  echo "usage: demo.sh {train|test <ckpt>|embeddings|nrms|parity|serve [port]}"
fi
