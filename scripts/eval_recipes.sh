#!/usr/bin/env bash
# Tuned STTM operating points (the reference's hyperparameter matrix,
# scripts/eval/run_vidqa.sh:54-90) expressed against our CLI. Set DATA_ROOT
# and CKPT_ROOT for your environment.
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-datasets}
CKPT_ROOT=${CKPT_ROOT:-ckpts}
RUN="python -m sttm_tpu.eval.run_vidqa --reproduce --output_dir outputs"

# ---- model configs -------------------------------------------------------
LLAVA_VIDEO_7B="--model_name_or_path ${CKPT_ROOT}/LLaVA-Video-7B-Qwen2-Video-Only --mm_newline_position no_token"
LLAVA_OV_7B="--model_name_or_path ${CKPT_ROOT}/llava-onevision-qwen2-7b-ov --mm_newline_position no_token"
LLAVA_VIDEO_72B="--model_name_or_path ${CKPT_ROOT}/LLaVA-Video-72B-Qwen2 --model_size 72b --tp 8 --mm_newline_position no_token"

# ---- dataset configs (128f @ 1fps; VNBench 180f + rope scaling x2) -------
ds_cfg() {  # ds_cfg <name> <frames> <rope>
  echo "--dataset_name $1 --frames_upbound $2 --rope_scaling_factor $3 \
        --anno_filepath ${DATA_ROOT}/$1/annotations_v2.json \
        --feature_dir ${DATA_ROOT}/$1/features --metadata_dir ${DATA_ROOT}/$1/metadata"
}
VMME=$(ds_cfg videomme 128 1.0);  VNB=$(ds_cfg vnbench 180 2.0)
EGOS=$(ds_cfg egoschema 128 1.0); LVB=$(ds_cfg lvb-val 128 1.0)
NEXT=$(ds_cfg nextqa-mcq 128 1.0); MLVU=$(ds_cfg mlvu-mcq 128 1.0)

# ---- STTM quadtree: layer 2, root level 1; thresholds per model x dataset x budget
STTM="--sa_pattern quadtree --sa_start_layer_idx 2 --sa_tree_root_level 1"
sttm() { echo "$STTM --sa_tree_thresh $1 --sa_tree_temporal_thresh $2"; }

# llava-video-7b                     50% budget        30% budget
#   vnbench                          0.85 / 0.65       0.80 / 0.60
#   videomme                         0.85 / 0.55       0.80 / 0.50
#   egoschema                        0.85 / 0.55       0.80 / 0.60
#   nextqa                           0.85 / 0.65       0.80 / 0.65
#   lvb                              0.85 / 0.60       0.80 / 0.55
#   mlvu                             0.85 / 0.55       0.80 / 0.55
# llava-onevision-7b: 50% 0.85-0.95 / 0.55-0.65 per dataset (see below)
# qwen2vl-7b: vnbench 0.80/0.65, videomme 0.85/0.60, lvb 0.85/0.65 (50%)
# llava-video-72b (layer 0): 50% 0.94/0.82, 30% 0.90/0.90

# examples:
$RUN $LLAVA_VIDEO_7B $VNB  $(sttm 0.85 0.65)   # 7B VNBench @50%
$RUN $LLAVA_VIDEO_7B $VMME $(sttm 0.80 0.50)   # 7B Video-MME @30%

# baselines at matched budgets:
$RUN $LLAVA_VIDEO_7B $VMME --sa_pattern tome --sa_start_layer_idx 2 --sa_prune_ratio 0.50
$RUN $LLAVA_VIDEO_7B $VMME --sa_pattern fastv --sa_start_layer_idx 2 --sa_fastv_evict_ratio 0.50
$RUN $LLAVA_VIDEO_7B $VMME --sa_pattern dycoke-stage1 --sa_start_layer_idx 0 --sa_prune_ratio 0.7
$RUN $LLAVA_VIDEO_7B $VMME --sa_pattern pyrd --sa_pyrd_loc_list 2 8 16 --sa_pyrd_size_list 12 10 8
$RUN $LLAVA_VIDEO_7B $VMME --sa_pattern streamingllm --sa_sink_tokens 16 --sa_local_window 4096
$RUN $LLAVA_VIDEO_7B $VMME --sa_pattern origin       # no reduction
