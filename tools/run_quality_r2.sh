#!/usr/bin/env bash
# Round-2 corpus-scale quality refresh on the real chip (VERDICT item 6).
# Phases:
#   sfl_amp / sfl_f32   — MD_VAE_sfl 30-epoch A/B re-run at current HEAD
#                         (the categorical-ll normalization fix changed every
#                         SFL recipe's pi-NLL and REINFORCE nll; the numbers
#                         in docs/RESULTS.md predate it)
#   mdvae50 + test      — flagship 50-epoch run, dumps saved MD results
#   cleaned + test      — retrain on the cleaned dataset (saved-MD-results
#                         round trip at corpus scale; failed during the
#                         round-1 outage window)
#   hmm_viterbi         — HMM_DNN_ALI with per-batch viterbi realignment
#                         (realign-every-batch semantics fixed post-round-1)
# Logs: $WORK/logs/<phase>.log ; summary appended to $WORK/logs/phases.txt
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/mlvae_r2}"
mkdir -p "$WORK/logs"
cd "$WORK"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

phase() {
    local name="$1"; shift
    echo "=== $name: $* ==="
    local t0=$SECONDS
    if "$@" >"$WORK/logs/$name.log" 2>&1; then rc=0; else rc=$?; fi
    echo "$name exit=$rc wall=$((SECONDS - t0))s" >> "$WORK/logs/phases.txt"
}

# one shared 2250-utt corpus (30 spk x 75 utts, the docs/RESULTS geometry)
python - <<EOF
import sys; sys.path.insert(0, "$REPO")
from pathlib import Path
from mlvae_tpu.data.synth import generate_corpus
root = Path("$WORK/datasets/SynAudioMNIST")
if not (root / "original_dataset").exists():
    generate_corpus(root, n_speakers=30, utts_per_speaker=75)
    print("corpus synthesized")
EOF

# --async_ckpt keeps the ~235 MB/save checkpoint fetches off the training
# critical path: the tunnel's D2H bandwidth flaps between ~40 and ~0.2 MB/s
# (docs/RESULTS.md A/B shows async saves leave metrics identical).
COMMON=(--dataset SynAudioMNIST --language digits --n_phonemes 12
        --scan_epoch True --bf16 True --noprogressbar True
        --async_ckpt True)
CFG="$REPO/config/run.yaml"

run_train() { # name model_class extra...
    local name="$1" cls="$2"; shift 2
    phase "train_$name" python -m mlvae_tpu.cli.train "$CFG" \
        "${COMMON[@]}" --model_class "$cls" --model_name "$name" \
        --model "!include:$REPO/mlvae_tpu/models/$cls/model.yaml" "$@"
}
run_test() {
    local name="$1" cls="$2"; shift 2
    phase "test_$name" python -m mlvae_tpu.cli.test "$CFG" \
        "${COMMON[@]}" --model_class "$cls" --model_name "$name" \
        --model "!include:$REPO/mlvae_tpu/models/$cls/model.yaml" "$@"
}

# 1) SFL A/B at current HEAD (post categorical-ll fix)
run_train sfl_amp MD_VAE_sfl --extra_overrides "{model: {n_epochs: 30}}"
run_test  sfl_amp MD_VAE_sfl
phase train_sfl_f32 python -m mlvae_tpu.cli.train "$CFG" \
    --dataset SynAudioMNIST --language digits --n_phonemes 12 \
    --scan_epoch True --bf16 False --noprogressbar True \
    --async_ckpt True \
    --model_class MD_VAE_sfl --model_name sfl_f32 \
    --model "!include:$REPO/mlvae_tpu/models/MD_VAE_sfl/model.yaml" \
    --extra_overrides "{model: {n_epochs: 30}}"
phase test_sfl_f32 python -m mlvae_tpu.cli.test "$CFG" \
    --dataset SynAudioMNIST --language digits --n_phonemes 12 \
    --scan_epoch True --bf16 False --noprogressbar True \
    --async_ckpt True \
    --model_class MD_VAE_sfl --model_name sfl_f32 \
    --model "!include:$REPO/mlvae_tpu/models/MD_VAE_sfl/model.yaml"

# 2) flagship 50-epoch -> saved-MD-results dump -> cleaned retrain round trip
run_train mdvae50 MD_VAE
run_test  mdvae50 MD_VAE
run_train mdvae_cleaned MD_VAE --saved_md_results_model_name mdvae50
run_test  mdvae_cleaned MD_VAE --saved_md_results_model_name mdvae50

# 3) HMM aligner with viterbi realignment (fixed realign-every-batch path)
run_train hmm_viterbi HMM_DNN_ALI \
    --extra_overrides "{model: {n_epochs: 10, init_training_type: viterbi, switch_training_type: viterbi}}"
run_test  hmm_viterbi HMM_DNN_ALI \
    --extra_overrides "{model: {init_training_type: viterbi, switch_training_type: viterbi}}"

echo "=== all phases done ==="
cat "$WORK/logs/phases.txt"
