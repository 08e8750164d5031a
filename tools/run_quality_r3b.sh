#!/usr/bin/env bash
# Round-3 corpus-scale quality runs, SESSION-BUDGETED reorder of
# run_quality_r3.sh (the sfl_amp re-run already landed in docs/RESULTS.md,
# so it is dropped; the data-cleaning round trip leads):
#   1) mdvae50 + cleaned  — flagship 50-epoch -> TEST saved-MD dump ->
#                           cleaned retrain -> TEST (VERDICT r2 item 3)
#   2) sfl_f32            — precision A/B arm still pending in RESULTS.md
#   3) matrix (fast)      — harness recipes + CRDNN_CTC_cnncl (item 5)
#   4) saved_phn_recog    — posterior dump -> saved-recog SFL, post-fix
#   5) matrix (w2v)       — remaining w2v recipes, 10 epochs
# Logs: $WORK/logs/<phase>.log ; summary appended to $WORK/logs/phases.txt
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/mlvae_r3}"
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
run_test3() {
    local name="$1" cls="$2"; shift 2
    phase "test3_$name" python -m mlvae_tpu.cli.test_on_three_sets "$CFG" \
        "${COMMON[@]}" --model_class "$cls" --model_name "$name" \
        --model "!include:$REPO/mlvae_tpu/models/$cls/model.yaml" "$@"
}

# 1) flagship 50-epoch -> saved-MD-results dump -> cleaned retrain round trip
run_train mdvae50 MD_VAE
run_test  mdvae50 MD_VAE
run_train mdvae_cleaned MD_VAE --saved_md_results_model_name mdvae50
run_test  mdvae_cleaned MD_VAE --saved_md_results_model_name mdvae50

# 6) precision A/B for the SFL re-run (amp arm already recorded)
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

# 3) fast matrix: harness recipes + CRDNN_CTC_cnncl (20 epochs)
for cls in test_vanilla_vae test_gmm_vae test_h_vae \
           test_phn_classifier test_b_ind_classifier CRDNN_CTC_cnncl; do
    run_train "m_$cls" "$cls" --extra_overrides "{model: {n_epochs: 20}}"
    run_test  "m_$cls" "$cls"
done

# 4) saved-phn-recog round trip, post-fix: cnncl posteriors -> SFL consumer
#    (the reference yaml nulls both selection keys; a user must override one)
run_train cnncl10 w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {n_epochs: 10, min_key: loss}}"
run_test3 cnncl10 w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {min_key: loss}}"
run_train sfl_saved MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {n_epochs: 20, phn_recog_outs_path: cnncl10/saved_phn_recog_outs.pkl}}"
run_test  sfl_saved MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {phn_recog_outs_path: cnncl10/saved_phn_recog_outs.pkl}}"

# 5) w2v matrix (10 epochs; trunk random-init under zero egress)
for cls in w2v_CRDNN_CTC w2v_LSTM_FC w2v_MD_VAE w2v_MD_VAE_sfl \
           w2v_MD_VAE_sfl_resi; do
    run_train "m_$cls" "$cls" --extra_overrides "{model: {n_epochs: 10}}"
    run_test  "m_$cls" "$cls"
done


echo "=== all phases done ==="
cat "$WORK/logs/phases.txt"
