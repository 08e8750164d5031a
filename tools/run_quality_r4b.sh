#!/usr/bin/env bash
# Round-4 quality campaign, part B (VERDICT r3 items 3, 4, 9):
#   1) w2v matrix — the 5 reference w2v recipes at 10 epochs under the
#      ORIGINAL r3b flags (--scan_epoch --async_ckpt --bf16): validates the
#      streaming-scanned-epoch OOM fix (commit 2e0d051) at the 317M-param
#      scale that RESOURCE_EXHAUSTED'd in r3b, and gives every remaining
#      SURVEY §2.3 recipe a corpus-scale row.  Trunks are random-init
#      (zero-egress env; documented fallback, modules/wav2vec2.py).
#   2) cnncl chain redo — w2v_CRDNN_CTC_cnncl 10 ep -> test_on_three_sets
#      (posterior dump) -> MD_VAE_sfl_saved_phn_recog consumer, all on the
#      fixed code (the r3b chain quietly consumed an OOMed epoch-1
#      checkpoint's posteriors).
#   3) test_phn_classifier at the reference's 50 epochs
#      (test_phn_classifier/model.yaml:1) — the r3b 20-epoch run scored a
#      near-chance 11.3% flvl_acc while still climbing (VERDICT item 9).
# Logs: $WORK/logs/<phase>.log ; summary appended to $WORK/logs/phases.txt
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/mlvae_r4}"
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

# ---- 1) w2v matrix (10 epochs; the r3b OOM repros) --------------------------
for cls in w2v_CRDNN_CTC w2v_LSTM_FC w2v_MD_VAE w2v_MD_VAE_sfl \
           w2v_MD_VAE_sfl_resi; do
    run_train "m_$cls" "$cls" --extra_overrides "{model: {n_epochs: 10}}"
    run_test  "m_$cls" "$cls" --extra_overrides "{model: {n_epochs: 10}}"
done

# ---- 2) cnncl -> saved-phn-recog chain on the fixed code --------------------
# (the reference cnncl yaml nulls both selection keys; override min_key so
# test recalls a real best checkpoint — same wiring as r3b)
run_train cnncl10b w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {n_epochs: 10, min_key: loss}}"
run_test3 cnncl10b w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {min_key: loss}}"
run_train sfl_saved_b MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {n_epochs: 20, phn_recog_outs_path: cnncl10b/saved_phn_recog_outs.pkl}}"
run_test  sfl_saved_b MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {phn_recog_outs_path: cnncl10b/saved_phn_recog_outs.pkl}}"

# ---- 3) phn classifier at the reference's 50 epochs -------------------------
run_train phn50 test_phn_classifier
run_test  phn50 test_phn_classifier

# ---- 4) extended-horizon flagship (3x the reference epochs) -----------------
# The 50-epoch runs land on one of the two degenerate poles (RESULTS.md
# base-rate caveat).  150 epochs = 50 full PHN->BDET->VAE cycles: does the
# self-training ever leave the poles on this corpus, or is the pole a fixed
# point?  Soft/IOU + boundary metrics are the signal to read.
MDVAE_W="{model: {n_epochs: 150, phn_recog_bce_weight: 1, boundary_bce_weight: 1, recon_weight: 1}}"
run_train mdvae150 MD_VAE --seed 7777 --extra_overrides "$MDVAE_W"
run_test  mdvae150 MD_VAE --seed 7777 --extra_overrides "$MDVAE_W"

echo "=== part B done ==="
cat "$WORK/logs/phases.txt"
