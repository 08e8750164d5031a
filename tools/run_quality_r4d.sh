#!/usr/bin/env bash
# Round-4 quality campaign, part D: same phases as part C (and the same
# resumable phases.txt protocol — completed phases are skipped), with the
# tail re-ordered for the time left in the round: after the SFL matrix,
# the w2v-scale OOM-fix validation (train_cnncl10b under the ORIGINAL r3b
# RESOURCE_EXHAUSTED flags; VERDICT r3 item 3) runs BEFORE the 50-epoch
# phn-classifier and the posterior-dump chain, so the highest-priority
# hardware evidence lands even if the round ends mid-campaign.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$REPO/runs/r4}"
mkdir -p "$WORK/logs"
cd "$WORK"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

phase() { # name timeout_s cmd...
    local name="$1" tmo="$2"; shift 2
    if grep -q "^$name exit=0 " "$WORK/logs/phases.txt" 2>/dev/null; then
        echo "=== $name: already done, skipping ==="
        return 0
    fi
    echo "=== $name: $* ==="
    local t0=$SECONDS
    if timeout "$tmo" "$@" >"$WORK/logs/$name.log" 2>&1; then rc=0; else rc=$?; fi
    echo "$name exit=$rc wall=$((SECONDS - t0))s" >> "$WORK/logs/phases.txt"
}

COMMON=(--dataset SynAudioMNIST --language digits --n_phonemes 12
        --scan_epoch True --bf16 True --noprogressbar True
        --async_ckpt True)
CFG="$REPO/config/run.yaml"

run_train() { # name tmo model_class extra...
    local name="$1" tmo="$2" cls="$3"; shift 3
    phase "train_$name" "$tmo" python -m mlvae_tpu.cli.train "$CFG" \
        "${COMMON[@]}" --model_class "$cls" --model_name "$name" \
        --model "!include:$REPO/mlvae_tpu/models/$cls/model.yaml" "$@"
}
run_test() {
    local name="$1" tmo="$2" cls="$3"; shift 3
    phase "test_$name" "$tmo" python -m mlvae_tpu.cli.test "$CFG" \
        "${COMMON[@]}" --model_class "$cls" --model_name "$name" \
        --model "!include:$REPO/mlvae_tpu/models/$cls/model.yaml" "$@"
}
run_test3() {
    local name="$1" tmo="$2" cls="$3"; shift 3
    phase "test3_$name" "$tmo" python -m mlvae_tpu.cli.test_on_three_sets "$CFG" \
        "${COMMON[@]}" --model_class "$cls" --model_name "$name" \
        --model "!include:$REPO/mlvae_tpu/models/$cls/model.yaml" "$@"
}

# ---- 5a) w2v-scale OOM-fix validation (original r3b flags, 317M trunk) ------
# First so the binary item-3 evidence (train completes where r3b
# RESOURCE_EXHAUSTED'd) cannot be clipped by round end.
run_train cnncl10b 9000 w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {n_epochs: 10, min_key: loss}}"

# ---- 3 cont.) SFL precision x seed matrix (30 epochs, reference weights) ----
for s in 123456 7777; do
    for prec in bf16 f32; do
        if [ "$prec" = bf16 ]; then BF=True; else BF=False; fi
        name="sfl_${prec}_s$s"
        phase "train_$name" 2700 python -m mlvae_tpu.cli.train "$CFG" \
            --dataset SynAudioMNIST --language digits --n_phonemes 12 \
            --scan_epoch True --bf16 "$BF" --noprogressbar True \
            --async_ckpt True --seed "$s" \
            --model_class MD_VAE_sfl --model_name "$name" \
            --model "!include:$REPO/mlvae_tpu/models/MD_VAE_sfl/model.yaml" \
            --extra_overrides "{model: {n_epochs: 30}}"
        phase "test_$name" 1200 python -m mlvae_tpu.cli.test "$CFG" \
            --dataset SynAudioMNIST --language digits --n_phonemes 12 \
            --scan_epoch True --bf16 "$BF" --noprogressbar True \
            --async_ckpt True --seed "$s" \
            --model_class MD_VAE_sfl --model_name "$name" \
            --model "!include:$REPO/mlvae_tpu/models/MD_VAE_sfl/model.yaml"
    done
done

# ---- 4) phn classifier at the reference's 50 epochs -------------------------
run_train phn50 2700 test_phn_classifier
run_test  phn50 1200 test_phn_classifier

# ---- 5b) cnncl posterior dump -> saved-phn-recog consumer -------------------
run_test3 cnncl10b 5400 w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {min_key: loss}}"
run_train sfl_saved_b 2700 MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {n_epochs: 20, phn_recog_outs_path: cnncl10b/saved_phn_recog_outs.pkl}}"
run_test  sfl_saved_b 1200 MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {phn_recog_outs_path: cnncl10b/saved_phn_recog_outs.pkl}}"

# ---- 6) w2v matrix (10 epochs) ----------------------------------------------
for cls in w2v_CRDNN_CTC w2v_LSTM_FC w2v_MD_VAE w2v_MD_VAE_sfl \
           w2v_MD_VAE_sfl_resi; do
    run_train "m_$cls" 9000 "$cls" --extra_overrides "{model: {n_epochs: 10}}"
    run_test  "m_$cls" 5400 "$cls" --extra_overrides "{model: {n_epochs: 10}}"
done

# ---- 7) extended-horizon flagship (3x the reference epochs) -----------------
MDVAE150_W="{model: {n_epochs: 150, phn_recog_bce_weight: 1, boundary_bce_weight: 1, recon_weight: 1}}"
run_train mdvae150 7200 MD_VAE --seed 7777 --extra_overrides "$MDVAE150_W"
run_test  mdvae150 1200 MD_VAE --seed 7777 --extra_overrides "$MDVAE150_W"

echo "=== part D done ==="
cat "$WORK/logs/phases.txt"
