#!/usr/bin/env bash
# Round-4 quality campaign, part C: resume after the host reboot that
# wiped /tmp mid part-A.  The mask A/B (part A phase 1) completed and is
# published (RESULTS.md "Round-4 part-A campaign"); this script runs the
# remaining part-A phases and part B, re-ordered by VERDICT-r3 priority:
#   1) seed sweep    — MD_VAE 50-ep at HEAD, seeds 7777/24601/555/90210.
#                      (seed 123456 at HEAD is already known bit-exactly:
#                      the mask-A/B legacy arm reproduced it — F1 0.0,
#                      flag-nothing pole — so it is not re-run.)
#   2) cleaned round trip on the best seed from (1)      [r3 item 2]
#   3) SFL precision x seed matrix {bf16,f32}x{123456,7777}, 30 ep [item 5]
#   4) test_phn_classifier at the reference's 50 epochs  [item 9]
#   5) cnncl -> saved-phn-recog chain under the ORIGINAL r3b OOM flags
#      (validates the streaming-scan fix at 317M scale)  [item 3]
#   6) w2v 5-recipe matrix, 10 ep                        [item 4]
#   7) extended-horizon flagship, 150 ep                 [exploratory]
# Phases are resumable: a phase whose "exit=0" line is already in
# phases.txt is skipped, so re-running this script after a crash/reboot
# continues where it left off.
# Logs: $WORK/logs/<phase>.log ; summary appended to $WORK/logs/phases.txt
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
# reference-default loss weights, pinned explicitly so the runs are
# warning-free (values identical to the defaulted 1; VERDICT r3 item 8)
MDVAE_W="{model: {phn_recog_bce_weight: 1, boundary_bce_weight: 1, recon_weight: 1}}"

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

# ---- 1) seed sweep at HEAD --------------------------------------------------
for s in 7777 24601 555 90210; do
    run_train "mdvae_s$s" 2700 MD_VAE --seed "$s" --extra_overrides "$MDVAE_W"
    run_test  "mdvae_s$s" 1200 MD_VAE --seed "$s" --extra_overrides "$MDVAE_W"
done

# ---- 2) cleaned round trip on the best seed from (1) -----------------------
# The MD-results dump MUST come from test_on_three_sets: a plain cli.test
# only evaluates (and therefore only dumps results for) the TEST set, which
# leaves TRAIN/VALID cleaning vacuous — the first r4 attempt
# (phases train/test_mdvae_cleaned) reproduced the base trajectory
# bit-identically for exactly this reason.  Mirrors the reference workflow:
# save_md_result runs in the TEST stage of evaluate() on whichever set is
# being evaluated (reference MD_VAE/model.py:232-272), so covering all
# three sets requires test_on_three_sets (reference test_on_three_sets.py).
BEST=$(python - <<'EOF'
import re
from pathlib import Path
best, best_f1 = None, -1.0
for s in (7777, 24601, 555, 90210):
    log = Path(f"logs/test_mdvae_s{s}.log")
    if not log.exists():
        continue
    m = None
    for line in log.read_text().splitlines():
        mm = re.search(r"Best epoch.*plvl_md\.F1: ([0-9.]+)", line)
        if mm:
            m = float(mm.group(1))
    if m is not None and m > best_f1:
        best, best_f1 = s, m
print(best if best is not None else 7777)
EOF
)
echo "cleaned round trip base seed: $BEST" >> "$WORK/logs/phases.txt"
run_test3 "mdvae_s$BEST" 2400 MD_VAE --seed "$BEST" --extra_overrides "$MDVAE_W"
run_train mdvae_cleaned3 2700 MD_VAE --seed "$BEST" --extra_overrides "$MDVAE_W" \
    --saved_md_results_model_name "mdvae_s$BEST"
run_test  mdvae_cleaned3 1200 MD_VAE --seed "$BEST" --extra_overrides "$MDVAE_W" \
    --saved_md_results_model_name "mdvae_s$BEST"

# ---- 3) SFL precision x seed matrix (30 epochs, reference weights) ----------
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

# ---- 5) cnncl -> saved-phn-recog chain (original r3b OOM flags) -------------
# (the reference cnncl yaml nulls both selection keys; override min_key so
# test recalls a real best checkpoint — same wiring as r3b)
run_train cnncl10b 9000 w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {n_epochs: 10, min_key: loss}}"
run_test3 cnncl10b 5400 w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {min_key: loss}}"
run_train sfl_saved_b 2700 MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {n_epochs: 20, phn_recog_outs_path: cnncl10b/saved_phn_recog_outs.pkl}}"
run_test  sfl_saved_b 1200 MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {phn_recog_outs_path: cnncl10b/saved_phn_recog_outs.pkl}}"

# ---- 6) w2v matrix (10 epochs; the r3b OOM repros) --------------------------
for cls in w2v_CRDNN_CTC w2v_LSTM_FC w2v_MD_VAE w2v_MD_VAE_sfl \
           w2v_MD_VAE_sfl_resi; do
    run_train "m_$cls" 9000 "$cls" --extra_overrides "{model: {n_epochs: 10}}"
    run_test  "m_$cls" 5400 "$cls" --extra_overrides "{model: {n_epochs: 10}}"
done

# ---- 7) extended-horizon flagship (3x the reference epochs) -----------------
MDVAE150_W="{model: {n_epochs: 150, phn_recog_bce_weight: 1, boundary_bce_weight: 1, recon_weight: 1}}"
run_train mdvae150 7200 MD_VAE --seed 7777 --extra_overrides "$MDVAE150_W"
run_test  mdvae150 1200 MD_VAE --seed 7777 --extra_overrides "$MDVAE150_W"

echo "=== part C done ==="
cat "$WORK/logs/phases.txt"
