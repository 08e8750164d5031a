#!/usr/bin/env bash
# Round-4 quality campaign, part A (VERDICT r3 items 1, 2, 5):
#   1) mask A/B   — MD_VAE 50-ep, seed 123456, LEGACY ROUNDED loss mask
#                   (pre-adb3b44 semantics via MLVAE_LEGACY_ROUNDED_MASK=1):
#                   isolates the round-3 loss-mask parity fix as the cause
#                   of the r3b flagship collapse vs seed chaos.
#   2) seed sweep — MD_VAE 50-ep at HEAD, seeds 7777/24601/555/90210 plus a
#                   123456 repro: the post-fix F1 distribution.
#   3) cleaned round trip — pick the best non-collapsed seed from (2),
#                   dump saved-MD results on TEST, retrain with cleaning
#                   applied, publish before/after (r2 item 3, r3 item 2).
#   4) SFL precision x seed — MD_VAE_sfl 30-ep, {bf16,f32} x {123456,7777}:
#                   settles whether the r3 f32/AMP gap (8.16 vs 26.68) is
#                   precision or seed variance (r3 item 5).
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

# reuse the r3 corpus + computed-dataset cache when present (identical by
# construction: synth.py generate_corpus is seeded), else synthesize fresh
if [ ! -d "$WORK/datasets/SynAudioMNIST" ]; then
    if [ -d /tmp/mlvae_r3/datasets/SynAudioMNIST ]; then
        mkdir -p "$WORK/datasets"
        cp -r /tmp/mlvae_r3/datasets/SynAudioMNIST "$WORK/datasets/"
        rm -rf "$WORK/datasets/SynAudioMNIST/saved_md_results"
        echo "reused r3 dataset cache"
    fi
fi
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

# ---- 1) mask A/B: legacy ROUNDED mask at the collapse seed ------------------
export MLVAE_LEGACY_ROUNDED_MASK=1
run_train mdvae_maskab MD_VAE --seed 123456 --extra_overrides "$MDVAE_W"
run_test  mdvae_maskab MD_VAE --seed 123456 --extra_overrides "$MDVAE_W"
unset MLVAE_LEGACY_ROUNDED_MASK

# ---- 2) seed sweep at HEAD --------------------------------------------------
for s in 7777 24601 555 90210 123456; do
    run_train "mdvae_s$s" MD_VAE --seed "$s" --extra_overrides "$MDVAE_W"
    run_test  "mdvae_s$s" MD_VAE --seed "$s" --extra_overrides "$MDVAE_W"
done

# ---- 3) cleaned round trip on the best seed from (2) -----------------------
BEST=$(python - <<'EOF'
import re, sys
from pathlib import Path
best, best_f1 = None, -1.0
for s in (7777, 24601, 555, 90210, 123456):
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
run_train mdvae_cleaned MD_VAE --seed "$BEST" --extra_overrides "$MDVAE_W" \
    --saved_md_results_model_name "mdvae_s$BEST"
run_test  mdvae_cleaned MD_VAE --seed "$BEST" --extra_overrides "$MDVAE_W" \
    --saved_md_results_model_name "mdvae_s$BEST"

# ---- 4) SFL precision x seed matrix (30 epochs, reference weights) ----------
for s in 123456 7777; do
    for prec in bf16 f32; do
        if [ "$prec" = bf16 ]; then BF=True; else BF=False; fi
        name="sfl_${prec}_s$s"
        phase "train_$name" python -m mlvae_tpu.cli.train "$CFG" \
            --dataset SynAudioMNIST --language digits --n_phonemes 12 \
            --scan_epoch True --bf16 "$BF" --noprogressbar True \
            --async_ckpt True --seed "$s" \
            --model_class MD_VAE_sfl --model_name "$name" \
            --model "!include:$REPO/mlvae_tpu/models/MD_VAE_sfl/model.yaml" \
            --extra_overrides "{model: {n_epochs: 30}}"
        phase "test_$name" python -m mlvae_tpu.cli.test "$CFG" \
            --dataset SynAudioMNIST --language digits --n_phonemes 12 \
            --scan_epoch True --bf16 "$BF" --noprogressbar True \
            --async_ckpt True --seed "$s" \
            --model_class MD_VAE_sfl --model_name "$name" \
            --model "!include:$REPO/mlvae_tpu/models/MD_VAE_sfl/model.yaml"
    done
done

echo "=== part A done ==="
cat "$WORK/logs/phases.txt"
