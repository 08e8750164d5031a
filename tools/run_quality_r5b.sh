#!/usr/bin/env bash
# Round-5 quality campaign, part B: the wav2vec2 FINE-TUNE chain that
# r3b/r4 could never complete on the 16 GiB chip (VERDICT r4 items 1/3/4),
# running at the round-5 memory-fix HEAD (donated train-step state buffers,
# checkpoint snapshots fetched off-device before the next epoch).
#   1) w2v_CRDNN_CTC_cnncl 10 ep  ->  test_on_three_sets posterior dump
#      -> MD_VAE_sfl_saved_phn_recog retrain (post-categorical-LL-fix redo
#      of the saved-phn-recog round trip)
#   2) 10-ep corpus rows for the remaining fine-tune recipes:
#      w2v_CRDNN_CTC, w2v_LSTM_FC, w2v_MD_VAE_sfl_resi
# Same hardened ledger as part A (tools/run_quality_r5a.sh).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
if [ ! -f "$REPO/pyproject.toml" ] || [ ! -d "$REPO/mlvae_tpu" ]; then
    echo "FATAL: REPO resolved to '$REPO' but it is not the repo root" >&2
    exit 2
fi
WORK="${1:-$REPO/runs/r5}"
mkdir -p "$WORK/logs"
cd "$WORK"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
echo "$(date -u +%FT%TZ) campaign=r5b repo=$REPO work=$WORK head=$(git -C "$REPO" rev-parse --short HEAD)" >> "$WORK/logs/phases.txt"

phase() { # name timeout_s cmd...
    local name="$1" tmo="$2"; shift 2
    if grep -q "^$name exit=0 " "$WORK/logs/phases.txt" 2>/dev/null; then
        echo "=== $name: already done, skipping ==="
        return 0
    fi
    if [ "$1" = python ] && [ "$2" = -m ]; then
        if ! python -c "import importlib.util,sys; sys.exit(importlib.util.find_spec('$3') is None)"; then
            echo "$name SKIPPED: module $3 not importable" >> "$WORK/logs/phases.txt"
            return 1
        fi
    fi
    echo "=== $name: $* ==="
    echo "$name attempt start=$(date -u +%FT%TZ) head=$(git -C "$REPO" rev-parse --short HEAD)" >> "$WORK/logs/phases.txt"
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
    print("corpus synthesized (seed 1234)")
EOF

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

# ---- 1) cnncl fine-tune -> posterior dump -> saved-phn-recog retrain --------
# (the reference cnncl yaml nulls both selection keys; override min_key so
# test recalls a real best checkpoint — same wiring as r3b/r4c)
run_train cnncl10 10800 w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {n_epochs: 10, min_key: loss}}"
run_test3 cnncl10 7200 w2v_CRDNN_CTC_cnncl \
    --extra_overrides "{model: {min_key: loss}}"
run_train sfl_saved 2700 MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {n_epochs: 20, phn_recog_outs_path: cnncl10/saved_phn_recog_outs.pkl}}"
run_test  sfl_saved 1800 MD_VAE_sfl_saved_phn_recog \
    --extra_overrides "{model: {phn_recog_outs_path: cnncl10/saved_phn_recog_outs.pkl}}"

# ---- 2) remaining fine-tune recipes, 10-ep corpus rows ----------------------
for cls in w2v_CRDNN_CTC w2v_LSTM_FC w2v_MD_VAE_sfl_resi; do
    run_train "m_$cls" 10800 "$cls" --extra_overrides "{model: {n_epochs: 10}}"
    run_test  "m_$cls" 5400 "$cls" --extra_overrides "{model: {n_epochs: 10}}"
done

echo "=== part B done ==="
grep -v "^#" "$WORK/logs/phases.txt"
