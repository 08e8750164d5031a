#!/usr/bin/env bash
# Round-5 quality campaign, part C: the remaining fine-tune matrix with
# reference-parity checkpoints (--ckpt_opt_state False — the reference
# never persists optimizer state, and at 317M params the Adam moments are
# ~3.5 GiB of snapshot D2H per epoch through the tunnel, ~3 min/epoch).
# Phase names match run_quality_r5b.sh section 2, so whatever part B
# already completed is skipped via the shared phases.txt ledger.
# Extra phases: f32 arm of w2v_MD_VAE (NaN A/B) + warm-eval profiling.
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
echo "$(date -u +%FT%TZ) campaign=r5c repo=$REPO work=$WORK head=$(git -C "$REPO" rev-parse --short HEAD)" >> "$WORK/logs/phases.txt"

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

COMMON=(--dataset SynAudioMNIST --language digits --n_phonemes 12
        --scan_epoch True --bf16 True --noprogressbar True
        --async_ckpt True --ckpt_opt_state False)
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

# ---- remaining fine-tune recipes, 10-ep corpus rows -------------------------
for cls in w2v_CRDNN_CTC w2v_LSTM_FC w2v_MD_VAE_sfl_resi; do
    run_train "m_$cls" 10800 "$cls" --extra_overrides "{model: {n_epochs: 10}}"
    run_test  "m_$cls" 5400 "$cls" --extra_overrides "{model: {n_epochs: 10}}"
done

# ---- f32 arm of w2v_MD_VAE (NaN A/B: bf16 vs f32 under random trunk) --------
phase train_w2v_mdvae_f32 10800 python -m mlvae_tpu.cli.train "$CFG" \
    --dataset SynAudioMNIST --language digits --n_phonemes 12 \
    --scan_epoch True --bf16 False --noprogressbar True \
    --async_ckpt True --ckpt_opt_state False \
    --model_class w2v_MD_VAE --model_name w2v_mdvae_f32 \
    --model "!include:$REPO/mlvae_tpu/models/w2v_MD_VAE/model.yaml" \
    --extra_overrides "{model: {n_epochs: 30}}"
phase test_w2v_mdvae_f32 2400 python -m mlvae_tpu.cli.test "$CFG" \
    --dataset SynAudioMNIST --language digits --n_phonemes 12 \
    --scan_epoch True --bf16 False --noprogressbar True \
    --async_ckpt True --ckpt_opt_state False \
    --model_class w2v_MD_VAE --model_name w2v_mdvae_f32 \
    --model "!include:$REPO/mlvae_tpu/models/w2v_MD_VAE/model.yaml"

echo "=== part C done ==="
grep -v "^#" "$WORK/logs/phases.txt"
