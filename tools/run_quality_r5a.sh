#!/usr/bin/env bash
# Round-5 quality campaign, part A: the two frozen-trunk w2v recipes that
# were never corpus-run (VERDICT r4 "next round" item 2).  freeze: True
# means no trunk optimizer state, so these were never blocked by the
# fine-tune OOM — they simply were never scheduled in any r3/r4 campaign.
#   1) w2v_MD_VAE      50 epochs (reference default, w2v_MD_VAE/model.yaml:3)
#   2) w2v_MD_VAE_sfl  30 epochs (matches the r4 sfl matrix horizon)
# Part B (tools/run_quality_r5b.sh) runs the fine-tune chain once the
# memory fixes land.
#
# Harness hardening (VERDICT r4 weak #2: the part-D campaign silently
# never resumed because $REPO resolved empty -> exec'd "//tools/..."):
#   - REPO is resolved once, logged, and sanity-checked before anything runs
#   - every phase logs an "attempt" line to phases.txt at start, not just
#     the exit line, so manual retries are visible in the ledger
#   - phase() re-checks that the python entry module resolves before running
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
echo "$(date -u +%FT%TZ) campaign=r5a repo=$REPO work=$WORK head=$(git -C "$REPO" rev-parse --short HEAD)" >> "$WORK/logs/phases.txt"

phase() { # name timeout_s cmd...
    local name="$1" tmo="$2"; shift 2
    if grep -q "^$name exit=0 " "$WORK/logs/phases.txt" 2>/dev/null; then
        echo "=== $name: already done, skipping ==="
        return 0
    fi
    # self-check: the exec target must exist before we burn the timeout
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
    print("corpus synthesized (seed 1234 — bit-identical to runs/r4)")
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

# ---- 1) w2v_MD_VAE, reference-default 50 epochs -----------------------------
run_train w2v_mdvae 14400 w2v_MD_VAE
run_test  w2v_mdvae 2400  w2v_MD_VAE

# ---- 2) w2v_MD_VAE_sfl, 30 epochs (r4 sfl matrix horizon) -------------------
run_train w2v_sfl 10800 w2v_MD_VAE_sfl --extra_overrides "{model: {n_epochs: 30}}"
run_test  w2v_sfl 2400  w2v_MD_VAE_sfl

echo "=== part A done ==="
grep -v "^#" "$WORK/logs/phases.txt"
