#!/usr/bin/env bash
# Round-5 quality campaign, part D: replicate the extended-horizon
# flagship ascent at a SECOND seed.  The 300-epoch seed-7777 run is the
# best flagship result of the project (TEST F1 26.36 / soft 3.83 /
# boundary.f1 58.0); this phase runs seed 555 — the 50-ep sweep's other
# "late excursion" seed (F1 14.36 rising at cutoff) — at the same 6x
# horizon to show the sustained-ascent dynamics are not a one-seed fluke.
# Reference horizon: 50 epochs (MD_VAE/model.yaml:1); the self-training
# cycle escapes the flag-nothing basin only well past it.
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
echo "$(date -u +%FT%TZ) campaign=r5d repo=$REPO work=$WORK head=$(git -C "$REPO" rev-parse --short HEAD)" >> "$WORK/logs/phases.txt"

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
# Guard on the LAST file generate_corpus writes, not the directory: a
# killed synthesis leaves a partial original_dataset/ that a dir-existence
# check happily reuses (train then dies on the missing FA segmentation).
if not (root / "original_dataset" / "forced_alignment_segmentation.json").exists():
    import shutil
    shutil.rmtree(root / "original_dataset", ignore_errors=True)
    generate_corpus(root, n_speakers=30, utts_per_speaker=75)
    print("corpus synthesized (seed 1234 — bit-identical to runs/r4)")
EOF

COMMON=(--dataset SynAudioMNIST --language digits --n_phonemes 12
        --scan_epoch True --bf16 True --noprogressbar True
        --async_ckpt True --ckpt_opt_state False)
CFG="$REPO/config/run.yaml"
MDVAE300_W="{model: {n_epochs: 300, phn_recog_bce_weight: 1, boundary_bce_weight: 1, recon_weight: 1}}"

phase train_mdvae300_s555 5400 python -m mlvae_tpu.cli.train "$CFG" \
    "${COMMON[@]}" --model_class MD_VAE --model_name mdvae300_s555 \
    --model "!include:$REPO/mlvae_tpu/models/MD_VAE/model.yaml" \
    --seed 555 --extra_overrides "$MDVAE300_W"
phase test_mdvae300_s555 1500 python -m mlvae_tpu.cli.test "$CFG" \
    "${COMMON[@]}" --model_class MD_VAE --model_name mdvae300_s555 \
    --model "!include:$REPO/mlvae_tpu/models/MD_VAE/model.yaml" \
    --seed 555 --extra_overrides "$MDVAE300_W"

echo "=== part D done ==="
grep -v "^#" "$WORK/logs/phases.txt"
