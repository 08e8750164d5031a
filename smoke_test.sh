#!/usr/bin/env bash
# Smoke test mirroring the reference's test.sh: 1 debug epoch of CRDNN_CTC
# on the (synthesized) SynAudioMNIST corpus, then the flagship MD_VAE.
set -euxo pipefail

REPO="$(cd "$(dirname "$0")" && pwd)"
WORKDIR="${1:-/tmp/mlvae_smoke}"
mkdir -p "$WORKDIR"
cd "$WORKDIR"

# append (not overwrite): the ambient PYTHONPATH may carry the TPU plugin
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

python -m mlvae_tpu.cli.train "$REPO/config/run.yaml" \
    --dataset SynAudioMNIST --language digits --n_phonemes 12 \
    --model_class CRDNN_CTC --model_name test_model \
    --model "!include:$REPO/mlvae_tpu/models/CRDNN_CTC/model.yaml" \
    --extra_overrides "{model: {n_epochs: 1}}" --debug --debug_batches 2

python -m mlvae_tpu.cli.train "$REPO/config/run.yaml" \
    --dataset SynAudioMNIST --language digits --n_phonemes 12 \
    --model_class MD_VAE --model_name md_vae_smoke \
    --model "!include:$REPO/mlvae_tpu/models/MD_VAE/model.yaml" \
    --extra_overrides "{model: {n_epochs: 3}}" --debug --debug_batches 2

python -m mlvae_tpu.cli.test "$REPO/config/run.yaml" \
    --dataset SynAudioMNIST --language digits --n_phonemes 12 \
    --model_class MD_VAE --model_name md_vae_smoke \
    --model "!include:$REPO/mlvae_tpu/models/MD_VAE/model.yaml" --debug

echo "smoke test OK"
