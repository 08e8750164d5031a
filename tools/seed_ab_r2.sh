#!/usr/bin/env bash
# Seed A/B to discriminate "regression in b7308aa..HEAD" from self-training
# variance: the two existing runs (old seed123456 peak VALID F1 35.85 /
# HEAD seed123456 peak 8.87) diverge starting exactly at the first
# Kumaraswamy-sampling epoch, i.e. plausibly an RNG-stream change
# (45cd882 Sequential rng), not a math change.  If HEAD seeds spread up to
# ~30+ and old seeds spread down, it's variance; if the distributions
# separate cleanly, bisect for a real regression.
# Serialized on the single chip.  Usage: seed_ab_r2.sh [workdir]
set -u
WORK="${1:-/root/runs/r2}"
cd "$WORK"
SUMMARY="$WORK/logs/seed_ab.txt"
: > "$SUMMARY"

run_one() { # repo name seed
    local repo="$1" name="$2" seed="$3" t0=$SECONDS rc peak
    PYTHONPATH="$repo:/root/.axon_site" timeout 1200 python -m mlvae_tpu.cli.train \
        "$repo/config/run.yaml" \
        --dataset SynAudioMNIST --language digits --n_phonemes 12 \
        --scan_epoch True --bf16 True --noprogressbar True --async_ckpt True \
        --model_class MD_VAE --model_name "$name" \
        --model "!include:$repo/mlvae_tpu/models/MD_VAE/model.yaml" \
        --extra_overrides "{seed: $seed}" \
        > "logs/train_$name.log" 2>&1
    rc=$?
    peak=$(grep -o 'plvl_md.F1: [0-9.]*' "results/$name/train_log.txt" 2>/dev/null |
           awk '{print $2}' | sort -n | tail -1)
    echo "$name repo=$repo seed=$seed rc=$rc wall=$((SECONDS-t0))s peakValidF1=${peak:-NA}" >> "$SUMMARY"
}

run_one /root/repo   mdvae_head_s7    7
run_one /root/wt_old mdvae_old_s7     7
run_one /root/repo   mdvae_head_s1986 1986
run_one /root/wt_old mdvae_old_s1986  1986
echo done >> "$SUMMARY"
