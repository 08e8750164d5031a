#!/usr/bin/env bash
# Phase 2 of the seed A/B: the old worktree (b7308aa) predates pre-resolution
# extra_overrides, so `{seed: N}` never reached `!apply:torch.manual_seed`
# there (old_s7 == old_s123456 exactly).  Vary the old arm's seed by editing a
# copy of its run.yaml instead.  Waits for phase 1 to finish (single chip).
set -u
WORK="${1:-/root/runs/r2}"
cd "$WORK"
SUMMARY="$WORK/logs/seed_ab.txt"

# wait for phase 1 (up to 40 min)
for _ in $(seq 240); do grep -q '^done' "$SUMMARY" 2>/dev/null && break; sleep 10; done

run_seeded_cfg() { # repo name seed
    local repo="$1" name="$2" seed="$3" t0=$SECONDS rc peak cfg
    cfg="$WORK/run_seed_$seed.yaml"
    sed "s/^seed: .*/seed: $seed/" "$repo/config/run.yaml" > "$cfg"
    PYTHONPATH="$repo:/root/.axon_site" timeout 1200 python -m mlvae_tpu.cli.train \
        "$cfg" \
        --dataset SynAudioMNIST --language digits --n_phonemes 12 \
        --scan_epoch True --bf16 True --noprogressbar True --async_ckpt True \
        --model_class MD_VAE --model_name "$name" \
        --model "!include:$repo/mlvae_tpu/models/MD_VAE/model.yaml" \
        > "logs/train_$name.log" 2>&1
    rc=$?
    peak=$(grep -o 'plvl_md.F1: [0-9.]*' "results/$name/train_log.txt" 2>/dev/null |
           awk '{print $2}' | sort -n | tail -1)
    echo "$name repo=$repo seed=$seed rc=$rc wall=$((SECONDS-t0))s peakValidF1=${peak:-NA}" >> "$SUMMARY"
}

run_seeded_cfg /root/wt_old mdvae_old_cs7    7
run_seeded_cfg /root/wt_old mdvae_old_cs1986 1986
run_seeded_cfg /root/wt_old mdvae_old_cs31   31
run_seeded_cfg /root/repo   mdvae_head_cs31  31
echo done2 >> "$SUMMARY"
