"""Inference entry: mispronunciation detection for a single utterance.

Serving-path tool (no reference counterpart — the reference only evaluates
datasets): loads the best checkpoint of a trained MD recipe, runs the
feature front-end + forward pass + on-device Viterbi decode on ONE wav
file given its canonical phoneme sequence, and prints the per-phoneme
verdicts.

    python -m mlvae_tpu.cli.infer config/run.yaml \
        --dataset ... --model_class MD_VAE --model_name my_run \
        --model '!include:.../model.yaml' \
        --wav path/to/utt.wav --canonical "w ah n , t uw"
"""
from __future__ import annotations

import logging
import sys

import numpy as np

logger = logging.getLogger(__name__)


def infer(model, hparams, label_encoder, wav_path, canonical_phonemes,
          prior=None):
    import jax
    from mlvae_tpu.data.batch import PaddedBatch
    from mlvae_tpu.data.wav import read_wav, resample
    from mlvae_tpu.models.MD_VAE.model import Target
    from mlvae_tpu.training.brain import Stage

    wave, sr = read_wav(wav_path)
    if sr != hparams["sample_rate"]:
        wave = resample(wave, sr, hparams["sample_rate"])
    feats = np.asarray(hparams["compute_features"](wave[None]))[0]

    cnncl = label_encoder.encode_sequence(canonical_phonemes)
    T = feats.shape[0]
    if prior is None:
        prior = np.full(len(label_encoder), 1.0 / len(label_encoder),
                        np.float32)

    sample = {
        "id": str(wav_path),
        "feat": feats.astype(np.float32),
        "kaldi_feat": feats.astype(np.float32),
        "gt_cnncl_seq": cnncl,
        "fa_boundary_seq": _uniform_boundary(T, len(cnncl)),
        "gt_boundary_seq": _uniform_boundary(T, len(cnncl)),
        "plvl_gt_md_lbl_seq": np.zeros(len(cnncl), np.int64),
        "prior": prior,
    }
    batch = PaddedBatch([sample])

    model.target = Target.TEST
    model.training = False
    if model.params is None:
        model.init_params()
    model.on_evaluate_start(max_key=hparams["model"].get("max_key"),
                            min_key=hparams["model"].get("min_key"))
    # prepare_batch enforces the decode's T >= L precondition (a too-short
    # wav would otherwise yield a silently truncated boundary sequence)
    batch = model.prepare_batch(batch)
    dev_batch = model.to_device_batch(batch)
    model.ensure_states(int(feats.shape[1]))
    model._batch_ids = batch["id"]
    step = model._get_compiled("eval", Stage.TEST)
    preds, _, _ = step(model.params, model.states, jax.random.PRNGKey(0),
                       dev_batch, np.int32(0))

    t_lens = np.asarray(preds["decoded_t_lens"])
    l_lens = np.asarray(preds["decoded_l_lens"])
    boundary = np.asarray(preds["decoded_boundary_seq"])[0, : t_lens[0]]
    plvl = np.asarray(preds["decoded_plvl_md_lbl_seq"])[0, : l_lens[0]]
    starts = np.where(boundary == 1)[0]
    hop_s = hparams["hop_length"] / 1000.0
    results = []
    for i, phn in enumerate(canonical_phonemes):
        decoded = i < len(starts) and i < len(plvl)
        results.append({
            "phoneme": phn,
            # None marks an undecoded phoneme honestly; a fabricated 0.0
            # would read as a real (non-monotonic) timestamp
            "start_sec": round(float(starts[i]) * hop_s, 3)
            if decoded else None,
            "mispronounced": bool(plvl[i]) if decoded else None,
        })
    return results


def _uniform_boundary(T: int, L: int) -> np.ndarray:
    seq = np.zeros(T, np.float32)
    for i in range(L):
        seq[min(int(i * T / L), T - 1)] = 1
    return seq


def main(argv=None):
    logging.basicConfig(level=logging.INFO, stream=sys.stdout)
    args = list(argv if argv is not None else sys.argv[1:])

    def pop_opt(name):
        i = args.index(name)
        value = args[i + 1]
        del args[i:i + 2]
        return value

    wav_path = pop_opt("--wav")
    canonical = pop_opt("--canonical").replace(",", " ").split()

    from mlvae_tpu.cli.experiment import prepare_experiment
    prepared = prepare_experiment(args, prepare_exp_dir=False)
    results = infer(
        prepared["model"], prepared["hparams"], prepared["label_encoder"],
        wav_path, canonical,
        prior=np.asarray(prepared["datasets"][0][0]["prior"]),
    )
    for r in results:
        verdict = "MISPRONOUNCED" if r["mispronounced"] else "ok"
        print(f"{r['start_sec']:8.3f}s  {r['phoneme']:6s} {verdict}")
    return results


if __name__ == "__main__":
    main()
