"""Data layer tests: encoder, dynamic dataset, synthetic corpus end-to-end
prep, padded batching, annotation generation, saved-MD cleaning."""
import json

import numpy as np
import pytest

from mlvae_tpu.data.encoder import LabelEncoder
from mlvae_tpu.data.dataset import DynamicItemDataset
from mlvae_tpu.data.batch import PaddedBatch, DataLoader
from mlvae_tpu.data import annotations as ann
from mlvae_tpu.data.synth import generate_corpus
from mlvae_tpu.data.datasets.SynAudioMNIST import prepare as syn_prepare
from mlvae_tpu.data.data_io import prepare_datasets, OUTPUT_KEYS
from mlvae_tpu.utils.phonemes import PhonemeSetHandler, get_phoneme_set


def test_label_encoder_blank_and_roundtrip(tmp_path):
    enc = LabelEncoder()
    enc.update_from_iterable(["sil", "aa", "bb"])
    enc.insert_blank(index=0)
    assert enc.encode_label(LabelEncoder.BLANK) == 0
    assert enc.encode_label("sil") == 1
    assert len(enc) == 4
    ids = enc.encode_sequence(["aa", "bb", "sil"])
    np.testing.assert_array_equal(ids, [2, 3, 1])
    enc.save(tmp_path / "enc.txt")
    enc2 = LabelEncoder.load(tmp_path / "enc.txt")
    assert enc2.lab2ind == enc.lab2ind


def test_phoneme_sets():
    # the folded sets include 'err' (and closures in the 60 set), so the
    # label inventory is n_phonemes+1 / +2 entries — matching the reference's
    # encoder sizing (head dim = n_phonemes + 2 with blank inserted)
    assert len(get_phoneme_set("english", 39)) == 40
    assert len(get_phoneme_set("english", 48)) == 49
    assert len(get_phoneme_set("english", 60)) == 65
    assert len(get_phoneme_set("digits", 12)) == 12
    assert len(get_phoneme_set("pinyin", 62)) == 62
    h = PhonemeSetHandler("english", 39)
    assert h.map_phoneme("ao") == "aa"
    assert h.map_phoneme("bcl") == "sil"


def test_dynamic_dataset_pipeline_dag():
    data = {"u1": {"x": 2}, "u2": {"x": 5}}
    ds = DynamicItemDataset(data)
    ds.add_dynamic_item(lambda x: x * 2, ["x"], ["y"])

    def two_out(y):
        yield y + 1
        yield y + 2
    ds.add_dynamic_item(two_out, ["y"], ["a", "b"])
    ds.set_output_keys(["id", "a", "b"])
    s = ds[0]
    assert s == {"id": "u1", "a": 5, "b": 6}
    srt = ds.filtered_sorted(sort_key="x", reverse=True)
    assert srt.ids == ["u2", "u1"]


def test_annotation_generation():
    enc = LabelEncoder()
    enc.update_from_iterable(["sil", "p1", "p2"])
    seg = [(0.1, 0.3), (0.3, 0.5)]
    ids = enc.encode_sequence(["p1", "p2"])
    flvl = ann.generate_flvl_annotation(enc, 10, 0.5, seg, ids)
    np.testing.assert_array_equal(flvl, [0, 0, 1, 1, 1, 1, 2, 2, 2, 2])
    boundary, phn_end = ann.generate_boundary_seq(10, 0.5, seg)
    assert boundary[0] == 1 and boundary[6] == 1 and boundary.sum() == 2
    np.testing.assert_array_equal(phn_end, [0.3 * 16000, 0.5 * 16000])


def test_boundary_collision_bump_right():
    seg = [(0.0, 0.01), (0.01, 0.5), (0.02, 0.5)]
    boundary, _ = ann.generate_boundary_seq(10, 0.5, seg)
    # second segment start maps to frame 0 (occupied) -> bumped to 1
    assert boundary[0] == 1 and boundary[1] == 1
    assert boundary.sum() == 3


def test_saved_md_appliers():
    x = list(range(10))
    res = [[1, 0.2, 0.4]]  # phoneme 1, frames 2..4
    assert ann.apply_flvl_saved_md_results(x, res) == [0, 1, 4, 5, 6, 7, 8, 9]
    assert ann.apply_plvl_saved_md_results([10, 11, 12], res) == [10, 12]
    b = np.array([1, 0, 0, 1, 0, 1, 0, 0, 0, 0])
    out = ann.apply_boundary_saved_md_results(b, res)  # drop frames 3..4
    np.testing.assert_array_equal(out, [1, 0, 0, 1, 0, 0, 0, 0])


def test_clean_boundary_seq_remap():
    res = [[1, 0.2, 0.4]]  # flagged phoneme index 1
    # fa spans: markers at 0 / 3 / 5 -> flagged span = frames 3..4
    fa = np.array([1, 0, 0, 1, 0, 1, 0, 0, 0, 0])
    invalid = ann.flagged_frame_indices(fa, res)
    assert invalid == [3, 4]
    # cleaning fa against its own spans == dropping the invalid frames
    out_fa = ann.clean_boundary_seq_remap(fa, res, invalid)
    np.testing.assert_array_equal(
        out_fa, ann.apply_boundary_saved_md_results(fa, res))
    # gt markers disagree with fa (gt at 0/2/6): the cleaned key must keep
    # the cleaned feat's LENGTH (10-2=8) while dropping the flagged marker
    # and shifting the survivors left past the dropped block
    gt = np.array([1, 0, 1, 0, 0, 0, 1, 0, 0, 0])
    out_gt = ann.clean_boundary_seq_remap(gt, res, invalid)
    assert len(out_gt) == 8 and int(out_gt.sum()) == 2
    np.testing.assert_array_equal(out_gt, [1, 0, 0, 0, 1, 0, 0, 0])
    # marker INSIDE the dropped span lands at the span start slot,
    # bump-right on collision with an earlier surviving marker
    gt2 = np.array([1, 0, 1, 1, 0, 0, 0, 0, 0, 0])
    out_gt2 = ann.clean_boundary_seq_remap(gt2, [[0, 0, 0]], [0, 1])
    assert len(out_gt2) == 8 and int(out_gt2.sum()) == 2
    np.testing.assert_array_equal(out_gt2, [1, 1, 0, 0, 0, 0, 0, 0])


def test_padded_batch_relative_lens():
    samples = [
        {"id": "a", "feat": np.ones((50, 3), np.float32)},
        {"id": "b", "feat": np.ones((30, 3), np.float32)},
    ]
    batch = PaddedBatch(samples, time_bucket=32)
    feats, lens = batch["feat"]
    assert feats.shape == (2, 64, 3)
    # round(rel * padded) recovers exact counts
    assert round(float(lens[0]) * 64) == 50
    assert round(float(lens[1]) * 64) == 30
    assert feats[1, 30:].sum() == 0


@pytest.fixture(scope="module")
def syn_hparams(tmp_path_factory):
    root = tmp_path_factory.mktemp("syn") / "SynAudioMNIST"
    generate_corpus(root, n_speakers=4, utts_per_speaker=3)
    from mlvae_tpu.ops.fbank import Fbank
    hparams = {
        "dataset": "SynAudioMNIST",
        "sample_rate": 16000,
        "blank_index": 0,
        "sorting": "descending",
        "apply_saved_md_results": False,
        "saved_md_results_model_name": None,
        "train_dataloader_opts": {"batch_size": 2},
        "kaldi_feature_params": {
            "sample_rate": 16000, "hop_length": 20, "n_fft": 400, "n_mels": 40,
        },
        "compute_features": Fbank(deltas=True),
        "prepare": {
            "dataset_dir": str(root / "original_dataset"),
            "train_json_path": str(root / "annotation/train.json"),
            "valid_json_path": str(root / "annotation/valid.json"),
            "test_json_path": str(root / "annotation/test.json"),
            "phoneme_set_handler": PhonemeSetHandler("digits", 12),
        },
    }
    syn_prepare.prepare(**hparams["prepare"])
    return hparams


def test_synth_prepare_schema(syn_hparams):
    with open(syn_hparams["prepare"]["train_json_path"]) as f:
        data = json.load(f)
    assert len(data) > 0
    sample = next(iter(data.values()))
    for key in ["wav_path", "duration", "spk_id", "txt_gt_phn_seq",
                "txt_gt_cnncl_seq", "gt_seg_seq", "fa_seg_seq"]:
        assert key in sample
    assert len(sample["txt_gt_phn_seq"]) == len(sample["gt_seg_seq"])


def test_prepare_datasets_end_to_end(syn_hparams):
    datasets, label_encoder = prepare_datasets(syn_hparams)
    assert len(datasets) == 3
    assert len(label_encoder) == 13  # 12 digits+sil+err plus blank
    train = datasets[0]
    s = train[0]
    assert set(s.keys()) == set(OUTPUT_KEYS)
    T = s["feat"].shape[0]
    assert s["feat"].shape[1] == 120
    assert s["kaldi_feat"].shape == (T, 120)
    assert s["flvl_gt_phn_seq"].shape == (T,)
    assert s["gt_boundary_seq"].shape == (T,)
    assert s["gt_boundary_seq"].sum() == len(s["gt_phn_seq"])
    assert s["fa_boundary_seq"].sum() == len(s["gt_phn_seq"])
    md = np.asarray(s["plvl_gt_md_lbl_seq"])
    np.testing.assert_array_equal(
        md, np.asarray(s["gt_phn_seq"]) != np.asarray(s["gt_cnncl_seq"])
    )
    prior = np.asarray(s["prior"])
    assert abs(prior.sum() - 1.0) < 1e-5

    # second call hits the cache (no recompute) and returns same content
    datasets2, _ = prepare_datasets(syn_hparams)
    s2 = datasets2[0][0]
    np.testing.assert_allclose(s["feat"], s2["feat"], rtol=1e-6)

    # dataloader produces SB-convention (array, lens) pairs
    loader = DataLoader(train, batch_size=2)
    batch = next(iter(loader))
    feats, lens = batch["feat"]
    assert feats.ndim == 3 and feats.shape[2] == 120
    assert len(batch["id"]) == 2
    prior_b, _ = batch["prior"]
    np.testing.assert_allclose(prior_b[0], prior, rtol=1e-6)


def test_prefetch_preserves_order_and_propagates_errors():
    from mlvae_tpu.data.batch import prefetch

    assert list(prefetch(range(100), depth=3)) == list(range(100))

    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        next(it)

    # early consumer exit must not deadlock the producer
    for x in prefetch(iter(range(1000)), depth=1):
        if x == 3:
            break


def test_data_cleaning_drops_fully_excised_utterances(tmp_path, monkeypatch):
    """An utterance whose every phoneme is flagged as mispronounced has
    nothing left after cleaning; it must be dropped (with a log), not left
    as zero-length arrays that break batching (corpus-scale regression)."""
    import json
    import pickle

    monkeypatch.chdir(tmp_path)
    from mlvae_tpu.data.synth import generate_corpus
    from mlvae_tpu.data.datasets.SynAudioMNIST import prepare as syn_prepare
    from mlvae_tpu.data import data_io
    from mlvae_tpu.ops.fbank import Fbank
    from mlvae_tpu.utils.phonemes import PhonemeSetHandler

    root = tmp_path / "datasets/SynAudioMNIST"
    generate_corpus(root, n_speakers=4, utts_per_speaker=3)
    hparams = {
        "dataset": "SynAudioMNIST",
        "sample_rate": 16000,
        "blank_index": 0,
        "sorting": "descending",
        "apply_saved_md_results": False,
        "saved_md_results_model_name": "fake_model",
        "train_dataloader_opts": {"batch_size": 2},
        "kaldi_feature_params": {
            "sample_rate": 16000, "hop_length": 20, "n_fft": 400,
            "n_mels": 40,
        },
        "compute_features": Fbank(deltas=True),
        "language": "digits",
        "n_phonemes": 12,
        "prepare": {
            "dataset_dir": str(root / "original_dataset"),
            "train_json_path": str(root / "annotation/train.json"),
            "valid_json_path": str(root / "annotation/valid.json"),
            "test_json_path": str(root / "annotation/test.json"),
            "phoneme_set_handler": PhonemeSetHandler("digits", 12),
        },
    }
    syn_prepare.prepare(**hparams["prepare"])
    datasets, _ = data_io.prepare_datasets(hparams)

    # flag EVERY phoneme of the first train utterance as mispronounced
    with open(root / "computed_dataset/train.pkl", "rb") as f:
        computed = pickle.load(f)
    victim = next(iter(computed))
    seg = computed[victim]["gt_seg_seq"]
    results = [[i, float(i) / len(seg), float(i + 1) / len(seg)]
               for i in range(len(seg))]
    saved_dir = root / "saved_md_results"
    saved_dir.mkdir(exist_ok=True)
    (saved_dir / "fake_model.json").write_text(
        json.dumps({victim: results}))

    hparams["apply_saved_md_results"] = True
    # the dump above covers one train utterance and nothing in valid/test:
    # the zero-coverage splits must warn loudly (a TEST-only cli.test dump
    # otherwise makes a "cleaned" retrain silently reproduce the base run)
    with pytest.warns(UserWarning, match=r"cover 0/\d+ utterances"):
        datasets, _ = data_io.prepare_datasets(hparams)
    train = datasets[0]
    assert victim not in train.ids
    assert len(train) == len(computed) - 1
    # remaining utterances batch fine
    from mlvae_tpu.data.batch import PaddedBatch
    PaddedBatch([train[i] for i in range(min(2, len(train)))])


def test_boundary_applier_clamps_when_collision_dropped_a_boundary():
    """A bump-right collision can push a boundary past the last frame, so
    the boundary seq carries fewer 1s than phonemes; flagging the LAST
    phoneme must clamp to the tail instead of indexing past the end (the
    reference crashes there, data_io_utils.py:301-303)."""
    from mlvae_tpu.data.annotations import apply_boundary_saved_md_results

    # 3 phonemes but only 2 boundaries survived (T=4)
    boundary = [1, 0, 1, 0]
    # flag phoneme 2 (no boundary of its own): nothing indexable -> clamp
    out = apply_boundary_saved_md_results(boundary, [[2, 0.5, 1.0]])
    assert list(out) == [1, 0, 1, 0]
    # flag phoneme 1: spans idx_seq[1]=2 .. idx_seq[2]=len -> drops [2,4)
    out = apply_boundary_saved_md_results(boundary, [[1, 0.5, 1.0]])
    assert list(out) == [1, 0]


def test_dynamic_item_single_provides_generator():
    """SpeechBrain-style single-output pipelines may use `yield`; the
    yielded VALUE must be cached, not the generator object."""
    from mlvae_tpu.data.dataset import DynamicItemDataset

    ds = DynamicItemDataset({"u1": {"x": 3}}, output_keys=["y"])

    def pipe(x):
        yield x * 2

    ds.add_dynamic_item(pipe, ["x"], ["y"])
    assert ds.compute_sample("u1")["y"] == 6


class TestDegradedDeviceFallback:
    """data_io.DegradedDeviceFallback: permanent host-CPU fallback once two
    consecutive post-compile chunks' device round trips exceed the threshold
    (the degraded-tunnel windows documented in docs/PERF.md).  The first
    call carries jit compilation and never counts."""

    def _runner(self, monkeypatch, slow_s, backend="tpu"):
        import jax
        from mlvae_tpu.data import data_io
        monkeypatch.setattr(jax, "default_backend", lambda: backend)
        calls = []

        def fn(x):
            calls.append(jax.config.jax_default_device)
            return x * 2.0

        return data_io.DegradedDeviceFallback(fn, slow_s=slow_s), calls

    def test_fast_calls_stay_on_device(self, monkeypatch):
        r, calls = self._runner(monkeypatch, slow_s=1e9)
        x = np.ones((4,), np.float32)
        np.testing.assert_allclose(r(x), 2 * x)
        assert not r.host_fallback
        assert calls == [None]  # no default_device override applied

    def test_slow_calls_trip_permanent_fallback(self, monkeypatch):
        r, calls = self._runner(monkeypatch, slow_s=1e-9)
        x = np.ones((4,), np.float32)
        np.testing.assert_allclose(r(x), 2 * x)   # call 1: compile-bearing
        assert not r.host_fallback                # ...never counts
        np.testing.assert_allclose(r(x), 2 * x)   # slow call 1 of 2
        assert not r.host_fallback
        np.testing.assert_allclose(r(x), 2 * x)   # slow call 2 of 2: trips
        assert r.host_fallback
        np.testing.assert_allclose(r(x), 2 * x)   # runs under CPU default
        assert calls[0] is None
        assert calls[1] is None
        assert calls[2] is None
        assert calls[3] is not None               # cpu device pinned
        assert calls[3].platform == "cpu"

    def test_one_off_stall_recovers(self, monkeypatch):
        # a single slow post-compile call followed by a fast one must NOT
        # trip (requires the environment knob to distinguish fast/slow: use
        # a mutable threshold on the instance)
        r, _ = self._runner(monkeypatch, slow_s=1e-9)
        x = np.ones((4,), np.float32)
        r(x)                       # compile-bearing
        r(x)                       # slow 1 of 2
        r.slow_s = 1e9             # next call measures fast
        r(x)
        assert not r.host_fallback
        assert r._consecutive_slow == 0
        r.slow_s = 1e-9            # a later isolated slow call: still 1 of 2
        r(x)
        assert not r.host_fallback

    def test_threshold_zero_disables(self, monkeypatch):
        r, _ = self._runner(monkeypatch, slow_s=0)
        r(np.ones((2,), np.float32))
        assert not r.host_fallback

    def test_cpu_backend_never_trips(self, monkeypatch):
        r, _ = self._runner(monkeypatch, slow_s=1e-9, backend="cpu")
        r(np.ones((2,), np.float32))
        assert not r.host_fallback
