"""Dataset-prepare scripts over synthetic fixtures: TextGrid parsing,
L2-ARCTIC, TIMIT, ChineseDPA, sclite parsing, external-source scoring,
KoG2P."""
import json
from pathlib import Path

import numpy as np
import pytest

from mlvae_tpu.data.textgrid import read_textgrid, write_textgrid
from mlvae_tpu.data.wav import write_wav
from mlvae_tpu.utils.phonemes import PhonemeSetHandler


def test_textgrid_roundtrip(tmp_path):
    path = tmp_path / "x.TextGrid"
    write_textgrid(path, {
        "words": [(0.0, 0.5, "hello"), (0.5, 1.0, "world")],
        "phones": [(0.0, 0.25, "hh"), (0.25, 0.5, "ah,aa"),
                   (0.5, 1.0, "w")],
    })
    tg = read_textgrid(path)
    words = tg.get_tier_by_name("words")
    assert [i.text for i in words] == ["hello", "world"]
    phones = tg.get_tier_by_name("phones")
    assert [i.text for i in phones] == ["hh", "ah,aa", "w"]
    assert phones.intervals[1].start_time == 0.25


def test_l2_arctic_prepare(tmp_path):
    from mlvae_tpu.data.datasets.L2_ARCTIC import prepare as l2

    root = tmp_path / "L2_ARCTIC"
    ds_dir = root / "original_dataset"
    fa = {}
    # one utterance per speaker across all splits
    for spk in l2.TRAIN_SPKS[:2] + l2.VALID_SPKS[:1] + l2.TEST_SPKS[:1]:
        (ds_dir / spk / "annotation").mkdir(parents=True)
        (ds_dir / spk / "wav").mkdir(parents=True)
        utt = "arctic_a0001"
        write_textgrid(ds_dir / spk / "annotation" / f"{utt}.TextGrid", {
            "words": [(0.0, 0.5, "hi")],
            # 'ao,aa' = canonical ao, pronounced aa -> folded: both -> aa
            # 'ih,iy1' = canonical ih, pronounced iy
            "phones": [(0.0, 0.25, "ao"), (0.25, 0.5, "ih,iy1")],
        })
        write_wav(ds_dir / spk / "wav" / f"{utt}.wav",
                  np.zeros(8000, np.float32))
        fa[f"{spk}_a0001"] = [[0.0, 0.26], [0.26, 0.5]]
    (root / "fa_segmentation.json").write_text(json.dumps(fa))

    handler = PhonemeSetHandler("english", 39)
    ann = root / "annotation"
    l2.prepare(ds_dir, ann / "train.json", ann / "valid.json",
               ann / "test.json", handler)
    train = json.loads((ann / "train.json").read_text())
    assert len(train) == 2
    sample = next(iter(train.values()))
    assert sample["txt_gt_cnncl_seq"] == ["aa", "ih"]  # ao folds to aa
    assert sample["txt_gt_phn_seq"] == ["aa", "iy"]
    assert sample["fa_seg_seq"] == [[0.0, 0.26], [0.26, 0.5]]
    assert (root / "kaldi_data/train.utt2spk").exists()


def test_timit_prepare(tmp_path):
    from mlvae_tpu.data.datasets.TIMIT import prepare as timit

    root = tmp_path / "TIMIT" / "original_dataset"
    for split, spk in [("train", "mabc0"), ("test", "mdab0"),
                       ("test", "faks0")]:
        d = root / split / "dr1" / spk
        d.mkdir(parents=True)
        write_wav(d / "si1.wav", np.zeros(8000, np.float32))
        # h# sil, ao->aa, q->err(dropped? no: q->err kept), kcl sil run
        (d / "si1.phn").write_text(
            "0 800 h#\n800 2400 ao\n2400 3200 kcl\n3200 4000 bcl\n"
            "4000 7200 iy\n7200 8000 h#\n"
        )
        # SA files must be excluded
        write_wav(d / "sa1.wav", np.zeros(8000, np.float32))
        (d / "sa1.phn").write_text("0 8000 h#\n")

    handler = PhonemeSetHandler("english", 39)
    ann = tmp_path / "TIMIT" / "annotation"
    timit.prepare(root, ann / "train.json", ann / "valid.json",
                  ann / "test.json", handler)
    train = json.loads((ann / "train.json").read_text())
    assert list(train) == ["mabc0_si1"]
    s = train["mabc0_si1"]
    # h# sil kept, ao->aa, kcl+bcl fold to sil and collapse to ONE sil
    assert s["txt_gt_phn_seq"] == ["sil", "aa", "sil", "iy", "sil"]
    assert s["txt_gt_cnncl_seq"] == s["txt_gt_phn_seq"]
    # collapsed sil spans stretch back to the previous phoneme's end
    segs = s["gt_seg_seq"]
    assert segs[2][0] == segs[1][1]
    valid = json.loads((ann / "valid.json").read_text())
    test = json.loads((ann / "test.json").read_text())
    assert list(valid) == ["faks0_si1"]
    assert list(test) == ["mdab0_si1"]


def test_chinese_dpa_prepare(tmp_path):
    from mlvae_tpu.data.datasets.ChineseDPA import prepare as dpa

    root = tmp_path / "ChineseDPA" / "original_dataset"
    (root / "formatted_chinese_dpa").mkdir(parents=True)
    for set_name in ["train", "valid", "test"]:
        meta = {"spk1": {f"{set_name}_u1": {
            "wav_path": f"{set_name}_u1.wav", "duration": 0.5,
        }}}
        (root / f"metadata_{set_name}_spk_level.json").write_text(
            json.dumps(meta)
        )
        write_wav(root / "formatted_chinese_dpa" / f"{set_name}_u1.wav",
                  np.zeros(8000, np.float32))
        write_textgrid(
            root / "formatted_chinese_dpa" / f"{set_name}_u1.TextGrid",
            {
                "initial/final": [(0.0, 0.25, "zh1"), (0.25, 0.5, "ang4")],
                "mispronunciation": [(0.0, 0.25, ""), (0.25, 0.5, "+")],
            },
        )
    ann = tmp_path / "ChineseDPA" / "annotation"
    dpa.prepare(root, ann / "train.json", ann / "valid.json",
                ann / "test.json")
    train = json.loads((ann / "train.json").read_text())
    s = train["train_u1"]
    assert s["txt_gt_cnncl_seq"] == ["zh", "ang"]  # tone digit stripped
    assert s["txt_gt_phn_seq"] == ["zh", "err"]    # misp flagged -> err


def test_parse_filt_prf(tmp_path):
    from mlvae_tpu.data.parsers import parse_filt_prf

    header = "\n" * 25
    body = (
        'File: utt1\n'
        'REF:  one two *** three\n'
        'HYP:  one six two three\n'
        'H_T1: 0.0 0.5 0.9 1.0\n'
        'H_T2: 0.5 0.9 1.0 1.5\n'
    )
    path = tmp_path / "x.filt.prf"
    path.write_text(header + body)
    out = parse_filt_prf(path, tmp_path / "out.json")
    # insertion ('two' in HYP vs *** in REF slot) dropped; 3 entries remain
    assert list(out) == ["utt1"]
    assert len(out["utt1"]) == 3
    assert out["utt1"][0] == [0.0, 0.5, "one"]
    assert (tmp_path / "out.json").exists()


def test_kog2p_basic():
    from mlvae_tpu.utils.kog2p import g2p, decompose

    syl = decompose("한")  # h-a-n
    assert syl == [["h0", "aa", "nf"]]
    phones = g2p("한국")
    assert phones[0] == "h0" and "nf" in phones
    # final-consonant neutralization: 빛 coda ch -> tf
    assert g2p("빛")[-1] == "tf"


def test_kog2p_sandhi_processes():
    from mlvae_tpu.utils.kog2p import g2p

    # nasalization, liquidization, palatalization, aspiration,
    # tensification, liaison, cluster simplification
    assert g2p("독립") == ["t0", "oo", "ng", "nn", "ii", "pf"]     # 동닙
    assert g2p("신라") == ["s0", "ii", "ll", "rr", "aa"]           # 실라
    assert g2p("같이") == ["k0", "aa", "ch", "ii"]                 # 가치
    assert g2p("좋다") == ["c0", "oo", "th", "aa"]                 # 조타
    assert g2p("학교") == ["h0", "aa", "kf", "kk", "yo"]           # 학꾜
    assert g2p("한국어") == ["h0", "aa", "nf", "k0", "uu", "k0",
                             "vv"]                                  # 한구거
    assert g2p("값") == ["k0", "aa", "pf"]                          # 갑


def test_kog2p_rulebook_loader(tmp_path):
    from mlvae_tpu.utils.kog2p import (apply_rules, g2p, graph2phone,
                                       read_rules)

    # KoG2P rulebook format: tab-separated regex pattern/replacement with
    # '#' comment lines; a user rulebook overrides the built-in rules
    rb = tmp_path / "rules.txt"
    rb.write_text("# comment line\nkf,-rr,\tng,-nn,\n", encoding="utf-8")
    rules = read_rules(str(rb))
    assert rules == [("kf,-rr,", "ng,-nn,")]
    assert apply_rules("t0,oo,kf,-rr,ii,pf,", rules) \
        == "t0,oo,ng,-nn,ii,pf,"
    assert g2p("독립", rulebook=str(rb)) \
        == ["t0", "oo", "ng", "nn", "ii", "pf"]
    # romanization invariants: '-' syllable / '#' word delimiters
    assert graph2phone("한 국") == "h0,aa,nf,#k0,uu,kf,"


def test_parse_filt_prf_insertion_consumes_time_slot(tmp_path):
    """An inserted HYP token HAS an H_T1/H_T2 slot; skipping it without
    consuming shifts all later timestamps (reference bug, fixed here)."""
    from mlvae_tpu.data.parsers import parse_filt_prf

    header = "\n" * 25
    body = (
        'File: utt1\n'
        'REF:  one two *** three\n'
        'HYP:  one six two three\n'
        'H_T1: 0.0 0.5 0.9 1.0\n'
        'H_T2: 0.5 0.9 1.0 1.5\n'
    )
    path = tmp_path / "x.filt.prf"
    path.write_text(header + body)
    out = parse_filt_prf(path)
    # 'three' must get ITS slot [1.0, 1.5], not the insertion's [0.9, 1.0]
    assert out["utt1"][2] == [1.0, 1.5, "three"]


def test_parse_filt_prf_continuation_groups(tmp_path):
    """sclite wraps long alignments into REF/HYP/H_T1/H_T2 continuation
    groups without a File row; they accumulate onto the utterance."""
    from mlvae_tpu.data.parsers import parse_filt_prf

    header = "\n" * 25
    body = (
        'File: utt1\n'
        'REF:  one two\n'
        'HYP:  one two\n'
        'H_T1: 0.0 0.5\n'
        'H_T2: 0.5 0.9\n'
        'REF:  three\n'
        'HYP:  three\n'
        'H_T1: 0.9\n'
        'H_T2: 1.3\n'
        'File: utt2\n'
        'REF:  four\n'
        'HYP:  four\n'
        'H_T1: 0.0\n'
        'H_T2: 0.4\n'
    )
    (tmp_path / "y.filt.prf").write_text(header + body)
    out = parse_filt_prf(tmp_path / "y.filt.prf")
    assert len(out["utt1"]) == 3 and out["utt1"][2] == [0.9, 1.3, "three"]
    assert out["utt2"] == [[0.0, 0.4, "four"]]


def test_sphere_reader(tmp_path):
    """LDC TIMIT ships NIST SPHERE, not RIFF (the reference used sph2pipe);
    read_wav handles the PCM variant in-process."""
    import numpy as np
    from mlvae_tpu.data.wav import read_wav

    rs = np.random.RandomState(0)
    pcm = (rs.randn(1600) * 3000).astype("<i2")
    header = (
        "NIST_1A\n   1024\n"
        "sample_rate -i 16000\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 01\n"
        "sample_coding -s3 pcm\n"
        "end_head\n"
    ).encode("ascii")
    blob = header + b" " * (1024 - len(header)) + pcm.tobytes()
    path = tmp_path / "si1.WAV"
    path.write_bytes(blob)
    wave_out, sr = read_wav(path)
    assert sr == 16000 and len(wave_out) == 1600
    np.testing.assert_allclose(wave_out, pcm.astype(np.float32) / 32768.0,
                               atol=1e-6)

    # shorten compression fails with a clear error
    bad = blob.replace(b"-s3 pcm", b"-s26 pcm,embedded-shorten-v2.00")
    (tmp_path / "bad.WAV").write_bytes(bad)
    with pytest.raises(ValueError, match="shorten"):
        read_wav(tmp_path / "bad.WAV")


def test_parse_textgrid_skips_empty_slot_tokens(tmp_path):
    """L2-ARCTIC deletion/addition tokens ('CPL,,d' / ',PPL,a') have an
    empty comma slot; the reference crashes on them — skip with warning."""
    from mlvae_tpu.data.datasets.L2_ARCTIC.parse_textgrid import \
        parse_textgrid

    tg_text = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "hi"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.4
            text = "HH"
        intervals [2]:
            xmin = 0.4
            xmax = 0.7
            text = "IY,,d"
        intervals [3]:
            xmin = 0.7
            xmax = 1.0
            text = "AH,IY,s"
'''
    path = tmp_path / "u.TextGrid"
    path.write_text(tg_text)
    phns = parse_textgrid(path, "phoneme")
    cnncls = parse_textgrid(path, "canonical_phoneme")
    # the deletion interval is skipped; the substitution keeps both slots
    assert phns == ["hh", "iy"]
    assert cnncls == ["hh", "ah"]
