"""Shorten (SHN) decoder golden tests.

``mlvae_tpu/data/shorten.py`` is locked against an independent *encoder*
written here from the format spec: the encoder mirrors the decoder's state
machine (history wrap, running block means, bitshift domain) but shares no
code with it, so a bug in either side breaks the exact-roundtrip assertion.
Covers every sample command (DIFF0-3, QLPC, ZERO), the housekeeping
commands (BLOCKSIZE, BITSHIFT, VERBATIM), multi-channel interleaving,
nmean>0 running offsets, and the embedded-shorten SPHERE path the LDC
TIMIT distribution actually uses (reference ``prepare_kaldi.py:36-42``
undoes this with sph2pipe; we decode natively)."""
import numpy as np
import pytest

from mlvae_tpu.data.shorten import (
    FN_BITSHIFT, FN_BLOCKSIZE, FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3,
    FN_QLPC, FN_QUIT, FN_VERBATIM, FN_ZERO, LPCQUANT, TYPE_S16LH, TYPE_ULAW,
    decode_shorten, ulaw_to_linear,
)


class _BitWriter:
    def __init__(self):
        self.bits = []

    def uvar(self, value: int, k: int):
        assert value >= 0
        self.bits.extend([0] * (value >> k))
        self.bits.append(1)
        for i in range(k - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def var(self, value: int, k: int):
        u = (value << 1) if value >= 0 else (((-value - 1) << 1) | 1)
        self.uvar(u, k + 1)

    def ulong(self, value: int):
        n = int(value).bit_length()
        self.uvar(n, 2)
        self.uvar(value, n)

    def tobytes(self) -> bytes:
        pad = (-len(self.bits)) % 32  # whole big-endian words on disk
        arr = np.array(self.bits + [0] * pad, np.uint8)
        return np.packbits(arr).tobytes()


def _res_k(res) -> int:
    """Any k decodes; pick one that keeps unary parts short."""
    zz = [(v << 1) if v >= 0 else (((-v - 1) << 1) | 1) for v in res]
    return max(1, int(max(zz, default=0)).bit_length() - 1)


class _Encoder:
    """Spec-mirror encoder (version 2 semantics)."""

    def __init__(self, ftype, nchan, blocksize, maxnlpc=4, nmean=0):
        self.w = _BitWriter()
        self.nchan = nchan
        self.blocksize = blocksize
        self.nmean = nmean
        self.bitshift = 0
        self.nwrap = max(3, maxnlpc)
        self.hist = [[0] * self.nwrap for _ in range(nchan)]
        self.offs = [[0] * max(1, nmean) for _ in range(nchan)]
        self.header = bytes([0x61, 0x6A, 0x6B, 0x67, 2])  # 'ajkg' v2
        for v in (ftype, nchan, blocksize, maxnlpc, nmean, 0):
            self.w.ulong(v)

    def _coffset(self, chan) -> int:
        if self.nmean == 0:
            return self.offs[chan][0]
        s = self.nmean // 2 + sum(self.offs[chan])
        q = int(np.trunc(s / self.nmean))
        n = self.bitshift
        return q if n == 0 else ((q >> (n - 1)) + 1) >> 1

    def _post_block(self, chan, buf):
        if self.nmean > 0:
            s = self.blocksize // 2 + sum(buf)
            self.offs[chan].pop(0)
            self.offs[chan].append(
                int(np.trunc(s / self.blocksize)) << self.bitshift)
        self.hist[chan] = (self.hist[chan] + list(buf))[-self.nwrap:]

    def set_bitshift(self, n: int):
        self.w.uvar(FN_BITSHIFT, 2)
        self.w.uvar(n, 2)
        self.bitshift = n

    def set_blocksize(self, n: int):
        self.w.uvar(FN_BLOCKSIZE, 2)
        self.w.ulong(n)
        self.blocksize = n

    def verbatim(self, data: bytes):
        self.w.uvar(FN_VERBATIM, 2)
        self.w.uvar(len(data), 5)
        for b in data:
            self.w.uvar(b, 8)

    def block(self, chan, fn, y):
        """Encode one channel-block so the decoder reproduces
        ``y << bitshift`` (y given in the shifted-down domain)."""
        y = [int(v) for v in y]
        assert len(y) == self.blocksize
        h = self.hist[chan]
        coff = self._coffset(chan)
        if fn == FN_ZERO:
            assert all(v == 0 for v in y)
            self.w.uvar(FN_ZERO, 2)
            self._post_block(chan, y)
            return
        if fn == FN_DIFF0:
            res = [v - coff for v in y]
        elif fn == FN_DIFF1:
            prev = [h[-1]] + y[:-1]
            res = [v - p for v, p in zip(y, prev)]
        elif fn == FN_DIFF2:
            ext = h[-2:] + y
            res = [ext[i + 2] - 2 * ext[i + 1] + ext[i]
                   for i in range(self.blocksize)]
        elif fn == FN_DIFF3:
            ext = h[-3:] + y
            res = [ext[i + 3] - 3 * (ext[i + 2] - ext[i + 1]) - ext[i]
                   for i in range(self.blocksize)]
        else:
            raise AssertionError(fn)
        k = _res_k(res)
        self.w.uvar(fn, 2)
        self.w.uvar(k, 3)
        for v in res:
            self.w.var(v, k)
        self._post_block(chan, y)

    def qlpc_block(self, chan, qlpc, y):
        y = [int(v) for v in y]
        assert len(y) == self.blocksize
        coff = self._coffset(chan)
        nlpc = len(qlpc)
        work = [v - coff for v in self.hist[chan][-nlpc:]] if nlpc else []
        res = []
        for i in range(self.blocksize):
            s = 1 << LPCQUANT  # v2 lpcqoffset
            for j in range(nlpc):
                s += qlpc[j] * work[len(work) - 1 - j]
            target = y[i] - coff
            res.append(target - (s >> LPCQUANT))
            work.append(target)
        k = _res_k(res)
        self.w.uvar(FN_QLPC, 2)
        self.w.uvar(k, 3)
        self.w.uvar(nlpc, 2)
        for c in qlpc:
            self.w.var(c, LPCQUANT)
        for v in res:
            self.w.var(v, k)
        self._post_block(chan, y)

    def finish(self) -> bytes:
        self.w.uvar(FN_QUIT, 2)
        return self.header + self.w.tobytes()


def _wave(n, seed=0, amp=12000):
    rs = np.random.RandomState(seed)
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * t / 37.0) + rs.randint(-500, 500, n)
    return np.clip(x, -32768, 32767).astype(np.int64)


def test_roundtrip_all_predictors_single_channel():
    B = 64
    y = _wave(6 * B, seed=1)
    enc = _Encoder(TYPE_S16LH, nchan=1, blocksize=B)
    enc.verbatim(b"NIST header bytes stored verbatim")
    blocks = [y[i * B:(i + 1) * B] for i in range(6)]
    enc.block(0, FN_DIFF0, blocks[0])
    enc.block(0, FN_DIFF1, blocks[1])
    enc.block(0, FN_DIFF2, blocks[2])
    enc.block(0, FN_DIFF3, blocks[3])
    enc.qlpc_block(0, [40, -12, 3], blocks[4])
    enc.block(0, FN_DIFF1, blocks[5])
    samples, ftype, nchan = decode_shorten(enc.finish())
    assert (ftype, nchan) == (TYPE_S16LH, 1)
    np.testing.assert_array_equal(samples[:, 0], y)


def test_roundtrip_running_mean_offsets():
    """nmean=4: DIFF0/QLPC bias by the running block mean, stored with
    C-truncation and v2 half-block rounding."""
    B = 32
    y = (_wave(8 * B, seed=2) + 7000).astype(np.int64)  # strong DC offset
    enc = _Encoder(TYPE_S16LH, nchan=1, blocksize=B, nmean=4)
    fns = [FN_DIFF0, FN_DIFF0, FN_DIFF1, FN_DIFF0, FN_DIFF2, FN_DIFF0]
    for i, fn in enumerate(fns):
        enc.block(0, fn, y[i * B:(i + 1) * B])
    enc.qlpc_block(0, [55, -21], y[6 * B:7 * B])
    enc.block(0, FN_DIFF0, y[7 * B:8 * B])
    samples, _, _ = decode_shorten(enc.finish())
    np.testing.assert_array_equal(samples[:, 0], y)


def test_roundtrip_bitshift_blocksize_and_zero():
    B = 48
    y = (_wave(3 * B, seed=3) & ~3).astype(np.int64)  # multiples of 4
    enc = _Encoder(TYPE_S16LH, nchan=1, blocksize=B)
    enc.set_bitshift(2)
    enc.block(0, FN_DIFF1, y[:B] >> 2)
    enc.block(0, FN_DIFF2, y[B:2 * B] >> 2)
    enc.set_blocksize(24)
    enc.block(0, FN_ZERO, np.zeros(24))
    enc.block(0, FN_DIFF1, y[2 * B:2 * B + 24] >> 2)
    samples, _, _ = decode_shorten(enc.finish())
    expect = np.concatenate([y[:2 * B], np.zeros(24, np.int64),
                             y[2 * B:2 * B + 24]])
    np.testing.assert_array_equal(samples[:, 0], expect)


def test_roundtrip_stereo_interleave():
    B = 40
    left, right = _wave(2 * B, seed=4), _wave(2 * B, seed=5) // 2
    enc = _Encoder(TYPE_S16LH, nchan=2, blocksize=B, nmean=2)
    enc.block(0, FN_DIFF1, left[:B])
    enc.block(1, FN_DIFF2, right[:B])
    enc.block(0, FN_DIFF3, left[B:])
    enc.block(1, FN_DIFF0, right[B:])
    samples, _, nchan = decode_shorten(enc.finish())
    assert nchan == 2
    np.testing.assert_array_equal(samples[:, 0], left)
    np.testing.assert_array_equal(samples[:, 1], right)


def test_ulaw_type_roundtrip():
    B = 32
    codes = np.random.RandomState(6).randint(0, 256, B).astype(np.int64)
    enc = _Encoder(TYPE_ULAW, nchan=1, blocksize=B)
    enc.block(0, FN_DIFF1, codes)
    samples, ftype, _ = decode_shorten(enc.finish())
    assert ftype == TYPE_ULAW
    lin = ulaw_to_linear(samples[:, 0])
    assert lin.dtype == np.int16 and np.abs(lin).max() <= 8031


def _sphere_file(tmp_path, payload: bytes, n_samples: int,
                 coding="pcm,embedded-shorten-v2.00"):
    header = (
        "NIST_1A\n   1024\n"
        "sample_rate -i 16000\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        f"sample_count -i {n_samples}\n"
        f"sample_coding -s{len(coding)} {coding}\n"
        "sample_byte_format -s2 01\n"
        "end_head\n"
    ).encode("ascii")
    path = tmp_path / "utt.sph"
    path.write_bytes(header + b" " * (1024 - len(header)) + payload)
    return path


def test_read_embedded_shorten_sphere(tmp_path):
    """End-to-end: the actual LDC TIMIT container — NIST SPHERE header +
    embedded shorten payload — through the public read_wav."""
    from mlvae_tpu.data.wav import read_wav

    B = 64
    y = _wave(4 * B, seed=7)
    enc = _Encoder(TYPE_S16LH, nchan=1, blocksize=B)
    for i in range(4):
        enc.block(0, FN_DIFF2, y[i * B:(i + 1) * B])
    path = _sphere_file(tmp_path, enc.finish(), n_samples=len(y))
    data, sr = read_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(data, y.astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_read_shorten_sphere_truncates_to_sample_count(tmp_path):
    from mlvae_tpu.data.wav import read_wav

    B = 32
    y = _wave(2 * B, seed=8)
    enc = _Encoder(TYPE_S16LH, nchan=1, blocksize=B)
    enc.block(0, FN_DIFF1, y[:B])
    enc.block(0, FN_DIFF1, y[B:])
    # header claims fewer samples than the stream carries (block padding)
    path = _sphere_file(tmp_path, enc.finish(), n_samples=50)
    data, _ = read_wav(path)
    assert len(data) == 50
    np.testing.assert_allclose(data, y[:50].astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_native_shorten_sphere_matches_python(tmp_path):
    """The C++ twin (native/src/wav.cc shn::decode) must produce exactly
    the python decoder's output on the same SPHERE container, including
    predictors, running means, bitshift, and verbatim skipping."""
    from mlvae_tpu import native
    from mlvae_tpu.data.wav import read_wav

    if native.load() is None:
        pytest.skip("native library unavailable (no compiler)")

    B = 64
    y = _wave(6 * B, seed=9)
    enc = _Encoder(TYPE_S16LH, nchan=1, blocksize=B, nmean=4)
    enc.verbatim(b"embedded header")
    enc.block(0, FN_DIFF0, y[0 * B:1 * B])
    enc.block(0, FN_DIFF1, y[1 * B:2 * B])
    enc.block(0, FN_DIFF2, y[2 * B:3 * B])
    enc.block(0, FN_DIFF3, y[3 * B:4 * B])
    enc.qlpc_block(0, [40, -12, 3], y[4 * B:5 * B])
    enc.block(0, FN_DIFF1, y[5 * B:6 * B])
    path = _sphere_file(tmp_path, enc.finish(), n_samples=len(y))

    py_data, py_sr = read_wav(path)
    nat_data, nat_sr = native.read_wav(path)
    assert nat_sr == py_sr == 16000
    np.testing.assert_array_equal(nat_data, py_data)
    np.testing.assert_allclose(py_data, y.astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_native_raw_sphere_pcm_and_ulaw(tmp_path):
    """Native SPHERE path for the uncompressed payloads too (big-endian
    PCM16 and mu-law), against the python reader."""
    from mlvae_tpu import native
    from mlvae_tpu.data.wav import read_wav

    if native.load() is None:
        pytest.skip("native library unavailable (no compiler)")

    y = _wave(500, seed=10).astype(np.int16)
    header = (
        "NIST_1A\n   1024\n"
        "sample_rate -i 16000\nchannel_count -i 1\nsample_n_bytes -i 2\n"
        f"sample_count -i {len(y)}\nsample_coding -s3 pcm\n"
        "sample_byte_format -s2 10\nend_head\n").encode()
    path = tmp_path / "raw.sph"
    path.write_bytes(header + b" " * (1024 - len(header))
                     + y.astype(">i2").tobytes())
    py_data, _ = read_wav(path)
    nat_data, _ = native.read_wav(path)
    np.testing.assert_allclose(nat_data, py_data, atol=1e-7)


def test_corrupt_stream_raises(tmp_path):
    with pytest.raises(ValueError):
        decode_shorten(b"ajkg\x02\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        decode_shorten(b"nope" + bytes(16))
