"""FLAC decode tests. The oracle is the lossless-roundtrip property: a
spec-derived test encoder (tests/flac_writer.py) produces streams whose
decoded samples must equal the original integers exactly — independent of
both decoders under test (native C `_flacio` and pure-Python `decode_flac`).
Covers CONSTANT/VERBATIM/FIXED0-4/LPC subframes, Rice partition orders,
stereo decorrelation modes, wasted bits, 8/16/24-bit depths, partial final
frames, and unknown-length streams. Reference behavior being replaced:
soundfile/libsndfile decode of LibriSpeech .flac (asr_train.py:14,141,
librispeech_asr.py:264-300).
"""

import numpy as np
import pytest

from tests.flac_writer import encode_flac
from tpu_asr.data.audio import (load_audio, read_audio, read_flac_bytes,
                                read_sph_bytes)
from tpu_asr.data.flac import decode_flac

try:
    from tpu_asr.data import _flacio
    HAS_NATIVE = True
except ImportError:
    HAS_NATIVE = False


def _signal(n, bps, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    lim = 1 << (bps - 1)
    t = np.arange(n, dtype=np.float64)
    base = 0.5 * np.sin(2 * np.pi * 440 * t / 16000)
    x = np.stack([(base * (lim - 2) * (1 - 0.3 * c)
                   + rng.integers(-16, 17, size=n)).astype(np.int64)
                  for c in range(ch)], axis=-1)
    return np.clip(x, -lim, lim - 1)[:, 0] if ch == 1 else np.clip(x, -lim, lim - 1)


def _decoders():
    yield "python", decode_flac
    if HAS_NATIVE:
        def native(data):
            pcm, sr, n = _flacio.decode(data)
            return np.frombuffer(pcm, np.float32, count=n), sr
        yield "native", native


def _expected_mono(x, bps):
    x = np.asarray(x, np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    return (x / float(1 << (bps - 1))).astype(np.float32)


MODES = ["constant", "verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
         "fixed4", "lpc1"]


@pytest.mark.parametrize("mode", MODES)
def test_roundtrip_subframe_modes_mono(mode):
    n, bps = 2000, 16
    x = (np.full(n, -123, np.int64) if mode == "constant"
         else _signal(n, bps))
    data = encode_flac(x, 16000, bps=bps, blocksize=512, subframe_mode=mode)
    for name, dec in _decoders():
        got, sr = dec(data)
        assert sr == 16000, name
        np.testing.assert_array_equal(got, _expected_mono(x, bps),
                                      err_msg=f"{name}/{mode}")


@pytest.mark.parametrize("stereo", ["independent", "left_side", "right_side",
                                    "mid_side"])
def test_roundtrip_stereo_decorrelation(stereo):
    n, bps = 3000, 16
    x = _signal(n, bps, ch=2, seed=3)
    data = encode_flac(x, 22050, bps=bps, blocksize=1024,
                       subframe_mode="fixed2", stereo_mode=stereo)
    for name, dec in _decoders():
        got, sr = dec(data)
        assert sr == 22050
        np.testing.assert_allclose(got, _expected_mono(x, bps), atol=1e-7,
                                   err_msg=f"{name}/{stereo}")


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_bit_depths(bps):
    x = _signal(1500, bps, seed=bps)
    data = encode_flac(x, 8000, bps=bps, blocksize=256, subframe_mode="fixed1")
    for name, dec in _decoders():
        got, sr = dec(data)
        assert sr == 8000
        np.testing.assert_array_equal(got, _expected_mono(x, bps),
                                      err_msg=f"{name}/bps{bps}")


def test_roundtrip_wasted_bits():
    x = (_signal(1000, 12, seed=7) << 4)      # 4 zeroed LSBs
    data = encode_flac(x, 16000, bps=16, blocksize=500,
                       subframe_mode="fixed2", wasted=4)
    for name, dec in _decoders():
        got, _ = dec(data)
        np.testing.assert_array_equal(got, _expected_mono(x, 16),
                                      err_msg=name)


def test_roundtrip_rice_partitions():
    x = _signal(4096, 16, seed=11)
    data = encode_flac(x, 16000, bps=16, blocksize=2048,
                       subframe_mode="fixed2", partition_order=3)
    for name, dec in _decoders():
        got, _ = dec(data)
        np.testing.assert_array_equal(got, _expected_mono(x, 16),
                                      err_msg=name)


def test_partial_final_frame_and_unknown_total():
    x = _signal(1234, 16, seed=5)             # 1234 % 512 != 0
    for total in (True, False):
        data = encode_flac(x, 16000, blocksize=512,
                           total_in_streaminfo=total)
        for name, dec in _decoders():
            got, _ = dec(data)
            assert got.shape[0] == 1234, (name, total)
            np.testing.assert_array_equal(got, _expected_mono(x, 16))


def test_native_matches_python_bitstream_for_bitstream():
    if not HAS_NATIVE:
        pytest.skip("native decoder not built")
    x = _signal(5000, 16, ch=2, seed=9)
    data = encode_flac(x, 16000, blocksize=777, subframe_mode="lpc1",
                       stereo_mode="mid_side")
    py, sr_py = decode_flac(data)
    pcm, sr_c, n = _flacio.decode(data)
    native = np.frombuffer(pcm, np.float32, count=n)
    assert sr_py == sr_c
    np.testing.assert_allclose(py, native, atol=1e-7)


def test_garbage_raises():
    for name, dec in _decoders():
        with pytest.raises(ValueError):
            dec(b"fLaCgarbage-that-is-not-a-flac-stream" + b"\x00" * 64)
        with pytest.raises(ValueError):
            dec(b"not flac at all, much longer than forty two bytes padding")


def test_load_audio_dispatch_flac(tmp_path):
    x = _signal(3200, 16, seed=2)
    p = tmp_path / "utt.flac"
    p.write_bytes(encode_flac(x, 16000, blocksize=800))
    got = load_audio(p, target_sr=16000)
    np.testing.assert_array_equal(got, _expected_mono(x, 16))
    got2, sr = read_audio(p)
    assert sr == 16000


def test_load_audio_dispatch_sph(tmp_path):
    rate = 16000
    samples = (_signal(1600, 16, seed=4)).astype("<i2")
    header = (f"NIST_1A\n   1024\nsample_rate -i {rate}\n"
              f"channel_count -i 1\nend_head\n").encode()
    raw = header + b" " * (1024 - len(header)) + samples.tobytes()
    p = tmp_path / "talk.sph"
    p.write_bytes(raw)
    got, sr = read_audio(p)
    assert sr == rate
    np.testing.assert_allclose(got, samples.astype(np.float32) / 32768.0)
    # shorten-compressed sphere must fail loudly, not mis-decode
    bad_header = (f"NIST_1A\n   1024\nsample_rate -i {rate}\n"
                  f"sample_coding -s24 pcm,embedded-shorten-v2.00\n"
                  f"end_head\n").encode()
    bad = bad_header + b" " * (1024 - len(bad_header)) + samples.tobytes()
    with pytest.raises(ValueError):
        read_sph_bytes(bad)


def test_flac_python_fallback_used_without_native(monkeypatch, tmp_path):
    import tpu_asr.data.audio as audio_mod
    monkeypatch.setattr(audio_mod, "_HAS_NATIVE_FLAC", False)
    x = _signal(1000, 16, seed=6)
    np.testing.assert_array_equal(
        read_flac_bytes(encode_flac(x, 16000))[0], _expected_mono(x, 16))
