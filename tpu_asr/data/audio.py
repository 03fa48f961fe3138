"""Host-side audio IO — replaces the reference's libsndfile/soundfile decode
(N11/R5 in SURVEY.md; `soundfile` is not available in this image).

Format dispatch by magic bytes, mirroring what libsndfile gave the reference:
- RIFF/WAVE: self-contained reader (PCM 8/16/24/32-bit + IEEE float), native
  C fast path (native/wavio.c);
- FLAC: full bitstream decoder — native C fast path (native/flacio.c), pure
  Python oracle/fallback (tpu_asr/data/flac.py). LibriSpeech ships .flac
  (librispeech_asr.py:264-300; soundfile use at asr_train.py:14,141);
- NIST SPHERE (.sph): PCM16 reader (TED-LIUM corpora, tedlium_asr.py);
- MP3 (CommonVoice clips, asr_inference_CV.py:218): libmpg123 via ctypes
  (tpu_asr/data/codecs.py);
- Ogg/Opus (GigaSpeech audio, gigaspeech.py:124-165): libopus + pure-Python
  Ogg demux (tpu_asr/data/codecs.py).

All decode to mono float32 (channel mean) + polyphase resampling to the model
sample rate (scipy). PCM16 writer for tmp-wav fallbacks (asr_train.py:129-142).
"""

from __future__ import annotations

import re
import struct
import wave
from pathlib import Path
from typing import Tuple

import numpy as np
from scipy.signal import resample_poly


try:
    from tpu_asr.data import _wavio   # native C decoder (native/wavio.c)
    _HAS_NATIVE = True
except ImportError:  # pragma: no cover - build with native/setup.py
    _wavio = None
    _HAS_NATIVE = False

try:
    from tpu_asr.data import _flacio  # native C decoder (native/flacio.c)
    _HAS_NATIVE_FLAC = True
except ImportError:  # pragma: no cover - build with native/setup.py
    _flacio = None
    _HAS_NATIVE_FLAC = False


def read_audio(path) -> Tuple[np.ndarray, int]:
    """Returns (mono float32 waveform in [-1, 1], sample_rate) for any
    supported container, dispatched by magic bytes: RIFF/WAVE, FLAC, NIST
    SPHERE. Native C fast paths when built; Python fallbacks double as the
    parity oracles."""
    data = Path(path).read_bytes()
    magic = data[:8]
    if magic[:4] == b"fLaC":
        return read_flac_bytes(data)
    if magic[:7] == b"NIST_1A":
        return read_sph_bytes(data)
    if magic[:4] == b"OggS":
        from tpu_asr.data.codecs import decode_ogg_opus
        return decode_ogg_opus(data)
    if magic[:3] == b"ID3" or (len(data) >= 2 and data[0] == 0xFF
                               and (data[1] & 0xE0) == 0xE0):
        # ID3v2 tag or bare MPEG frame sync => MP3
        from tpu_asr.data.codecs import decode_mp3
        return decode_mp3(data)
    if _HAS_NATIVE and magic[:4] == b"RIFF":
        pcm, sample_rate, n = _wavio.decode(data)
        return np.frombuffer(pcm, np.float32, count=n), sample_rate
    return read_wav_python(data, path)


def read_wav(path) -> Tuple[np.ndarray, int]:
    """Back-compat alias: decode any supported container (despite the name)."""
    return read_audio(path)


def read_flac_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    if _HAS_NATIVE_FLAC:
        pcm, sample_rate, n = _flacio.decode(data)
        return np.frombuffer(pcm, np.float32, count=n), sample_rate
    from tpu_asr.data.flac import decode_flac
    return decode_flac(data)


def read_sph_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """NIST SPHERE PCM16 -> (mono float32, sample_rate). Promoted from the
    TED-LIUM builder script (tedlium_asr.py) into the framework audio layer."""
    if not data.startswith(b"NIST_1A"):
        raise ValueError("not a NIST SPHERE file")
    header_size = int(data[8:16].decode().strip())
    header = data[:header_size].decode("latin-1")
    fields = dict(re.findall(r"^(\S+) -[is]\d* (\S+)$", header, re.M))
    fmt = fields.get("sample_coding", "pcm")
    if fmt != "pcm":
        raise ValueError(f"unsupported SPHERE sample_coding {fmt!r} "
                         "(shorten-compressed spheres need conversion)")
    rate = int(fields.get("sample_rate", 16000))
    samples = np.frombuffer(data[header_size:], dtype="<i2")
    n_channels = int(fields.get("channel_count", 1))
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples.astype(np.float32) / 32768.0, rate


def read_wav_python(data: bytes, path="<bytes>") -> Tuple[np.ndarray, int]:
    """Pure-python RIFF/WAVE parser (fallback + test oracle)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE file: {path}")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        chunk_id = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif chunk_id == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"malformed wav: {path}")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(raw) and fmt is not None:
        # WAVE_FORMAT_EXTENSIBLE: subformat GUID starts with the real format
        audio_format = 1 if bits in (8, 16, 24, 32) else 3

    if audio_format == 1:                   # PCM
        if bits == 8:
            x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}: {path}")
    elif audio_format == 3:                 # IEEE float
        x = np.frombuffer(raw, "<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported wav format {audio_format}: {path}")

    if n_channels > 1:
        x = x.reshape(-1, n_channels).mean(axis=1)
    return np.ascontiguousarray(x), sample_rate


def write_wav(path, x: np.ndarray, sample_rate: int) -> None:
    """PCM16 mono writer (tmp-wav fallback, asr_train.py:141)."""
    x16 = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    x16 = (x16 * 32767.0).astype("<i2")
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(x16.tobytes())


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return x
    from math import gcd
    g = gcd(orig_sr, target_sr)
    return resample_poly(x, target_sr // g, orig_sr // g).astype(np.float32)


def load_audio(path, target_sr: int = 16000) -> np.ndarray:
    """Decode + mono + resample to target_sr, float32."""
    x, sr = read_wav(path)
    return resample(x, sr, target_sr)
