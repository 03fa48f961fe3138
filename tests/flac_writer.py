"""Minimal FLAC *encoder* for test fixtures — written from the FLAC spec
(RFC 9639), independently of both decoders under test. Because FLAC is
lossless, `decode(encode(x)) == x` exactly, which makes the original samples
a non-circular oracle for the C and Python decoders across subframe types
(CONSTANT / VERBATIM / FIXED / LPC), Rice parameters, stereo decorrelation
modes, and wasted bits.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        assert 0 <= value < (1 << n) or n == 0, (value, n)
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _rice_param(res: List[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1
    p = max(0, int(np.ceil(np.log2(mean))))
    return min(p, 14)


def _write_residual(bw: _BitWriter, res: List[int], blocksize: int,
                    order: int, partition_order: int = 0):
    """Rice method 0, per-partition params; partition 0 is `order` short."""
    assert (blocksize >> partition_order) << partition_order == blocksize
    bw.write(0, 2)
    bw.write(partition_order, 4)
    idx = 0
    for p in range(1 << partition_order):
        count = blocksize >> partition_order
        if p == 0:
            count -= order
        part = res[idx:idx + count]
        idx += count
        param = _rice_param(part)
        bw.write(param, 4)
        for r in part:
            v = (abs(r) << 1) - (1 if r < 0 else 0)   # zigzag
            bw.write_unary(v >> param)
            if param:
                bw.write(v & ((1 << param) - 1), param)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(bw: _BitWriter, x: List[int], bps: int, mode: str,
                    wasted: int = 0, partition_order: int = 0):
    bw.write(0, 1)                        # padding
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in x), "wasted bits must be zero"
        x = [v >> wasted for v in x]
        eff_bps = bps - wasted
    else:
        eff_bps = bps

    if mode == "constant":
        assert all(v == x[0] for v in x)
        bw.write(0, 6)
    elif mode == "verbatim":
        bw.write(1, 6)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(0x08 | order, 6)
    elif mode == "lpc1":
        bw.write(0x20, 6)                 # LPC order 1
    else:
        raise ValueError(mode)

    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)

    if mode == "constant":
        bw.write_signed(x[0], eff_bps)
    elif mode == "verbatim":
        for v in x:
            bw.write_signed(v, eff_bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        for v in x[:order]:
            bw.write_signed(v, eff_bps)
        coefs = _FIXED_COEFS[order]
        res = [x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
               for i in range(order, len(x))]
        _write_residual(bw, res, len(x), order, partition_order)
    elif mode == "lpc1":
        # order-1 LPC with coefficient 29/32 (precision 6, shift 5)
        coef, shift, prec = 29, 5, 6
        bw.write_signed(x[0], eff_bps)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        bw.write_signed(coef, prec)
        res = [x[i] - ((coef * x[i - 1]) >> shift) for i in range(1, len(x))]
        _write_residual(bw, res, len(x), 1, partition_order)


def encode_flac(samples: np.ndarray, sample_rate: int, bps: int = 16,
                blocksize: int = 1024, subframe_mode: str = "fixed2",
                stereo_mode: str = "independent",
                wasted: int = 0, partition_order: int = 0,
                total_in_streaminfo: bool = True) -> bytes:
    """samples: int array, shape (n,) mono or (n, ch). Lossless by
    construction; all encoding decisions are exercised via the kwargs."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    assert ch <= 8
    lim = 1 << (bps - 1)
    assert x.min() >= -lim and x.max() < lim, "samples exceed bit depth"

    out = bytearray(b"fLaC")
    # STREAMINFO (34 bytes), marked last metadata block
    si = _BitWriter()
    si.write(blocksize, 16)               # min blocksize
    si.write(blocksize, 16)               # max blocksize
    si.write(0, 24)                       # min framesize (unknown)
    si.write(0, 24)                       # max framesize (unknown)
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n if total_in_streaminfo else 0, 36)
    body = si.getvalue() + b"\x00" * 16   # MD5 zeros (unset)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n, blocksize)):
        blk = x[start:start + blocksize]
        bs = blk.shape[0]
        hw = _BitWriter()
        hw.write(0x3FFE, 14)              # sync
        hw.write(0, 1)                    # reserved
        hw.write(0, 1)                    # fixed blocking
        hw.write(7, 4)                    # blocksize: 16-bit at end
        hw.write(0, 4)                    # sample rate: from STREAMINFO
        if ch == 2 and stereo_mode != "independent":
            code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
            hw.write(code, 4)
        else:
            hw.write(ch - 1, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        hw.write(ss_code, 3)
        hw.write(0, 1)                    # reserved
        # UTF-8 frame number (supports < 2^31 frames)
        if fi < 0x80:
            hw.write(fi, 8)
        elif fi < 0x800:
            hw.write(0xC0 | (fi >> 6), 8)
            hw.write(0x80 | (fi & 0x3F), 8)
        else:
            hw.write(0xE0 | (fi >> 12), 8)
            hw.write(0x80 | ((fi >> 6) & 0x3F), 8)
            hw.write(0x80 | (fi & 0x3F), 8)
        hw.write(bs - 1, 16)
        header = hw.getvalue()
        header += bytes([_crc8(header)])

        fw = _BitWriter()
        cols = [blk[:, c].astype(np.int64).tolist() for c in range(ch)]
        if ch == 2 and stereo_mode != "independent":
            left, right = cols
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:                          # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                chans = [(mid, bps), (side, bps + 1)]
        else:
            chans = [(c, bps) for c in cols]
        for cx, cbps in chans:
            po = partition_order if (bs >> partition_order) << partition_order == bs else 0
            _write_subframe(fw, cx, cbps, subframe_mode, wasted, po)
        fw.align()
        frame = header + fw.getvalue()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
