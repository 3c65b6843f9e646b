"""Minimal FLAC encoder used as the test oracle for native/flac_decode.cpp.

Produces spec-conformant streams exercising every decoder path: CONSTANT /
VERBATIM / FIXED(0-4) / LPC subframes, Rice and Rice2 residual partitions
(including the escape code), wasted bits, and the three stereo decorrelation
modes. Not a real encoder — subframe strategy is caller-chosen, which is
exactly what a decoder test needs.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits:
            self.write(0, 1)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _rice_residual(bw: BitWriter, res: np.ndarray, method: int = 0,
                   param: Optional[int] = None, escape: bool = False,
                   porder: int = 0, pred_order: int = 0, blocksize: int = 0):
    bw.write(method, 2)
    bw.write(porder, 4)
    plen = 4 if method == 0 else 5
    esc_code = 15 if method == 0 else 31
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        count = blocksize >> porder
        if p == 0:
            count -= pred_order
        chunk = res[idx:idx + count]
        idx += count
        if escape:
            rawbits = max(int(np.abs(chunk).max()).bit_length() + 1, 2) if len(chunk) else 2
            bw.write(esc_code, plen)
            bw.write(rawbits, 5)
            for v in chunk:
                bw.write_signed(int(v), rawbits)
            continue
        u = np.where(chunk >= 0, chunk * 2, -2 * chunk - 1).astype(np.int64)
        k = param
        if k is None:
            mean = max(int(u.mean()) if len(u) else 0, 1)
            k = max(mean.bit_length() - 1, 0)
            k = min(k, esc_code - 1)
        bw.write(k, plen)
        for v in u:
            bw.write_unary(int(v) >> k)
            bw.write(int(v) & ((1 << k) - 1), k)


FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, kind: str,
                    order: int = 2, wasted: int = 0, method: int = 0,
                    escape: bool = False, porder: int = 0,
                    lpc_coefs: Optional[List[int]] = None,
                    lpc_shift: int = 5, lpc_precision: int = 12):
    bw.write(0, 1)  # padding
    if wasted:
        assert (x & ((1 << wasted) - 1) == 0).all()
        x = x >> wasted
    eff_bps = bps - wasted

    def wasted_bits():
        if wasted:
            bw.write(1, 1)
            for _ in range(wasted - 1):
                bw.write(0, 1)
            bw.write(1, 1)
        else:
            bw.write(0, 1)

    n = len(x)
    if kind == "constant":
        bw.write(0, 6)
        wasted_bits()
        bw.write_signed(int(x[0]), eff_bps)
    elif kind == "verbatim":
        bw.write(1, 6)
        wasted_bits()
        for v in x:
            bw.write_signed(int(v), eff_bps)
    elif kind == "fixed":
        bw.write(0x08 | order, 6)
        wasted_bits()
        for v in x[:order]:
            bw.write_signed(int(v), eff_bps)
        coefs = FIXED_COEFS[order]
        res = np.array(
            [int(x[i]) - sum(c * int(x[i - 1 - j]) for j, c in enumerate(coefs))
             for i in range(order, n)], np.int64)
        _rice_residual(bw, res, method, None, escape, porder, order, n)
    elif kind == "lpc":
        order = len(lpc_coefs)
        bw.write(0x20 | (order - 1), 6)
        wasted_bits()
        for v in x[:order]:
            bw.write_signed(int(v), eff_bps)
        bw.write(lpc_precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in lpc_coefs:
            bw.write_signed(int(c), lpc_precision)
        res = np.array(
            [int(x[i]) - (sum(int(c) * int(x[i - 1 - j])
                              for j, c in enumerate(lpc_coefs)) >> lpc_shift)
             for i in range(order, n)], np.int64)
        _rice_residual(bw, res, method, None, escape, porder, order, n)
    else:
        raise ValueError(kind)


def encode_flac(channels: np.ndarray, sample_rate: int = 16000, bps: int = 16,
                blocksize: int = 256, subframe: str = "fixed",
                stereo_mode: Optional[str] = None, **kw) -> bytes:
    """channels: (n_channels, T) int array. Returns a FLAC byte stream."""
    channels = np.asarray(channels, np.int64)
    nch, total = channels.shape

    # STREAMINFO
    si = BitWriter()
    si.write(blocksize, 16)       # min blocksize
    si.write(blocksize, 16)       # max blocksize
    si.write(0, 24)               # min frame size (unknown)
    si.write(0, 24)               # max frame size
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si_bytes = si.getvalue() + b"\x00" * 16  # MD5 unset
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    frame_no = 0
    pos = 0
    while pos < total:
        n = min(blocksize, total - pos)
        blk = channels[:, pos:pos + n]
        hdr = BitWriter()
        hdr.write(0x3FFE, 14)     # sync
        hdr.write(0, 1)           # reserved
        hdr.write(0, 1)           # fixed-blocksize strategy
        hdr.write(7, 4)           # blocksize: 16-bit value follows
        hdr.write(0, 4)           # sample rate: from STREAMINFO
        if stereo_mode is None:
            hdr.write(nch - 1, 4)
        else:
            hdr.write({"left": 8, "right": 9, "mid": 10}[stereo_mode], 4)
        hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        hdr.write(0, 1)           # reserved
        hdr.align()
        hbytes = bytearray(hdr.getvalue())
        hbytes += _utf8_number(frame_no)
        hbytes += bytes([(n - 1) >> 8, (n - 1) & 0xFF])
        hbytes.append(crc8(bytes(hbytes)))

        body = BitWriter()
        if stereo_mode is None:
            for c in range(nch):
                _write_subframe(body, blk[c], bps, subframe, **kw)
        else:
            l, r = blk[0], blk[1]
            if stereo_mode == "left":
                ch0, ch1, extra = l, l - r, (0, 1)
            elif stereo_mode == "right":
                ch0, ch1, extra = l - r, r, (1, 0)
            else:  # mid/side
                ch0, ch1, extra = (l + r) >> 1, l - r, (0, 1)
            _write_subframe(body, ch0, bps + extra[0], subframe, **kw)
            _write_subframe(body, ch1, bps + extra[1], subframe, **kw)
        body.align()
        fbytes = bytes(hbytes) + body.getvalue()
        fbytes += crc16(fbytes).to_bytes(2, "big")
        out += fbytes
        pos += n
        frame_no += 1
    return bytes(out)
