"""Pure-Python FLAC codec -- real compressed audio with no external libs.

FLAC is integer-only and lossless by specification, so unlike DCT codecs
the round-trip is bit-exact by construction and carries the same driver-
contract proof as PCM WAV. Implemented from the public format spec:

- **Decoder**: STREAMINFO metadata, frame sync/header (block-size and
  sample-rate codes, UTF-8-style frame numbers, CRC-8), subframe types
  CONSTANT / VERBATIM / FIXED(0-4) / LPC (any order, precision, shift),
  wasted-bits, partitioned Rice residuals (4- and 5-bit parameters,
  escape-to-raw), stereo decorrelation (left/side, right/side, mid/side),
  frame CRC-16 verification, and the STREAMINFO MD5 integrity check.
- **Encoder**: 16-bit mono/stereo, fixed block size with a shorter tail
  frame, best-of fixed predictors 0-4 (or forced CONSTANT / VERBATIM /
  LPC / mid-side for test coverage of every decoder path), single-
  partition Rice residuals, correct CRCs and MD5.

Frames-of-blocks maps naturally onto Spark: payloads decode independently
inside Arrow batches (operators/multimodal.py ``audio_stats``), exactly
like the WAV path. Reference parity note: the reference repo has no media
pipeline; this backs the multimodal extension (SURVEY.md §2 W4).
"""

from __future__ import annotations

import hashlib

import numpy as np

# ---------------------------------------------------------------------------
# Bit I/O (MSB-first), CRCs, UTF-8-style numbers
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a terminating one

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def getvalue(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos  # next byte index
        self.acc = 0
        self.n = 0

    def read(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise NotImplementedError("truncated FLAC stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        v = (self.acc >> (self.n - bits)) & ((1 << bits) - 1)
        self.n -= bits
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0

    def byte_index(self) -> int:
        return self.pos - (self.n // 8)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF00 >> nbytes) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


def _utf8_decode(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise NotImplementedError("invalid FLAC frame-number coding")
    v = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise NotImplementedError("invalid FLAC frame-number coding")
        v = (v << 6) | (b & 0x3F)
    return v


def _zigzag(v: np.ndarray) -> np.ndarray:
    return (v << 1) ^ (v >> 63)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE = 4096


def _rice_param(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    mean = int(u.mean())
    return max(0, min(14, mean.bit_length() - 1))


def _write_residual(bw: _BitWriter, res: np.ndarray) -> None:
    """Partitioned-Rice method 0, partition order 0 (one partition)."""
    bw.write(0, 2)  # 4-bit rice parameters
    bw.write(0, 4)  # partition order 0
    u = _zigzag(res.astype(np.int64))
    p = _rice_param(u)
    bw.write(p, 4)
    for x in u:
        x = int(x)
        bw.write_unary(x >> p)
        if p:
            bw.write(x & ((1 << p) - 1), p)


def _write_subframe(bw: _BitWriter, x: np.ndarray, bps: int, force: str | None) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if force == "verbatim":
        bw.write(0b0000001, 7)  # pad + type VERBATIM
        bw.write(0, 1)  # wasted
        for v in x:
            bw.write(int(v), bps)
        return
    if force == "lpc":
        # generic-LPC path carrying the fixed order-2 polynomial
        # (coefs [2, -1], shift 0) so the decoder's LPC machinery is
        # exercised with an exactly-invertible predictor
        order, coefs, shift, prec = 2, [2, -1], 0, 5
        if n <= order:
            force = None  # too short; fall through to fixed search
        else:
            bw.write(0b0100000 | (order - 1), 7)  # pad + LPC type
            bw.write(0, 1)  # wasted
            for v in x[:order]:
                bw.write(int(v), bps)
            bw.write(prec - 1, 4)
            bw.write(shift, 5)
            for c in coefs:
                bw.write(c & ((1 << prec) - 1), prec)
            pred = (2 * x[1:-1] - x[:-2]) >> shift
            _write_residual(bw, x[order:] - pred)
            return
    if force != "verbatim" and n and np.all(x == x[0]) and force is None:
        bw.write(0b0000000, 7)  # pad + type CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    # best fixed predictor by summed |residual|
    best_o, best_res, best_cost = 0, x, None
    res = x
    for o in range(0, min(4, max(n - 1, 0)) + 1):
        if o:
            res = np.diff(res)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    bw.write(0b0001000 | best_o, 7)  # pad + FIXED type
    bw.write(0, 1)  # wasted
    for v in x[:best_o]:
        bw.write(int(v), bps)
    _write_residual(bw, best_res)


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    block_size: int = _BLOCKSIZE,
    force: str | None = None,
) -> bytes:
    """(n_frames, n_channels) or (n,) int16 -> FLAC bytes. ``force`` routes
    every subframe through one decoder path ('verbatim', 'lpc') or, for
    stereo, enables 'mid_side' decorrelation; None picks CONSTANT /
    best-FIXED per subframe (the normal shape)."""
    arr = np.atleast_2d(np.asarray(samples, np.int16))
    if arr.shape[0] == 1 and np.asarray(samples).ndim == 1:
        arr = arr.T
    total, n_ch = arr.shape
    if n_ch > 2:
        raise NotImplementedError("FLAC encoder supports 1-2 channels")
    if force == "mid_side" and n_ch != 2:
        raise NotImplementedError("mid_side needs 2 channels")

    md5 = hashlib.md5(np.ascontiguousarray(arr, "<i2").tobytes()).digest()
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_ch - 1, 3)
    si.write(15, 5)  # bits per sample - 1
    si.write(total, 36)
    streaminfo = si.getvalue() + md5

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    frame_idx = 0
    for start in range(0, max(total, 1), block_size):
        block = arr[start : start + block_size]
        bs = len(block)
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize stream
        hdr.write(0b0111, 4)  # blocksize-1 in 16 bits at header end
        hdr.write(0b0000, 4)  # sample rate from STREAMINFO
        hdr.write(0b1010 if force == "mid_side" else n_ch - 1, 4)
        hdr.write(0b100, 3)  # 16-bit samples
        hdr.write(0, 1)  # reserved
        head = hdr.getvalue() + _utf8_encode(frame_idx) + (bs - 1).to_bytes(2, "big")
        head += bytes([_crc8(head)])

        bw = _BitWriter()
        if force == "mid_side":
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            _write_subframe(bw, (left + right) >> 1, 16, None)
            _write_subframe(bw, left - right, 17, None)  # side: bps+1
        else:
            for c in range(n_ch):
                _write_subframe(bw, block[:, c], 16, force)
        bw.align()
        frame = head + bw.getvalue()
        out += frame + _crc16(frame).to_bytes(2, "big")
        frame_idx += 1
        if total == 0:
            break
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_BLOCKSIZE_TABLE.update({i: 256 << (i - 8) for i in range(8, 16)})
_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise NotImplementedError("reserved FLAC residual coding method")
    plen = 4 + method
    escape = (1 << plen) - 1
    po = br.read(4)
    out = np.empty(bs - order, np.int64)
    idx = 0
    n_parts = 1 << po
    if bs % n_parts:
        raise NotImplementedError("invalid FLAC partition order")
    for part in range(n_parts):
        cnt = (bs >> po) - (order if part == 0 else 0)
        p = br.read(plen)
        if p == escape:
            raw = br.read(5)
            for _ in range(cnt):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << p) | (br.read(p) if p else 0)
                out[idx] = (u >> 1) ^ -(u & 1)
                idx += 1
    return out


def _read_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise NotImplementedError("invalid FLAC subframe padding bit")
    typ = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if typ == 0:  # CONSTANT
        x = np.full(bs, br.read_signed(bps), np.int64)
    elif typ == 1:  # VERBATIM
        x = np.array([br.read_signed(bps) for _ in range(bs)], np.int64)
    elif 8 <= typ <= 12:  # FIXED
        order = typ - 8
        x = np.empty(bs, np.int64)
        for i in range(order):
            x[i] = br.read_signed(bps)
        res = _read_residual(br, bs, order)
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            x[i] = res[i - order] + sum(
                c * x[i - 1 - j] for j, c in enumerate(coefs)
            )
    elif typ >= 32:  # LPC
        order = (typ & 31) + 1
        x = np.empty(bs, np.int64)
        for i in range(order):
            x[i] = br.read_signed(bps)
        prec = br.read(4) + 1
        if prec == 16:
            raise NotImplementedError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise NotImplementedError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        for i in range(order, bs):
            acc = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise NotImplementedError("reserved FLAC subframe type")
    return x << wasted if wasted else x


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """FLAC bytes -> (sample_rate, int16 array (n_frames, n_channels)).
    Verifies frame CRC-16s and, when present, the STREAMINFO MD5."""
    if data[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        hdr = data[pos]
        ln = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 0:
            info = data[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if hdr & 0x80:
            break
    if info is None or len(info) < 34:
        raise NotImplementedError("FLAC stream without STREAMINFO")
    sib = _BitReader(info)
    sib.read(16), sib.read(16), sib.read(24), sib.read(24)
    rate = sib.read(20)
    si_ch = sib.read(3) + 1
    si_bps = sib.read(5) + 1
    total = sib.read(36)
    md5 = info[18:34]  # the 144 header bits end at byte 18

    chans: list[list[np.ndarray]] = [[] for _ in range(si_ch)]
    got = 0
    while got < total and pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise NotImplementedError("lost FLAC frame sync")
        br.read(1)
        br.read(1)  # blocking strategy (frame/sample number either way)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _utf8_decode(br)
        if bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_TABLE:
            bs = _BLOCKSIZE_TABLE[bs_code]
        else:
            raise NotImplementedError("reserved FLAC block-size code")
        if sr_code == 0:
            pass
        elif sr_code in _RATE_TABLE:
            if _RATE_TABLE[sr_code] != rate:
                raise NotImplementedError("FLAC frame rate contradicts STREAMINFO")
        elif sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        else:
            raise NotImplementedError("invalid FLAC sample-rate code")
        bps = si_bps if bps_code == 0 else _BPS_TABLE.get(bps_code)
        if bps is None:
            raise NotImplementedError("reserved FLAC sample-size code")
        header_end = br.byte_index()
        if _crc8(data[frame_start:header_end]) != data[header_end]:
            raise NotImplementedError("FLAC frame header CRC-8 mismatch")
        br = _BitReader(data, header_end + 1)

        if ch_code <= 7:
            n_ch = ch_code + 1
            subs = [_read_subframe(br, bs, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            a = _read_subframe(br, bs, bps + (1 if ch_code == 9 else 0))
            b = _read_subframe(br, bs, bps + (1 if ch_code in (8, 10) else 0))
            if ch_code == 8:  # left/side
                subs = [a, a - b]
            elif ch_code == 9:  # side/right
                subs = [b + a, b]
            else:  # mid/side
                mid = (a << 1) | (b & 1)
                subs = [(mid + b) >> 1, (mid - b) >> 1]
        else:
            raise NotImplementedError("reserved FLAC channel assignment")
        if n_ch != si_ch:
            raise NotImplementedError("FLAC frame channels contradict STREAMINFO")
        br.align()
        crc_end = br.byte_index()
        if _crc16(data[frame_start:crc_end]) != int.from_bytes(
            data[crc_end : crc_end + 2], "big"
        ):
            raise NotImplementedError("FLAC frame CRC-16 mismatch")
        pos = crc_end + 2
        for c in range(n_ch):
            chans[c].append(subs[c])
        got += bs

    out = np.stack(
        [np.concatenate(c)[:total] if c else np.zeros(0, np.int64) for c in chans], -1
    )
    arr16 = out.astype(np.int16)
    if md5 != b"\x00" * 16:
        if hashlib.md5(np.ascontiguousarray(arr16, "<i2").tobytes()).digest() != md5:
            raise NotImplementedError("FLAC MD5 signature mismatch")
    return rate, arr16
