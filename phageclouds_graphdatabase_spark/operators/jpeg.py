"""Pure-Python/numpy JPEG (ITU-T T.81) codecs -- no external libraries.

Two compression processes, both real:

- **Lossless JPEG (SOF3)**: the original T.81 lossless process --
  per-sample prediction (all seven spec predictors) + Huffman-coded
  differences. Bit-exact by construction, so it carries the same
  driver-contract proof as the other native codecs (encode -> decode ->
  stats matched against an oracle that never sees an image).
- **Baseline sequential DCT (SOF0)**: full decode path (marker parse,
  DQT/DHT, interleaved and single-component scans, restart intervals,
  4:4:4 / 4:2:2 / 4:2:0 chroma upsampling, YCbCr->RGB) and an encoder
  (level shift, 2-D DCT, Annex-K-style quantization with IJG quality
  scaling, zigzag, run-length + Huffman entropy coding). Lossy in
  general; bit-exact for blockwise-flat grayscale at quality 100 (every
  8x8 block is DC-only and the quant table is all ones), which is what
  the baseline contract query exploits.
- **Progressive DCT (SOF2)**: multi-scan decode -- spectral selection,
  EOB runs, and both successive-approximation refinement algorithms (DC
  raw bits, the AC correction-bit scheme) -- plus an encoder whose scan
  script routes every coefficient through a first scan AND a refinement
  scan. Decodes bit-identically to the baseline path at the same quality
  (same quantized coefficients), which is how the tests pin it.

Arithmetic coding, hierarchical processes, and 12-bit DCT precision raise
the ``NotImplementedError`` codec-missing marker, same convention as
``operators/multimodal.py``.

Reference parity note: the reference repo (guille0387/
PhageClouds_GraphDatabase) has no media pipeline at all; this module backs
the training-data multimodal extension (SURVEY.md §2 W4).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K). One DC + one AC Huffman table (the luminance
# recommendations) serve every component; the tables ride in DHT segments so
# any compliant decoder reads them back.
# ---------------------------------------------------------------------------

_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))

_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

_LUM_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int64).reshape(8, 8)

_CHR_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int64).reshape(8, 8)


def _zigzag_order() -> np.ndarray:
    r = c = 0
    out = []
    for _ in range(64):
        out.append(r * 8 + c)
        if (r + c) % 2 == 0:
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.array(out, np.int64)


_ZIGZAG = _zigzag_order()          # zigzag position -> raster index
_UNZIGZAG = np.argsort(_ZIGZAG)    # raster index -> zigzag position

# Orthonormal 8x8 DCT-II matrix: forward F = C @ X @ C.T, inverse C.T @ F @ C.
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5
        )


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex-K table, entries 1..255.
    quality=100 yields the all-ones table (DC-only blocks exact)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Entropy-coded-segment bit I/O (0xFF byte stuffing, RST/terminating markers)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # spec: pad with 1-bits
        return bytes(self.out)

    def restart_marker(self, m: int) -> None:
        """Pad to a byte boundary and emit RSTm (markers are never
        byte-stuffed)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])


class _BitReader:
    """Reads entropy-coded data; unstuffs FF00, stops at any other marker
    (exposing it as .marker so the scan loop can handle RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        d, p = self.data, self.pos
        if p >= len(d):
            return False
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def read_bits(self, nbits: int) -> int:
        while self.n < nbits:
            if not self._fill():
                # past the last marker: spec behavior is reading 0 bits is
                # a decode error; surface it as a malformed payload
                raise NotImplementedError("truncated JPEG entropy data")
        v = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        self.acc &= (1 << self.n) - 1
        return v

    def align_and_consume_rst(self) -> None:
        self.acc = 0
        self.n = 0  # discard pad bits up to the byte boundary
        if self.marker is None:
            # marker not yet hit by _fill: it must be the next two bytes
            d, p = self.data, self.pos
            if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.marker = d[p + 1]
        if self.marker is None or not 0xD0 <= self.marker <= 0xD7:
            raise NotImplementedError("expected JPEG restart marker")
        self.pos += 2  # the FF Dn pair
        self.marker = None


def _build_decode(bits: tuple[int, ...], vals: tuple[int, ...]) -> dict:
    table: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


def _build_encode(bits: tuple[int, ...], vals: tuple[int, ...]) -> dict:
    return {sym: (code, ln) for (ln, code), sym in _build_decode(bits, vals).items()}


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _write_coded(bw: _BitWriter, enc: dict, prefix: int, v: int) -> None:
    """Huffman symbol (prefix|SSSS) + SSSS additional bits for value v."""
    t = _category(v)
    code, ln = enc[prefix | t]
    bw.write(code, ln)
    if t:
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)


# ---------------------------------------------------------------------------
# Marker-stream scaffolding shared by both encoders
# ---------------------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_payload(tc: int, th: int, bits: tuple[int, ...], vals: tuple[int, ...]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.floor(np.stack([y, cb, cr], -1) + 0.5), 0, 255)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], -1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Baseline sequential DCT (SOF0)
# ---------------------------------------------------------------------------


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _quantize_components(
    arr: np.ndarray, quality: int, subsample: tuple[int, int]
) -> tuple:
    """Shared front half of both DCT encoders: color transform, chroma
    subsampling, MCU padding, 2-D DCT, quantization. Returns
    (gray, h, w, samp, comp_q, qtabs, comp_blocks, mcux, mcuy)."""
    arr = np.asarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    sh, sv = (1, 1) if gray else subsample
    if sh not in (1, 2) or sv not in (1, 2):
        raise NotImplementedError("subsample factors must be 1 or 2")

    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        y = ycc[..., 0]
        # chroma: pad to the sampling grid, then box-average h x v cells
        ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
        cpad = np.pad(ycc[..., 1:], ((0, ph - h), (0, pw - w), (0, 0)), "edge")
        c = cpad.reshape(ph // sv, sv, pw // sh, sh, 2).mean((1, 3))
        c = np.floor(c + 0.5)
        planes = [y, c[..., 0], c[..., 1]]
        samp = [(sh, sv), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qtabs = [quant_table(_LUM_QUANT, quality), quant_table(_CHR_QUANT, quality)]
    comp_q = [0] + [1] * (len(planes) - 1)

    comp_blocks = []
    for plane, (hi, vi), qi in zip(planes, samp, comp_q):
        ch, cw = plane.shape
        th, tw = 8 * vi * mcuy, 8 * hi * mcux
        p = np.pad(plane, ((0, th - ch), (0, tw - cw)), "edge")
        coef = np.einsum("uk,yxkl,vl->yxuv", _DCT, _blocks_of(p) - 128.0, _DCT)
        q = np.floor(coef / qtabs[qi] + 0.5).astype(np.int64)
        # T.81 baseline 8-bit bound: AC magnitudes fit in 10 bits (the Annex
        # K AC table has no SSSS>10 symbols). DC is NOT clipped: its range
        # [-1024, 1016] stays within the 11-bit DC-difference categories.
        dc = q[..., 0, 0].copy()
        q = np.clip(q, -1023, 1023)
        q[..., 0, 0] = dc
        comp_blocks.append(q)
    return gray, h, w, samp, comp_q, qtabs, comp_blocks, mcux, mcuy


def _sof_sos_segments(
    gray: bool,
    h: int,
    w: int,
    samp: list,
    comp_q: list,
    qtabs: list,
) -> tuple[bytes, bytes]:
    """(DQT segments + SOF body, n/a) helper pieces shared by encoders."""
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(samp)])
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, comp_q[ci]])
    dqt = b""
    for i, qt in enumerate(qtabs[: 1 if gray else 2]):
        dqt += _seg(0xDB, bytes([i]) + bytes(qt.reshape(64)[_ZIGZAG].astype(np.uint8)))
    return dqt, sof


def encode_jpeg_baseline(
    arr: np.ndarray,
    quality: int = 90,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale) -> baseline JFIF bytes.

    ``subsample`` is the chroma (h, v) factor: (1,1)=4:4:4, (2,1)=4:2:2,
    (2,2)=4:2:0. Grayscale ignores it (single-component scan).
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs (the
    layout MJPEG streams use so frames stay independently seekable)."""
    gray, h, w, samp, comp_q, qtabs, comp_blocks, mcux, mcuy = _quantize_components(
        arr, quality, subsample
    )

    dc_enc = _build_encode(_DC_BITS, _DC_VALS)
    ac_enc = _build_encode(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = [0] * len(samp)
    rst = 0
    for m in range(mcuy * mcux):
        my, mx = divmod(m, mcux)
        if restart_interval and m and m % restart_interval == 0:
            bw.restart_marker(rst)
            rst = (rst + 1) & 7
            pred = [0] * len(samp)
        for ci, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    blk = comp_blocks[ci][my * vi + by, mx * hi + bx]
                    zz = blk.reshape(64)[_ZIGZAG]
                    _write_coded(bw, dc_enc, 0x00, int(zz[0]) - pred[ci])
                    pred[ci] = int(zz[0])
                    nz = np.nonzero(zz[1:])[0]
                    k = 0
                    for pos in nz:
                        run = int(pos) - k
                        while run >= 16:
                            code, ln = ac_enc[0xF0]  # ZRL
                            bw.write(code, ln)
                            run -= 16
                        _write_coded(bw, ac_enc, run << 4, int(zz[1 + pos]))
                        k = int(pos) + 1
                    if k < 63:
                        code, ln = ac_enc[0x00]  # EOB
                        bw.write(code, ln)

    dqt, sof = _sof_sos_segments(gray, h, w, samp, comp_q, qtabs)
    sos = bytes([len(samp)])
    for ci in range(len(samp)):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])

    out = b"\xff\xd8" + dqt
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_BITS, _AC_VALS))
    out += _seg(0xDA, sos) + bw.flush() + b"\xff\xd9"
    return out


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2): spectral selection + successive approximation.
# Scan script: DC (all components, Al=1) -> AC per component (band 1-63,
# Al=1) -> DC refinement (Ah=1) -> AC refinement per component (Ah=1).
# Every coefficient therefore flows through BOTH the first-scan and the
# refinement machinery, which is what the decoder round-trip test needs.
# ---------------------------------------------------------------------------

# AC tables for progressive scans need the EOBn symbols (0x10..0xE0) that
# Annex K's baseline table lacks. A uniform canonical table covers all 256
# symbols: 255 8-bit codes + one 9-bit (the all-ones 8-bit prefix stays
# reserved, as T.81 requires).
_UNIFORM_BITS = (0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0)
_UNIFORM_VALS = tuple(range(256))


def _emit_eobrun(bw: _BitWriter, ac_enc: dict, eobrun: int) -> None:
    """EOBn: n = floor(log2(run)), extra bits carry run - 2^n."""
    while eobrun > 0:
        r = min(14, eobrun.bit_length() - 1)
        chunk = min(eobrun, (1 << (r + 1)) - 1)
        code, ln = ac_enc[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(chunk - (1 << r), r)
        eobrun -= chunk


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsample: tuple[int, int] = (1, 1)
) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale) -> progressive (SOF2) bytes with
    both spectral selection and one successive-approximation refinement
    pass per coefficient. Decodes to the same pixels as the baseline
    encoder at the same quality (identical quantized coefficients)."""
    gray, h, w, samp, comp_q, qtabs, comp_blocks, mcux, mcuy = _quantize_components(
        arr, quality, subsample
    )
    n_comp = len(samp)
    dc_enc = _build_encode(_DC_BITS, _DC_VALS)
    ac_enc = _build_encode(_UNIFORM_BITS, _UNIFORM_VALS)

    # per-component zigzag coefficient grids and real (non-padded) dims
    zz_grids = [
        blk.reshape(blk.shape[0], blk.shape[1], 64)[..., _ZIGZAG]
        for blk in comp_blocks
    ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    real_dims = []
    for hi, vi in samp:
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        real_dims.append((-(-ch // 8), -(-cw // 8)))

    def sos_seg(comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comps)])
        for ci in comps:
            body += bytes([ci + 1, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    scans = b""

    # --- DC first scan: interleaved, Al=1 ---
    bw = _BitWriter()
    pred = [0] * n_comp
    for m in range(mcuy * mcux):
        my, mx = divmod(m, mcux)
        for ci, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    dc = int(zz_grids[ci][my * vi + by, mx * hi + bx, 0]) >> 1
                    _write_coded(bw, dc_enc, 0x00, dc - pred[ci])
                    pred[ci] = dc
    scans += sos_seg(list(range(n_comp)), 0, 0, 0, 1) + bw.flush()

    # --- AC first scans: per component, band 1-63, Al=1 ---
    for ci in range(n_comp):
        bw = _BitWriter()
        eobrun = 0
        by_n, bx_n = real_dims[ci]
        for b in range(by_n * bx_n):
            zz = zz_grids[ci][b // bx_n, b % bx_n]
            # point transform: magnitudes shifted, sign kept
            t = np.sign(zz[1:]) * (np.abs(zz[1:]) >> 1)
            nz = np.nonzero(t)[0]
            if len(nz) == 0:
                eobrun += 1
                continue
            _emit_eobrun(bw, ac_enc, eobrun)
            eobrun = 0
            k = 0
            for p in nz:
                run = int(p) - k
                while run >= 16:
                    code, ln = ac_enc[0xF0]
                    bw.write(code, ln)
                    run -= 16
                _write_coded(bw, ac_enc, run << 4, int(t[p]))
                k = int(p) + 1
            if k < 63:
                eobrun += 1
        _emit_eobrun(bw, ac_enc, eobrun)
        scans += sos_seg([ci], 1, 63, 0, 1) + bw.flush()

    # --- DC refinement: interleaved, Ah=1 Al=0, one raw bit per block ---
    bw = _BitWriter()
    for m in range(mcuy * mcux):
        my, mx = divmod(m, mcux)
        for ci, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    bw.write(int(zz_grids[ci][my * vi + by, mx * hi + bx, 0]) & 1, 1)
    scans += sos_seg(list(range(n_comp)), 0, 0, 1, 0) + bw.flush()

    # --- AC refinement scans: per component, band 1-63, Ah=1 Al=0 ---
    for ci in range(n_comp):
        bw = _BitWriter()
        by_n, bx_n = real_dims[ci]
        for b in range(by_n * bx_n):
            zz = zz_grids[ci][b // bx_n, b % bx_n]
            pending: list[int] = []  # correction bits since the last symbol
            r = 0
            emitted_any = False
            # Last newly-significant position: ZRLs are never emitted past it
            # (the tail folds into EOB), and — critically for bit-sync — a
            # needed ZRL is emitted at ANY nonzero coefficient, BEFORE its
            # correction bit is buffered. Deferring the ZRL to the next
            # newly-significant coefficient would flush correction bits for
            # history-nonzero coefficients that lie beyond the 16-zero span
            # the decoder consumes with the ZRL (T.81 G.1.2.3; libjpeg
            # jcphuff.c encode_mcu_AC_refine ordering).
            k_last = max((k for k in range(1, 64) if abs(int(zz[k])) == 1), default=0)
            for k in range(1, 64):
                v = int(zz[k])
                t = abs(v)
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= k_last:
                    code, ln = ac_enc[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                if t > 1:  # history nonzero at this scan: correction bit
                    pending.append(t & 1)
                    continue
                # t == 1: newly significant at this scale
                code, ln = ac_enc[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(0 if v < 0 else 1, 1)
                for bit in pending:
                    bw.write(bit, 1)
                pending = []
                r = 0
                emitted_any = True
            if r > 0 or pending or not emitted_any:
                # end-of-band for this block (run length 1, no extra bits),
                # followed by the correction bits the decoder's EOB tail
                # will read for remaining nonzero-history coefficients
                code, ln = ac_enc[0x00]
                bw.write(code, ln)
                for bit in pending:
                    bw.write(bit, 1)
        scans += sos_seg([ci], 1, 63, 1, 0) + bw.flush()

    dqt, sof = _sof_sos_segments(gray, h, w, samp, comp_q, qtabs)
    return (
        b"\xff\xd8"
        + dqt
        + _seg(0xC2, sof)
        + _seg(0xC4, _dht_payload(0, 0, _DC_BITS, _DC_VALS))
        + _seg(0xC4, _dht_payload(1, 0, _UNIFORM_BITS, _UNIFORM_VALS))
        + scans
        + b"\xff\xd9"
    )


class _Frame:
    def __init__(self) -> None:
        self.process: int | None = None
        self.precision = 8
        self.h = 0
        self.w = 0
        self.comps: list[tuple[int, int, int, int]] = []  # (id, hi, vi, tq)
        self.qtabs: dict[int, np.ndarray] = {}
        self.dc: dict[int, dict] = {}
        self.ac: dict[int, dict] = {}
        self.restart = 0


def _parse_until_scan(data: bytes, pos: int, fr: _Frame) -> tuple[int, list | None, int, int, int]:
    """Advance through marker segments; on SOS return
    (entropy_pos, scan_comps [(comp_index, dc_id, ac_id)], ss, se, ah_al);
    on EOI return (pos, None, 0, 0, 0)."""
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("malformed JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:
            return pos + 2, None, 0, 0, 0
        if pos + 4 > len(data):
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                n = 64 * (2 if pq else 1)
                raw = body[p : p + n]
                vals = (
                    np.frombuffer(raw, ">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, np.uint8).astype(np.int64)
                )
                tab = np.zeros(64, np.int64)
                tab[_ZIGZAG] = vals
                fr.qtabs[tq] = tab.reshape(8, 8)
                p += n
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = tuple(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = tuple(body[p + 17 : p + 17 + nv])
                (fr.ac if tc else fr.dc)[th] = _build_decode(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            fr.process = marker
            fr.precision = body[0]
            if fr.precision != 8 and marker != 0xC3:
                raise NotImplementedError("only 8-bit DCT JPEG supported")
            fr.h = int.from_bytes(body[1:3], "big")
            fr.w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            fr.comps = [
                (body[6 + 3 * i], body[7 + 3 * i] >> 4, body[7 + 3 * i] & 15, body[8 + 3 * i])
                for i in range(nc)
            ]
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1), progressive (SOF2) and lossless (SOF3) JPEG"
            )
        elif marker == 0xDD:
            fr.restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            ns = body[0]
            ids = [c[0] for c in fr.comps]
            scan = [
                (ids.index(body[1 + 2 * i]), body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                for i in range(ns)
            ]
            return pos, scan, body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
        # APPn / COM / others: skipped
    raise NotImplementedError("JPEG stream has no SOS marker")


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> HxWx3 uint8 RGB (grayscale replicated across
    channels). Baseline SOF0 and lossless SOF3; progressive/arithmetic/
    hierarchical raise the codec-missing marker."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    fr = _Frame()
    pos, scan, ss, se, ahal = _parse_until_scan(data, 2, fr)
    if scan is None:
        raise NotImplementedError("JPEG stream ended before any scan")
    if fr.process == 0xC3:
        return _decode_lossless_scan(data, pos, fr, scan, ss, ahal & 15)
    if fr.process == 0xC2:
        return _decode_progressive(data, pos, fr, scan, ss, se, ahal)
    if fr.process not in (0xC0, 0xC1):
        raise NotImplementedError("unsupported JPEG process")
    return _decode_baseline_scan(data, pos, fr, scan)


def _decode_baseline_scan(data: bytes, pos: int, fr: _Frame, scan: list) -> np.ndarray:
    hmax = max(c[1] for c in fr.comps)
    vmax = max(c[2] for c in fr.comps)
    interleaved = len(scan) > 1
    if not interleaved and len(fr.comps) != 1:
        raise NotImplementedError("multi-scan JPEG not supported")

    # per-component padded block grids
    grids: dict[int, np.ndarray] = {}
    dims: dict[int, tuple[int, int]] = {}
    mcux = -(-fr.w // (8 * hmax)) if interleaved else -(-fr.w // 8)
    mcuy = -(-fr.h // (8 * vmax)) if interleaved else -(-fr.h // 8)
    for idx, _, _ in scan:
        _, hi, vi, _ = fr.comps[idx]
        ch, cw = -(-fr.h * vi // vmax), -(-fr.w * hi // hmax)
        dims[idx] = (ch, cw)
        if interleaved:
            grids[idx] = np.zeros((mcuy * vi, mcux * hi, 8, 8), np.float64)
        else:
            grids[idx] = np.zeros((-(-ch // 8), -(-cw // 8), 8, 8), np.float64)

    br = _BitReader(data, pos)
    pred = {idx: 0 for idx, _, _ in scan}
    mcu_total = (mcuy * mcux) if interleaved else (
        grids[scan[0][0]].shape[0] * grids[scan[0][0]].shape[1]
    )
    since_rst = 0
    for m in range(mcu_total):
        if fr.restart and since_rst == fr.restart:
            br.align_and_consume_rst()
            pred = {idx: 0 for idx, _, _ in scan}
            since_rst = 0
        since_rst += 1
        units: list[tuple[int, int, int]] = []
        if interleaved:
            my, mx = divmod(m, mcux)
            for idx, _, _ in scan:
                _, hi, vi, _ = fr.comps[idx]
                for by in range(vi):
                    for bx in range(hi):
                        units.append((idx, my * vi + by, mx * hi + bx))
        else:
            idx = scan[0][0]
            units.append((idx, m // grids[idx].shape[1], m % grids[idx].shape[1]))
        for idx, gy, gx in units:
            _, _, _, tq = fr.comps[idx]
            dc_tab = fr.dc[next(s[1] for s in scan if s[0] == idx)]
            ac_tab = fr.ac[next(s[2] for s in scan if s[0] == idx)]
            zz = np.zeros(64, np.int64)
            t = _decode_symbol(br, dc_tab)
            pred[idx] += _extend(br.read_bits(t), t)
            zz[0] = pred[idx]
            k = 1
            while k < 64:
                rs = _decode_symbol(br, ac_tab)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        break
                    k += 16
                    continue
                k += r
                zz[k] = _extend(br.read_bits(s), s)
                k += 1
            coef = np.zeros(64, np.float64)
            coef[_ZIGZAG] = zz * fr.qtabs[tq].reshape(64)[_ZIGZAG]
            grids[idx][gy, gx] = coef.reshape(8, 8)

    return _reconstruct(fr, grids, dims, hmax, vmax)


def _reconstruct(
    fr: _Frame,
    grids: dict[int, np.ndarray],
    dims: dict[int, tuple[int, int]],
    hmax: int,
    vmax: int,
) -> np.ndarray:
    """Dequantized coefficient grids (by, bx, 8, 8) -> RGB pixels: IDCT,
    crop to component dims, upsample, color-convert."""
    planes: dict[int, np.ndarray] = {}
    for idx, grid in grids.items():
        px = np.einsum("ku,yxkl,lv->yxuv", _DCT, grid, _DCT)
        gh, gw = grid.shape[:2]
        plane = px.swapaxes(1, 2).reshape(gh * 8, gw * 8) + 128.0
        ch, cw = dims[idx]
        plane = plane[:ch, :cw]
        _, hi, vi, _ = fr.comps[idx]
        plane = np.repeat(np.repeat(plane, vmax // vi, 0), hmax // hi, 1)
        planes[idx] = plane[: fr.h, : fr.w]

    if len(fr.comps) == 1:
        g = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[..., None], 3, -1))
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


# ---------------------------------------------------------------------------
# Progressive (SOF2) decode: coefficients accumulate across scans, one
# IDCT at the end.
# ---------------------------------------------------------------------------


def _first_ac_block(br, ac_tab, zz, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) + (br.read_bits(r) if r else 0)
            return eobrun - 1
        k += r
        if k > se:
            raise NotImplementedError("JPEG AC run overflows the band")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _refine_ac_block(br, ac_tab, zz, ss, se, al, eobrun) -> int:
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, ac_tab)
            r, s = rs >> 4, rs & 15
            s_val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) + (br.read_bits(r) if r else 0)
                    break
                # r == 15: ZRL, skip 16 zero-history coefficients
            elif s == 1:
                s_val = p1 if br.read_bits(1) else m1
            else:
                raise NotImplementedError("invalid AC refinement magnitude")
            while k <= se:
                if zz[k] != 0:
                    if br.read_bits(1) and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = s_val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if br.read_bits(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(
    data: bytes, pos: int, fr: _Frame, scan: list, ss: int, se: int, ahal: int
) -> np.ndarray:
    hmax = max(c[1] for c in fr.comps)
    vmax = max(c[2] for c in fr.comps)
    mcux, mcuy = -(-fr.w // (8 * hmax)), -(-fr.h // (8 * vmax))
    store: dict[int, np.ndarray] = {}
    real: dict[int, tuple[int, int]] = {}
    dims: dict[int, tuple[int, int]] = {}
    for idx, (_, hi, vi, _) in enumerate(fr.comps):
        store[idx] = np.zeros((mcuy * vi, mcux * hi, 64), np.int64)
        ch, cw = -(-fr.h * vi // vmax), -(-fr.w * hi // hmax)
        dims[idx] = (ch, cw)
        real[idx] = (-(-ch // 8), -(-cw // 8))

    preds = {i: 0 for i in range(len(fr.comps))}
    while scan is not None:
        ah, al = ahal >> 4, ahal & 15
        br = _BitReader(data, pos)
        if ss == 0:
            if se != 0:
                raise NotImplementedError("progressive DC scan with Se != 0")
            if ah == 0:
                for idx, _, _ in scan:
                    preds[idx] = 0
            interleaved = len(scan) > 1
            n_units = (
                mcuy * mcux
                if interleaved
                else real[scan[0][0]][0] * real[scan[0][0]][1]
            )
            since_rst = 0
            for m in range(n_units):
                if fr.restart and since_rst == fr.restart:
                    br.align_and_consume_rst()
                    for idx, _, _ in scan:
                        preds[idx] = 0
                    since_rst = 0
                since_rst += 1
                units = []
                if interleaved:
                    my, mx = divmod(m, mcux)
                    for idx, dc_id, _ in scan:
                        _, hi, vi, _ = fr.comps[idx]
                        for by in range(vi):
                            for bx in range(hi):
                                units.append((idx, dc_id, my * vi + by, mx * hi + bx))
                else:
                    idx, dc_id, _ = scan[0]
                    units.append((idx, dc_id, m // real[idx][1], m % real[idx][1]))
                for idx, dc_id, gy, gx in units:
                    if ah == 0:
                        t = _decode_symbol(br, fr.dc[dc_id])
                        preds[idx] += _extend(br.read_bits(t), t)
                        store[idx][gy, gx, 0] = preds[idx] << al
                    else:
                        if br.read_bits(1):
                            store[idx][gy, gx, 0] |= 1 << al
        else:
            if len(scan) != 1:
                raise NotImplementedError("progressive AC scan must be single-component")
            idx, _, ac_id = scan[0]
            ac_tab = fr.ac[ac_id]
            by_n, bx_n = real[idx]
            eobrun = 0
            since_rst = 0
            for b in range(by_n * bx_n):
                if fr.restart and since_rst == fr.restart:
                    br.align_and_consume_rst()
                    eobrun = 0
                    since_rst = 0
                since_rst += 1
                zz = store[idx][b // bx_n, b % bx_n]
                if ah == 0:
                    eobrun = _first_ac_block(br, ac_tab, zz, ss, se, al, eobrun)
                else:
                    eobrun = _refine_ac_block(br, ac_tab, zz, ss, se, al, eobrun)
        pos, scan, ss, se, ahal = _parse_until_scan(data, br.pos, fr)

    grids: dict[int, np.ndarray] = {}
    for idx, (_, hi, vi, tq) in enumerate(fr.comps):
        qt = fr.qtabs[tq].reshape(64)[_ZIGZAG].astype(np.float64)
        flat = store[idx].astype(np.float64) * qt
        raster = np.zeros_like(flat)
        raster[..., _ZIGZAG] = flat
        gh, gw = raster.shape[:2]
        grids[idx] = raster.reshape(gh, gw, 8, 8)
    return _reconstruct(fr, grids, dims, hmax, vmax)


# ---------------------------------------------------------------------------
# Lossless JPEG (SOF3): prediction + Huffman-coded differences, bit-exact
# ---------------------------------------------------------------------------


def _predict(plane: np.ndarray, x: int, y: int, psel: int, default: int) -> int:
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    ra, rb, rc = int(plane[y, x - 1]), int(plane[y - 1, x]), int(plane[y - 1, x - 1])
    if psel == 1:
        return ra
    if psel == 2:
        return rb
    if psel == 3:
        return rc
    if psel == 4:
        return ra + rb - rc
    if psel == 5:
        return ra + ((rb - rc) >> 1)
    if psel == 6:
        return rb + ((ra - rc) >> 1)
    if psel == 7:
        return (ra + rb) >> 1
    raise NotImplementedError(f"lossless predictor {psel} out of range")


def encode_jpeg_lossless(arr: np.ndarray, predictor: int = 1) -> bytes:
    """HxWx3 RGB or HxW grayscale uint8 -> lossless JPEG (SOF3). Exact:
    decode_jpeg() returns the input array bit-for-bit."""
    arr = np.asarray(arr, np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, nc = arr.shape
    enc = _build_encode(_DC_BITS, _DC_VALS)
    bw = _BitWriter()
    planes = [arr[..., c].astype(np.int64) for c in range(nc)]
    # interleaved MCU = one sample per component, all Hi=Vi=1
    for y in range(h):
        for x in range(w):
            for plane in planes:
                diff = int(plane[y, x]) - _predict(plane, x, y, predictor, 128)
                _write_coded(bw, enc, 0x00, diff)

    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, Ah/Al(Pt)=0

    return (
        b"\xff\xd8"
        + _seg(0xC4, _dht_payload(0, 0, _DC_BITS, _DC_VALS))
        + _seg(0xC3, sof)
        + _seg(0xDA, sos)
        + bw.flush()
        + b"\xff\xd9"
    )


def _decode_lossless_scan(
    data: bytes, pos: int, fr: _Frame, scan: list, psel: int, pt: int
) -> np.ndarray:
    if any(fr.comps[idx][1] != 1 or fr.comps[idx][2] != 1 for idx, _, _ in scan):
        raise NotImplementedError("subsampled lossless JPEG not supported")
    if fr.restart:
        raise NotImplementedError("restart intervals in lossless JPEG not supported")
    br = _BitReader(data, pos)
    default = 1 << (fr.precision - 1 - pt)
    planes = [np.zeros((fr.h, fr.w), np.int64) for _ in scan]
    tabs = [fr.dc[s[1]] for s in scan]
    for y in range(fr.h):
        for x in range(fr.w):
            for plane, tab in zip(planes, tabs):
                t = _decode_symbol(br, tab)
                if t == 16:
                    diff = 32768
                else:
                    diff = _extend(br.read_bits(t), t)
                plane[y, x] = _predict(plane, x, y, psel, default) + diff
    maxv = (1 << fr.precision) - 1
    out = np.stack([np.clip(p, 0, maxv) for p in planes], -1).astype(np.uint8)
    if out.shape[2] == 1:
        out = np.repeat(out, 3, -1)
    elif out.shape[2] != 3:
        raise NotImplementedError("lossless JPEG with unsupported component count")
    return np.ascontiguousarray(out)
