"""Baseline JPEG codec in pure stdlib+numpy (VERDICT r6 item 5).

Closes the largest multimodal seam (`functions/multimodal.py`'s
jpeg-raster ``NotImplementedError``): a real DCT path — encoder
(FDCT → quantize → zigzag → Huffman; 4:4:4, 4:2:0 or grayscale, SOF0)
and decoder (marker walk → DHT/DQT table build → Huffman entropy
decode → dequantize → IDCT → level shift → chroma upsample →
YCbCr→RGB). The decoder reads its quantization and Huffman tables
from the DQT/DHT segments of the stream itself (as the spec
requires), so it decodes any baseline sequential 8-bit JPEG with
per-component sampling factors up to 2×2 — 4:4:4, 4:2:0, 4:2:2,
4:4:0, the layouts cameras and libjpeg actually emit (r9; chroma
upsampling is spec-legal pixel replication) — not just this encoder's
output. PROGRESSIVE (SOF2) decodes in its spectral-selection form
(r12): multi-scan coefficient accumulation, interleaved or single-
component DC scans, per-component AC band scans with full EOBRUN
handling — and ``encode_jpeg_progressive`` emits that layout with
EOB-run coalescing. SUCCESSIVE APPROXIMATION (Ah/Al ≠ 0) decodes too
(r13): first scans at reduced precision, DC refinements as raw bits,
AC refinements with correction bits and EOB-run buffering — and
``encode_jpeg_progressive_sa`` emits a two-stage approximation.
ARITHMETIC coding decodes too (r14): the QM-coder and the Annex F
DC/AC statistical models live in ``functions/jpeg_arith.py``, with
``encode_jpeg_arith`` (SOF9 sequential) and
``encode_jpeg_progressive_arith`` (SOF10, two-stage successive
approximation) as the matching encoders — ``_decode`` routes SOF9
scans and SOF10 progressive scans there and reads DAC conditioning
segments. Lossless frames (SOF3/7/11), 12-bit precision and sampling
factors beyond 2×2 return None — quarantine, not crash, the same
contract as ``decode_png_pixels``.

Like PNG, entropy decode is inherently sequential WITHIN one image
(DC prediction chains block to block), which is exactly why the Spark
integration keeps whole images as single binary cells and parallelizes
ACROSS images via Arrow-batched mapInPandas, never within one
(SURVEY §7.6; reference has no multimodal surface at all).

The Huffman tables the ENCODER emits are uniform-length canonical
tables (12 DC symbols at 4 bits, 162 AC symbols at 8 bits) — valid
per ITU-T T.81 §C (any BITS histogram whose canonical assignment
avoids the all-ones code is legal), chosen over the Annex K defaults
because they are derived programmatically from the symbol alphabet
instead of a 162-entry transcribed constant; compression ratio is not
this codec's contract, bit-exact structural correctness is. The
decoder handles arbitrary DHT tables either way.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants

# zigzag scan order: ZIGZAG[i] = raster index of the i-th scanned coeff
_Z = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1)uπ/16)
# FDCT: F = M @ f @ M.T ; IDCT: f = M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# flat quantization table: quantization error is only coefficient
# rounding, giving the near-lossless mode the tolerance tests pin
FLAT_QUANT = np.ones(64, dtype=np.uint16)


def quality_quant_table(quality: int) -> np.ndarray:
    """A smooth monotone quant table scaled by the libjpeg quality
    formula (50 → base, 95 → fine), returned in ZIGZAG order (the
    order encode_jpeg consumes and DQT stores — review finding r7:
    the first cut returned raster order, scrambling the frequency
    weighting up to ~4.5× between same-frequency coefficients; the
    roundtrip stayed self-consistent, which is why only rate-
    distortion suffered). The base table is generated, not
    transcribed: strength grows with spatial frequency (2 + 3(u+v)),
    which preserves the property every real table has — DC finest,
    high frequencies coarsest — without a 64-entry constant. The
    table rides in DQT, so decode correctness never depends on it."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100] (libjpeg domain)")
    base = np.empty((8, 8), dtype=np.float64)
    for u in range(8):
        for v in range(8):
            base[u, v] = 2 + 3 * (u + v)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base.reshape(64)[_Z] * scale + 50) / 100)
    return np.clip(q, 1, 255).astype(np.uint16)


# ---------------------------------------------------------------------------
# Huffman table machinery


class _HuffTable:
    """Canonical Huffman table from a DHT (bits, huffval) spec —
    usable for both encode (symbol → code, length) and decode
    (length-indexed min/max code search, ITU-T T.81 §F.2.2.3)."""

    def __init__(self, bits: list[int], huffval: list[int]):
        if len(bits) != 16 or sum(bits) != len(huffval) or not huffval:
            raise ValueError("malformed Huffman spec")
        self.bits = bits
        self.huffval = huffval
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.encode: dict[int, tuple[int, int]] = {}
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            for _ in range(bits[length - 1]):
                if code >= (1 << length):
                    raise ValueError("Huffman code overflow")
                self.encode[huffval[k]] = (code, length)
                code += 1
                k += 1
            self.maxcode[length] = code - 1
            code <<= 1
        # the all-ones code of the longest used length must stay free
        # (T.81 §C.2) — canonical construction guarantees it unless the
        # table is exactly full, which we reject
        if any(
            self.maxcode[ln] == (1 << ln) - 1 for ln in range(1, 17) if bits[ln - 1]
        ):
            raise ValueError("table uses the reserved all-ones code")


def _uniform_dc_table() -> _HuffTable:
    """12 DC magnitude categories, all 4-bit codes (12 < 15 ⇒ the
    all-ones 4-bit code stays reserved)."""
    bits = [0] * 16
    bits[3] = 12
    return _HuffTable(bits, list(range(12)))


def _uniform_ac_table_progressive() -> _HuffTable:
    """The progressive AC alphabet adds EOB1..EOB14 ((run<<4, size 0)
    for run 1-14 — end-of-band RUN codes, T.81 §G.1.2.2) to the 162
    baseline symbols; 176 codes at 8 bits keep the all-ones code
    reserved."""
    symbols = [run << 4 for run in range(16)] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    bits = [0] * 16
    bits[7] = len(symbols)
    return _HuffTable(bits, sorted(symbols))


def _uniform_ac_table() -> _HuffTable:
    """All 162 baseline AC symbols (EOB, ZRL, run 0-15 × size 1-10)
    at 8 bits (162 < 255 ⇒ all-ones reserved). Alphabet is generated
    from the spec's symbol structure, not transcribed."""
    symbols = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    bits = [0] * 16
    bits[7] = len(symbols)
    return _HuffTable(bits, sorted(symbols))


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    raises _MarkerHit at any real marker (RSTn is surfaced to the
    caller for restart handling)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise _Corrupt("bitstream exhausted")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise _Corrupt("dangling 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if table.bits[length - 1] and code <= table.maxcode[length]:
                return table.huffval[
                    table.valptr[length] + code - table.mincode[length]
                ]
        raise _Corrupt("invalid Huffman code")

    def align_to_marker(self) -> int:
        """Discard bits to the next marker (restart handling)."""
        self._n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                marker = self.data[self.pos + 1]
                self.pos += 2
                return marker
            self.pos += 1
        raise _Corrupt("no marker after restart scan")


class _Corrupt(Exception):
    pass


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _magnitude_bits(v: int) -> tuple[int, int]:
    """(category, appended-bits) encoding of a coefficient value
    (T.81 §F.1.2.1): category = bitlength of |v|; negatives append
    v-1's low bits."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude_bits (T.81 §F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ---------------------------------------------------------------------------
# encoder


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y, cb, cr = img[..., 0], img[..., 1] - 128.0, img[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a (h, w) float plane to 8-multiples by edge replication and
    cut into (n_blocks_y, n_blocks_x, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    by, bx = padded.shape[0] // 8, padded.shape[1] // 8
    return padded.reshape(by, 8, bx, 8).swapaxes(1, 2)


def _encode_block(writer, zz, pred_c, dc_tab, ac_tab) -> int:
    """Huffman-encode one quantized zigzag block; returns the new DC
    predictor for this component."""
    diff = int(zz[0]) - pred_c
    pred_c = int(zz[0])
    size, bits = _magnitude_bits(diff)
    code, length = dc_tab.encode[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, length = ac_tab.encode[0xF0]
                writer.write(code, length)
                run = 0
            continue
        size, bits = _magnitude_bits(v)
        code, length = ac_tab.encode[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_tab.encode[0x00]
        writer.write(code, length)
    return pred_c


def encode_jpeg(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Encode an 8-bit image array — (h, w) grayscale or (h, w, 3)
    RGB — as baseline sequential SOF0 JPEG. ``subsampling``: "444"
    (1×1 sampling for every component), "420" (r9 — Y at 2×2 sampling
    factors, chroma downsampled by exact 2×2 means and coded one block
    per 16×16 MCU: the layout virtually every camera and libjpeg
    default writes), or "422" (Y at 2×1, chroma halved horizontally —
    the broadcast/video-frame layout; exercises the decoder's
    asymmetric-factor path). ``quant``: 64 zigzag-order divisors
    (default FLAT_QUANT = near-lossless). ``restart_interval``: emit
    DRI + RSTn markers every N MCUs (0 = none) — exercised by the
    decoder's restart path."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg takes uint8 arrays")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3)")
    h, w = img.shape[:2]
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError("dims out of JPEG range")
    q = np.asarray(quant if quant is not None else FLAT_QUANT, dtype=np.uint16)
    if q.shape != (64,) or q.min() < 1 or q.max() > 255:
        # >255 would need a 16-bit (pq=1) DQT segment, which this
        # encoder doesn't emit (the decoder reads them fine)
        raise ValueError("quant must be 64 values in [1, 255]")

    if subsampling not in ("444", "420", "422"):
        raise ValueError("subsampling must be '444', '420' or '422'")
    sub = subsampling if not gray else "444"
    # Y sampling factors (hy, vy); chroma is always 1x1 here
    hy, vy = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[sub]

    def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
        blocks = _to_blocks(plane) - 128.0
        coeffs = np.einsum("ux,byxw,vw->byuv", _M, blocks, _M)
        qz = np.rint(coeffs.reshape(*coeffs.shape[:2], 64)[..., _Z] / q)
        return qz.astype(np.int64)

    if sub != "444":
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        mw, mh = 8 * hy, 8 * vy  # MCU pixel dims
        my, mx = (h + mh - 1) // mh, (w + mw - 1) // mw
        # Y padded to full MCU multiples so every MCU owns real blocks
        yp = np.pad(
            ycc[..., 0],
            ((0, mh * my - h), (0, mw * mx - w)),
            mode="edge",
        )
        # chroma: pad to factor multiples, exact hy×vy means, then pad
        # the downsampled plane to the MCU block grid
        ev = np.pad(
            ycc, ((0, -h % vy), (0, -w % hy), (0, 0)), mode="edge"
        )
        comp_coeffs = [_fdct_blocks(yp)]
        for ch in (1, 2):
            ds = ev[..., ch].reshape(
                ev.shape[0] // vy, vy, ev.shape[1] // hy, hy
            ).mean(axis=(1, 3))
            ds = np.pad(
                ds,
                ((0, 8 * my - ds.shape[0]), (0, 8 * mx - ds.shape[1])),
                mode="edge",
            )
            comp_coeffs.append(_fdct_blocks(ds))
    else:
        planes = (
            [img.astype(np.float64)]
            if gray
            else list(
                np.moveaxis(_rgb_to_ycbcr(img.astype(np.float64)), -1, 0)
            )
        )
        comp_coeffs = [_fdct_blocks(p) for p in planes]
    by, bx = comp_coeffs[0].shape[:2]

    dc_tab, ac_tab = _uniform_dc_table(), _uniform_ac_table()
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00"
    )
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00"  # DQT id 0
    out += bytes(int(v) for v in q)
    ncomp = 1 if gray else 3
    sof = bytearray(b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big"))
    sof.append(ncomp)
    for cid in range(1, ncomp + 1):
        hv = (hy << 4) | vy if cid == 1 else 0x11
        sof += bytes([cid, hv, 0x00])  # sampling factors, quant table 0
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for tc, tab in ((0, dc_tab), (1, ac_tab)):
        seg = bytes([tc << 4]) + bytes(tab.bits) + bytes(tab.huffval)
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += restart_interval.to_bytes(2, "big")
    sos = bytearray([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    writer = _BitWriter()
    pred = [0] * ncomp
    mcu = 0
    rst = 0
    # MCU grid: the Y component carries hy×vy blocks per MCU, chroma
    # one each; 444/grayscale is the 1-block degenerate case
    m_rows, m_cols = by // vy, bx // hy
    for y in range(m_rows):
        for x in range(m_cols):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            for c in range(ncomp):
                ch, cv = (hy, vy) if c == 0 else (1, 1)
                for v in range(cv):
                    for u in range(ch):
                        pred[c] = _encode_block(
                            writer,
                            comp_coeffs[c][cv * y + v, ch * x + u],
                            pred[c], dc_tab, ac_tab,
                        )
            mcu += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg_pixels(payload: bytes):
    """Full baseline decode → uint8 array (h, w) for grayscale or
    (h, w, 3) RGB, or None for anything outside the supported subset
    (progressive / arithmetic / 12-bit / sampling factors beyond 2×2 /
    malformed) — quarantine, not crash."""
    try:
        return _decode(payload)
    except (
        _Corrupt,
        _MarkerHit,
        ValueError,
        IndexError,
        struct.error,
        MemoryError,
    ):
        return None


def _decode(payload: bytes):
    if not payload or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, [(cid, qid)])
    progressive = False
    arith = False  # SOF9 sequential arithmetic (r14)
    lossless = False  # SOF3 (r15)
    precision = 8
    conditioning: dict[tuple[int, int], int] = {}  # DAC (Tc,Tb) → value
    pstate: _ProgressiveState | None = None
    restart_interval = 0
    i = 2
    while i + 2 <= len(payload):
        if payload[i] != 0xFF:
            return None
        while i + 1 < len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:
            if pstate is not None:
                # progressive EOI: every scan accumulated — dequantize
                # and reconstruct (r12)
                arrays, hv = [], []
                for cid, qid, hc, vc in pstate.comps:
                    if qid not in quant:
                        return None
                    arrays.append(pstate.coeffs[cid] * quant[qid])
                    hv.append((hc, vc))
                return _idct_assemble(
                    arrays, hv, pstate.h, pstate.w,
                    pstate.hmax, pstate.vmax,
                )
            return None  # EOI before SOS
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if i + 4 > len(payload):
            return None
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seglen < 2 or i + 2 + seglen > len(payload):
            return None
        seg = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                n = 64 * (2 if pq else 1)
                if p + n > len(seg):
                    return None
                if pq:
                    vals = np.frombuffer(
                        seg[p : p + n], dtype=">u2"
                    ).astype(np.int64)
                else:
                    vals = np.frombuffer(
                        seg[p : p + n], dtype=np.uint8
                    ).astype(np.int64)
                quant[tq] = vals
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                if p + 17 + n > len(seg):
                    return None
                huff[(tc, th)] = _HuffTable(
                    bits, list(seg[p + 17 : p + 17 + n])
                )
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            # SOF0/1 baseline, SOF2 progressive, SOF3 LOSSLESS (r15),
            # SOF9 sequential ARITHMETIC, SOF10 progressive arithmetic
            # (r14 — functions/jpeg_arith.py), SOF11 lossless
            # arithmetic (r15)
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA, 0xCB)
            lossless = marker in (0xC3, 0xCB)
            precision = seg[0]
            if lossless:
                if not 2 <= precision <= 16:
                    return None  # T.81: lossless allows P in [2, 16]
            elif precision != 8:
                return None  # 12-bit
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nf = seg[5]
            if not (0 < h and 0 < w and nf in (1, 3)):
                return None
            comps = []
            for c in range(nf):
                cid, hv, qid = seg[6 + 3 * c : 9 + 3 * c]
                hc, vc = hv >> 4, hv & 0xF
                if hc not in (1, 2) or vc not in (1, 2):
                    return None  # sampling factors beyond 2x2: refuse
                comps.append((cid, qid, hc, vc))
            frame = (h, w, comps)
        elif marker == 0xCC:  # DAC: arithmetic conditioning (r14)
            p = 0
            while p + 2 <= len(seg):
                conditioning[(seg[p] >> 4, seg[p] & 0xF)] = seg[p + 1]
                p += 2
        elif 0xC5 <= marker <= 0xCF and marker != 0xC8 and marker != 0xCC:
            # SOF5/6 differential, SOF7/11 lossless-arithmetic /
            # differential-lossless, SOF13-15 differential-arithmetic:
            # hierarchical frame types stay refused
            return None  # quarantine, not crash
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            h, w, comps = frame
            byid = {cid: (qid, hc, vc) for cid, qid, hc, vc in comps}
            if lossless:
                # SOF3 (r15): one interleaved scan, 1×1 sampling, no
                # restarts — the encode_jpeg_lossless subset
                if ns != len(comps) or len(seg) < 4 + 2 * ns:
                    return None
                if restart_interval:
                    return None
                pred_sel, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0xF
                if not 1 <= pred_sel <= 7 or se != 0 or ah != 0:
                    return None
                if not 0 <= al < precision:
                    return None
                if arith:
                    # SOF11 (r15): the same predictive front end, QM
                    # coder entropy layer
                    from fintech_lakehouse_spark.functions.jpeg_arith import (
                        decode_lossless_scan_arith,
                    )

                    comp_tbls = []
                    for c in range(ns):
                        cid, tsel = seg[1 + 2 * c : 3 + 2 * c]
                        if cid not in byid:
                            return None
                        _, hc, vc = byid[cid]
                        if (hc, vc) != (1, 1):
                            return None
                        comp_tbls.append(tsel >> 4)
                    return decode_lossless_scan_arith(
                        payload, i + 2 + seglen, h, w, comp_tbls,
                        pred_sel, al, precision, conditioning,
                    )
                tabs = []
                for c in range(ns):
                    cid, tsel = seg[1 + 2 * c : 3 + 2 * c]
                    if cid not in byid:
                        return None
                    _, hc, vc = byid[cid]
                    if (hc, vc) != (1, 1):
                        return None
                    tab = huff.get((0, tsel >> 4))
                    if tab is None:
                        return None
                    tabs.append(tab)
                return _decode_lossless_scan(
                    payload, i + 2 + seglen, h, w, tabs, pred_sel, al,
                    precision,
                )
            if progressive:
                if len(seg) < 4 + 2 * ns:
                    return None
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0xF
                # successive approximation (r13): a first scan has
                # Ah=0 (values at reduced precision, shifted left Al
                # on decode); a refinement scan has Ah=Al+1 and adds
                # one magnitude bit per coefficient
                if ah and ah != al + 1:
                    return None
                if al > 13:
                    return None
                if not (ss <= se <= 63) or (ss == 0) != (se == 0):
                    return None
                if arith:
                    # SOF10 (r14): arithmetic progressive scans decode
                    # through the QM coder into the SAME accumulator;
                    # 1×1 factors + no restarts (the encoder's subset)
                    if restart_interval:
                        return None
                    from fintech_lakehouse_spark.functions.jpeg_arith import (
                        decode_progressive_scan_arith,
                    )

                    a_comps = []
                    for c in range(ns):
                        cid, tsel = seg[1 + 2 * c : 3 + 2 * c]
                        if cid not in byid:
                            return None
                        qid, hc, vc = byid[cid]
                        if (hc, vc) != (1, 1):
                            return None
                        a_comps.append((cid, tsel >> 4, tsel & 0xF))
                    if pstate is None:
                        pstate = _ProgressiveState(h, w, comps)
                    i = decode_progressive_scan_arith(
                        payload, i + 2 + seglen, pstate, a_comps,
                        ss, se, ah, al, conditioning,
                    )
                    continue
                scan_comps = []
                for c in range(ns):
                    cid, tsel = seg[1 + 2 * c : 3 + 2 * c]
                    if cid not in byid:
                        return None
                    if ss == 0:
                        # DC refinement carries raw bits, no table
                        tab = (
                            None if ah else huff.get((0, tsel >> 4))
                        )
                        scan_comps.append((cid, tab, None))
                        if ah == 0 and tab is None:
                            return None
                    else:
                        tab = huff.get((1, tsel & 0xF))
                        scan_comps.append((cid, None, tab))
                        if tab is None:
                            return None
                if pstate is None:
                    pstate = _ProgressiveState(h, w, comps)
                i = _decode_progressive_scan(
                    payload, i + 2 + seglen, pstate, scan_comps,
                    ss, se, huff, restart_interval, ah, al,
                )
                continue
            if ns != len(comps):
                return None
            if arith:
                # sequential arithmetic (r14): 1×1 factors only, no
                # restart markers — the subset encode_jpeg_arith emits
                if restart_interval:
                    return None
                from fintech_lakehouse_spark.functions.jpeg_arith import (
                    decode_scan_arith,
                )

                scan = []
                for c in range(ns):
                    cid, tsel = seg[1 + 2 * c : 3 + 2 * c]
                    if cid not in byid:
                        return None
                    qid, hc, vc = byid[cid]
                    if (hc, vc) != (1, 1) or qid not in quant:
                        return None
                    scan.append((cid, qid, tsel >> 4, tsel & 0xF))
                return decode_scan_arith(
                    payload, i + 2 + seglen, h, w, scan, quant,
                    conditioning,
                )
            tables = []
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c : 3 + 2 * c]
                dc = huff.get((0, tsel >> 4))
                ac = huff.get((1, tsel & 0xF))
                if dc is None or ac is None or cid not in byid:
                    return None
                qid, hc, vc = byid[cid]
                if qid not in quant:
                    return None
                tables.append((dc, ac, quant[qid], hc, vc))
            return _decode_scan(
                payload, i + 2 + seglen, h, w, tables, restart_interval
            )
        i += 2 + seglen
    return None


#: Allocation guard for _decode_scan: a crafted SOF0 header can claim
#: 65535x65535 RGB (~100 GB of coefficient planes) before any entropy
#: data is read, so declared dimensions are bounded BEFORE allocating.
#: 16M pixels (4096x4096) keeps the RGB float64 coefficient buffer
#: under ~400 MB — far above any committed fixture, far below executor
#: death.
_MAX_DECODE_PIXELS = 16 * 1024 * 1024


def _decode_block(reader, dc_tab, ac_tab, pred_c) -> tuple[np.ndarray, int]:
    """Decode one entropy-coded block into a zigzag coefficient vector;
    returns (zz, new DC predictor)."""
    zz = np.zeros(64, dtype=np.float64)
    size = reader.decode_symbol(dc_tab)
    if size > 11:
        raise _Corrupt("DC category out of range")
    pred_c += _extend(reader.receive(size), size)
    zz[0] = pred_c
    k = 1
    while k < 64:
        sym = reader.decode_symbol(ac_tab)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run != 15:
                raise _Corrupt("bad AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k >= 64:
            raise _Corrupt("AC index overflow")
        zz[k] = _extend(reader.receive(size), size)
        k += 1
    return zz, pred_c


def _decode_scan(payload, pos, h, w, tables, restart_interval):
    """Interleaved baseline scan with per-component sampling factors
    (r9 — previously 1×1 only): the MCU spans 8·Hmax × 8·Vmax pixels
    and carries h_c×v_c blocks per component in raster order; each
    component plane IDCTs on its own grid, crops to its true
    (sub)sampled size, and chroma upsamples to full resolution by
    pixel replication (spec-legal nearest-neighbor — JPEG does not
    mandate an upsampling filter; libjpeg's default 'fancy' triangular
    filter differs by ≤ a few codes on edges)."""
    ncomp = len(tables)
    if ncomp == 1:
        # ADVICE r9: a one-component scan is NON-INTERLEAVED per the
        # spec — MCU = ONE data unit in plain block raster order, and
        # the frame's sampling factors do NOT shape the MCU (a
        # grayscale JPEG declaring 2×2 factors would otherwise desync:
        # 2×2-block MCUs over a ceil(w/16) grid is a different block
        # count AND order than the spec's ceil(w/8) raster). Since the
        # single component is its own hmax/vmax, its plane is full
        # resolution either way.
        dc_tab, ac_tab, q, _, _ = tables[0]
        tables = [(dc_tab, ac_tab, q, 1, 1)]
    hmax = max(t[3] for t in tables)
    vmax = max(t[4] for t in tables)
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    total = sum(my * vc * mx * hc * 64 for _, _, _, hc, vc in tables)
    if total > _MAX_DECODE_PIXELS * 3:
        raise _Corrupt("declared dimensions exceed decode cap")
    reader = _BitReader(payload, pos)
    coeffs = [
        np.zeros((my * vc, mx * hc, 64), dtype=np.float64)
        for _, _, _, hc, vc in tables
    ]
    pred = [0] * ncomp
    mcu = 0
    for y in range(my):
        for x in range(mx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                marker = reader.align_to_marker()
                if not 0xD0 <= marker <= 0xD7:
                    raise _Corrupt("expected RSTn")
                pred = [0] * ncomp
            for c, (dc_tab, ac_tab, q, hc, vc) in enumerate(tables):
                for v in range(vc):
                    for u in range(hc):
                        zz, pred[c] = _decode_block(
                            reader, dc_tab, ac_tab, pred[c]
                        )
                        coeffs[c][y * vc + v, x * hc + u] = zz * q
            mcu += 1
    return _idct_assemble(
        coeffs, [(hc, vc) for _, _, _, hc, vc in tables], h, w, hmax, vmax
    )


def _idct_assemble(coeffs, hv, h, w, hmax, vmax):
    """DEQUANTIZED zigzag coefficient arrays (one (by, bx, 64) per
    component) → uint8 image: un-zigzag, IDCT, level shift, crop to
    each component's true sampled dims, replicate chroma up, YCbCr→RGB
    for 3 components. Shared by the baseline single-scan path and the
    progressive multi-scan accumulator (r12)."""
    planes = []
    for c, (hc, vc) in enumerate(hv):
        cy, cx = coeffs[c].shape[:2]
        raster = np.zeros((cy, cx, 64), dtype=np.float64)
        raster[..., _Z] = coeffs[c]
        blocks = raster.reshape(cy, cx, 8, 8)
        spatial = np.einsum("xu,byuv,wv->byxw", _M.T, blocks, _M.T)
        plane = spatial.swapaxes(1, 2).reshape(cy * 8, cx * 8) + 128.0
        # crop to the component's true sampled dims, then replicate up
        ch = (h * vc + vmax - 1) // vmax
        cw = (w * hc + hmax - 1) // hmax
        plane = plane[:ch, :cw]
        if vc != vmax or hc != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vc, axis=0), hmax // hc, axis=1
            )
        planes.append(plane[:h, :w])
    if len(hv) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    ycbcr = np.stack(planes, axis=-1)
    rgb = _ycbcr_to_rgb(ycbcr)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2), spectral-selection subset (r12)


def encode_jpeg_progressive(
    img: np.ndarray, quant: np.ndarray | None = None
) -> bytes:
    """Encode as PROGRESSIVE (SOF2) JPEG in the SPECTRAL-SELECTION
    form: scan 1 carries every component's DC coefficients
    (interleaved, Ss=Se=0), then one full-band AC scan per component
    (Ss=1, Se=63, single-component as the spec requires), all at
    Ah=Al=0 — the simplest spec-legal progressive layout (T.81 §G;
    :func:`encode_jpeg_progressive_sa` adds successive approximation,
    r13). AC end-of-block
    codes are EOB0 (run length 1), which the general decoder's EOBRUN
    machinery also covers. 4:4:4 / grayscale only — progressive
    chroma subsampling only changes the per-component block grids,
    not the scan grammar, and the decode side already handles it."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive takes uint8 arrays")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3)")
    h, w = img.shape[:2]
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError("dims out of JPEG range")
    q = np.asarray(quant if quant is not None else FLAT_QUANT, dtype=np.uint16)
    if q.shape != (64,) or q.min() < 1 or q.max() > 255:
        raise ValueError("quant must be 64 values in [1, 255]")

    def _fdct(plane: np.ndarray) -> np.ndarray:
        blocks = _to_blocks(plane) - 128.0
        coeffs = np.einsum("ux,byxw,vw->byuv", _M, blocks, _M)
        qz = np.rint(coeffs.reshape(*coeffs.shape[:2], 64)[..., _Z] / q)
        return qz.astype(np.int64)

    planes = (
        [img.astype(np.float64)]
        if gray
        else list(np.moveaxis(_rgb_to_ycbcr(img.astype(np.float64)), -1, 0))
    )
    comp_coeffs = [_fdct(p) for p in planes]
    by, bx = comp_coeffs[0].shape[:2]
    ncomp = len(comp_coeffs)
    dc_tab = _uniform_dc_table()
    ac_tab = _uniform_ac_table_progressive()

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00"
    )
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00"
    out += bytes(int(v) for v in q)
    sof = bytearray(b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big"))
    sof.append(ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0x00])
    out += b"\xff\xc2" + (len(sof) + 2).to_bytes(2, "big") + sof  # SOF2
    for tc, tab in ((0, dc_tab), (1, ac_tab)):
        seg = bytes([tc << 4]) + bytes(tab.bits) + bytes(tab.huffval)
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg

    # scan 1: every component's DC, interleaved block raster
    sos = bytearray([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 0, 0x00])  # Ss=0 Se=0 Ah=0 Al=0
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    writer = _BitWriter()
    pred = [0] * ncomp
    for y in range(by):
        for x in range(bx):
            for c in range(ncomp):
                diff = int(comp_coeffs[c][y, x, 0]) - pred[c]
                pred[c] = int(comp_coeffs[c][y, x, 0])
                size, bits = _magnitude_bits(diff)
                code, length = dc_tab.encode[size]
                writer.write(code, length)
                if size:
                    writer.write(bits, size)
    writer.flush()
    out += writer.out

    # scans 2..: one full-band AC scan per component (non-interleaved).
    # Consecutive blocks whose whole band is zero coalesce into EOBn
    # codes (run = 2^RRRR - 1 + RRRR appended bits) — the progressive
    # mode's actual compression lever and the decoder's EOBRUN path.
    def _flush_eob(writer, n):
        # one EOBn covers (1<<RRRR) + extra blocks, extra in RRRR bits
        # (decoder: EOBRUN = (1<<RRRR) - 1 + extra skips EOBRUN blocks
        # AFTER the one the code lands on)
        while n:
            rrrr = min(n.bit_length() - 1, 14)
            take = min(n, (1 << rrrr) * 2 - 1)
            code, length = ac_tab.encode[rrrr << 4]
            writer.write(code, length)
            if rrrr:
                writer.write(take - (1 << rrrr), rrrr)
            n -= take

    for c in range(ncomp):
        sos = bytearray([1, c + 1, 0x00, 1, 63, 0x00])
        out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
        writer = _BitWriter()
        pending_eob = 0
        for y in range(by):
            for x in range(bx):
                zz = comp_coeffs[c][y, x]
                nz = [k for k in range(1, 64) if int(zz[k])]
                if not nz:
                    pending_eob += 1
                    continue
                _flush_eob(writer, pending_eob)
                pending_eob = 0
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, length = ac_tab.encode[0xF0]
                        writer.write(code, length)
                        run -= 16
                    size, bits = _magnitude_bits(v)
                    code, length = ac_tab.encode[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits, size)
                    run = 0
                if run:
                    pending_eob = 1  # trailing zeros: this block EOBs
        _flush_eob(writer, pending_eob)
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_sa(
    img: np.ndarray, quant: np.ndarray | None = None
) -> bytes:
    """Encode as PROGRESSIVE (SOF2) JPEG with SUCCESSIVE APPROXIMATION
    (r13, T.81 §G.1.2 — the other half of the progressive seam): a
    two-stage approximation at Al=1 → Al=0. Scan 1 carries every
    component's DC at Ah=0/Al=1 (point transform: arithmetic shift
    right); scans 2..N are per-component full-band AC first scans at
    Al=1 (magnitudes shifted toward zero, newly-nonzero grammar with
    EOBn runs); then a DC refinement scan (Ah=1, one raw bit per
    block) and per-component AC refinement scans (Ah=1 — correction
    bits for already-nonzero coefficients, (r<<4)|1 symbols + sign
    bit for newly-nonzero ones, EOB-run buffering: the libjpeg
    encode_mcu_AC_refine contract). 4:4:4 / grayscale only, like the
    spectral-selection encoder."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive_sa takes uint8 arrays")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (h, w) or (h, w, 3)")
    h, w = img.shape[:2]
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError("dims out of JPEG range")
    q = np.asarray(quant if quant is not None else FLAT_QUANT, dtype=np.uint16)
    if q.shape != (64,) or q.min() < 1 or q.max() > 255:
        raise ValueError("quant must be 64 values in [1, 255]")

    def _fdct(plane: np.ndarray) -> np.ndarray:
        blocks = _to_blocks(plane) - 128.0
        coeffs = np.einsum("ux,byxw,vw->byuv", _M, blocks, _M)
        qz = np.rint(coeffs.reshape(*coeffs.shape[:2], 64)[..., _Z] / q)
        return qz.astype(np.int64)

    planes = (
        [img.astype(np.float64)]
        if gray
        else list(np.moveaxis(_rgb_to_ycbcr(img.astype(np.float64)), -1, 0))
    )
    comp_coeffs = [_fdct(p) for p in planes]
    by, bx = comp_coeffs[0].shape[:2]
    ncomp = len(comp_coeffs)
    dc_tab = _uniform_dc_table()
    ac_tab = _uniform_ac_table_progressive()
    AL = 1

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00"
    )
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00"
    out += bytes(int(v) for v in q)
    sof = bytearray(b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big"))
    sof.append(ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0x00])
    out += b"\xff\xc2" + (len(sof) + 2).to_bytes(2, "big") + sof  # SOF2
    for tc, tab in ((0, dc_tab), (1, ac_tab)):
        seg = bytes([tc << 4]) + bytes(tab.bits) + bytes(tab.huffval)
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg

    def _sos(comps_sel: list, ss: int, se: int, ah: int, al: int):
        sos = bytearray([len(comps_sel)])
        for cid in comps_sel:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(
            b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
        )

    # scan 1: DC first, all components interleaved, Al=1
    _sos(list(range(1, ncomp + 1)), 0, 0, 0, AL)
    writer = _BitWriter()
    pred = [0] * ncomp
    for y in range(by):
        for x in range(bx):
            for c in range(ncomp):
                v = int(comp_coeffs[c][y, x, 0]) >> AL  # arithmetic
                diff = v - pred[c]
                pred[c] = v
                size, bits = _magnitude_bits(diff)
                code, length = dc_tab.encode[size]
                writer.write(code, length)
                if size:
                    writer.write(bits, size)
    writer.flush()
    out += writer.out

    def _flush_eob(writer, n):
        while n:
            rrrr = min(n.bit_length() - 1, 14)
            take = min(n, (1 << rrrr) * 2 - 1)
            code, length = ac_tab.encode[rrrr << 4]
            writer.write(code, length)
            if rrrr:
                writer.write(take - (1 << rrrr), rrrr)
            n -= take

    # scans 2..: per-component AC FIRST scans at Al=1 — coefficients
    # enter as sign * (|v| >> 1) (point transform toward zero)
    for c in range(ncomp):
        _sos([c + 1], 1, 63, 0, AL)
        writer = _BitWriter()
        pending_eob = 0
        for y in range(by):
            for x in range(bx):
                zz = comp_coeffs[c][y, x]
                vals = [
                    (1 if int(zz[k]) > 0 else -1) * (abs(int(zz[k])) >> AL)
                    for k in range(64)
                ]
                if not any(vals[1:]):
                    pending_eob += 1
                    continue
                _flush_eob(writer, pending_eob)
                pending_eob = 0
                run = 0
                for k in range(1, 64):
                    v = vals[k]
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, length = ac_tab.encode[0xF0]
                        writer.write(code, length)
                        run -= 16
                    size, bits = _magnitude_bits(v)
                    code, length = ac_tab.encode[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits, size)
                    run = 0
                if run:
                    pending_eob = 1
        _flush_eob(writer, pending_eob)
        writer.flush()
        out += writer.out

    # DC refinement: Ah=1, Al=0 — one raw bit (the dropped LSB) per
    # block, same interleaved order as scan 1
    _sos(list(range(1, ncomp + 1)), 0, 0, AL, 0)
    writer = _BitWriter()
    for y in range(by):
        for x in range(bx):
            for c in range(ncomp):
                writer.write(int(comp_coeffs[c][y, x, 0]) & 1, 1)
    writer.flush()
    out += writer.out

    # AC refinement per component: Ah=1, Al=0
    for c in range(ncomp):
        _sos([c + 1], 1, 63, AL, 0)
        writer = _BitWriter()
        eobrun = 0
        bebuf: list[int] = []  # correction bits pending behind an EOBn

        def _emit_eobrun():
            nonlocal eobrun, bebuf
            if eobrun > 0:
                rrrr = eobrun.bit_length() - 1
                code, length = ac_tab.encode[rrrr << 4]
                writer.write(code, length)
                if rrrr:
                    writer.write(eobrun - (1 << rrrr), rrrr)
                eobrun = 0
                for b in bebuf:
                    writer.write(b, 1)
                bebuf = []

        for y in range(by):
            for x in range(bx):
                zz = comp_coeffs[c][y, x]
                # the refinement scan's point transform is its OWN
                # Al (= 0 here), not the first scan's: t == 1 means
                # |v| == 1 — zero at the first scan's precision,
                # newly nonzero now; t > 1 was already sent and needs
                # only its bit-0 correction
                absval = [abs(int(zz[k])) for k in range(64)]
                eob = 0
                for k in range(1, 64):
                    if absval[k] == 1:
                        eob = k
                r = 0
                br: list[int] = []
                for k in range(1, 64):
                    t = absval[k]
                    if t == 0:
                        r += 1
                        continue
                    # flush ZRLs at EVERY nonzero position (not just
                    # newly-nonzero ones) so buffered correction bits
                    # stay in position order for the decoder's
                    # interleaved advance; past the last newly-nonzero
                    # (k > eob) they fold into the EOB run instead —
                    # the libjpeg encode_mcu_AC_refine contract
                    while r > 15 and k <= eob:
                        _emit_eobrun()
                        code, length = ac_tab.encode[0xF0]
                        writer.write(code, length)
                        r -= 16
                        for b in br:
                            writer.write(b, 1)
                        br = []
                    if t > 1:
                        # already nonzero after the first scan: one
                        # correction bit, buffered behind the next
                        # emitted symbol
                        br.append(absval[k] & 1)
                        continue
                    # newly nonzero at this precision
                    _emit_eobrun()
                    code, length = ac_tab.encode[(r << 4) | 1]
                    writer.write(code, length)
                    writer.write(1 if int(zz[k]) > 0 else 0, 1)
                    for b in br:
                        writer.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    bebuf.extend(br)
                    if eobrun == 0x7FFF:
                        _emit_eobrun()
        _emit_eobrun()
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


class _ProgressiveState:
    """Coefficient accumulator across a progressive frame's scans:
    per-component zigzag arrays on the MCU-padded grid, plus the
    frame geometry non-interleaved scans need."""

    def __init__(self, h, w, comps):
        self.h, self.w = h, w
        self.comps = comps  # [(cid, qid, hc, vc)]
        self.hmax = max(c[2] for c in comps)
        self.vmax = max(c[3] for c in comps)
        self.mx = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.my = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        total = sum(
            self.my * vc * self.mx * hc * 64 for _, _, hc, vc in comps
        )
        if total > _MAX_DECODE_PIXELS * 3:
            raise _Corrupt("declared dimensions exceed decode cap")
        self.coeffs = {
            cid: np.zeros((self.my * vc, self.mx * hc, 64))
            for cid, _, hc, vc in comps
        }

    def comp_blocks(self, cid):
        """A non-interleaved scan's TRUE block grid (ceil of the
        component's sampled dims — NOT the MCU-padded grid)."""
        _, _, hc, vc = next(c for c in self.comps if c[0] == cid)
        ch = (self.h * vc + self.vmax - 1) // self.vmax
        cw = (self.w * hc + self.hmax - 1) // self.hmax
        return (ch + 7) // 8, (cw + 7) // 8


def _decode_progressive_scan(
    payload, pos, state, scan_comps, ss, se, huff, restart_interval,
    ah=0, al=0,
):
    """One progressive scan's entropy data into ``state``: a DC scan
    (Ss=0) is interleaved over the MCU grid when it carries several
    components and block-raster when one; an AC scan (Ss>=1) is always
    single-component block-raster with EOBRUN handling (EOBn codes
    n-block end-of-band runs). r13 adds SUCCESSIVE APPROXIMATION
    (T.81 §G.2): a first scan (Ah=0, Al>0) stores values shifted left
    Al; a DC refinement (Ah>0, Ss=0) appends one raw bit per block;
    an AC refinement (Ah>0, Ss>=1) decodes newly-nonzero coefficients
    at magnitude 1<<Al and one correction bit per already-nonzero
    coefficient (added toward the sign when the bit is newly set —
    the libjpeg decode_mcu_AC_refine contract). Returns the byte
    position of the next marker."""
    reader = _BitReader(payload, pos)
    p1, m1 = 1 << al, -(1 << al)

    def _refine_range(zz, a, b):
        for kk in range(a, b + 1):
            v = int(zz[kk])
            if v != 0 and reader.read_bit():
                if (v & p1) == 0:
                    zz[kk] = v + (p1 if v > 0 else m1)

    if ss == 0 and ah:
        # DC refinement: one raw bit per block, same unit order as the
        # first DC scan (interleaved when several components)
        units = _dc_scan_units(state, scan_comps)
        n_done = 0
        per_restart = _dc_per_restart(state, scan_comps)
        for cid, y, x in units:
            if (
                restart_interval
                and n_done
                and n_done % (restart_interval * per_restart) == 0
            ):
                marker = reader.align_to_marker()
                if not 0xD0 <= marker <= 0xD7:
                    raise _Corrupt("expected RSTn")
            if reader.read_bit():
                state.coeffs[cid][y, x, 0] += p1
            n_done += 1
        return _next_marker_pos(payload, reader)
    if ss > 0 and ah:
        # AC refinement
        if len(scan_comps) != 1:
            raise _Corrupt("progressive AC scan must be single-component")
        cid, _, ac_tab = scan_comps[0]
        cby, cbx = state.comp_blocks(cid)
        eobrun = 0
        n_done = 0
        for y in range(cby):
            for x in range(cbx):
                if (
                    restart_interval
                    and n_done
                    and n_done % restart_interval == 0
                ):
                    marker = reader.align_to_marker()
                    if not 0xD0 <= marker <= 0xD7:
                        raise _Corrupt("expected RSTn")
                    eobrun = 0
                n_done += 1
                zz = state.coeffs[cid][y, x]
                if eobrun:
                    _refine_range(zz, ss, se)
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = reader.decode_symbol(ac_tab)
                    run, size = sym >> 4, sym & 0xF
                    if size == 0 and run != 15:
                        # EOBn: correction bits still cover the rest
                        # of THIS block
                        eobrun = (1 << run) - 1 + (
                            reader.receive(run) if run else 0
                        )
                        _refine_range(zz, k, se)
                        break
                    if size == 0:
                        val = 0  # ZRL: 16 zero-history positions
                    else:
                        if size != 1:
                            raise _Corrupt(
                                "AC refinement magnitude must be 1"
                            )
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        v = int(zz[k])
                        if v != 0:
                            if reader.read_bit() and (v & p1) == 0:
                                zz[k] = v + (p1 if v > 0 else m1)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if val != 0:
                        if k > se:
                            raise _Corrupt("AC refinement past band end")
                        zz[k] = val
                    k += 1
        return _next_marker_pos(payload, reader)
    if ss == 0:
        preds = {cid: 0 for cid, _, _ in scan_comps}
        units = _dc_scan_units(state, scan_comps)
        per_restart = _dc_per_restart(state, scan_comps)
        n_done = 0
        for cid, y, x in units:
            if (
                restart_interval
                and n_done
                and n_done % (restart_interval * per_restart) == 0
            ):
                marker = reader.align_to_marker()
                if not 0xD0 <= marker <= 0xD7:
                    raise _Corrupt("expected RSTn")
                preds = {k: 0 for k in preds}
            dc_tab = next(t for c, t, _ in scan_comps if c == cid)
            size = reader.decode_symbol(dc_tab)
            if size > 11:
                raise _Corrupt("DC category out of range")
            preds[cid] += _extend(reader.receive(size), size)
            # first scan under successive approximation: values arrive
            # point-transformed (arithmetic shift right Al on encode)
            state.coeffs[cid][y, x, 0] = preds[cid] * (1 << al)
            n_done += 1
    else:
        if len(scan_comps) != 1:
            raise _Corrupt("progressive AC scan must be single-component")
        cid, _, ac_tab = scan_comps[0]
        cby, cbx = state.comp_blocks(cid)
        eobrun = 0
        n_done = 0
        for y in range(cby):
            for x in range(cbx):
                if (
                    restart_interval
                    and n_done
                    and n_done % restart_interval == 0
                ):
                    marker = reader.align_to_marker()
                    if not 0xD0 <= marker <= 0xD7:
                        raise _Corrupt("expected RSTn")
                    eobrun = 0
                n_done += 1
                if eobrun:
                    eobrun -= 1
                    continue
                zz = state.coeffs[cid][y, x]
                k = ss
                while k <= se:
                    sym = reader.decode_symbol(ac_tab)
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run == 15:
                            k += 16  # ZRL
                            continue
                        # EOBn: 2^run - 1 + extra MORE blocks end here
                        eobrun = (1 << run) - 1 + (
                            reader.receive(run) if run else 0
                        )
                        break
                    k += run
                    if k > se:
                        raise _Corrupt("AC index past band end")
                    zz[k] = _extend(reader.receive(size), size) * (1 << al)
                    k += 1
    return _next_marker_pos(payload, reader)


def _dc_scan_units(state, scan_comps) -> list:
    """The unit order of a DC scan: interleaved MCU order when the
    scan carries several components, block raster when one."""
    if len(scan_comps) > 1:
        units = []
        for y in range(state.my):
            for x in range(state.mx):
                for cid, _, _ in scan_comps:
                    _, _, hc, vc = next(
                        c for c in state.comps if c[0] == cid
                    )
                    for v in range(vc):
                        for u in range(hc):
                            units.append((cid, y * vc + v, x * hc + u))
        return units
    cid = scan_comps[0][0]
    cby, cbx = state.comp_blocks(cid)
    return [(cid, y, x) for y in range(cby) for x in range(cbx)]


def _dc_per_restart(state, scan_comps) -> int:
    if len(scan_comps) > 1:
        return sum(
            hc * vc
            for cid, _, _ in scan_comps
            for _, _, hc, vc in [
                next(c for c in state.comps if c[0] == cid)
            ]
        )
    return 1


def _next_marker_pos(payload, reader) -> int:
    """Entropy data done: bit-align and locate the next marker (skip
    0xFF fill bytes, never treat a stuffed 0xFF00 as a marker)."""
    j = reader.pos
    while j + 1 < len(payload):
        if payload[j] == 0xFF and payload[j + 1] not in (0x00, 0xFF):
            return j
        j += 1
    raise _Corrupt("no marker after progressive scan")


# ---------------------------------------------------------------------------
# lossless sequential (SOF3), r15 — VERDICT r14 item 7. T.81 Annex H:
# predictive coding on the causal neighborhood, Huffman-coded
# differences reusing the DC SSSS machinery. The reference repo has no
# codec layer; the public T.81 spec is the source.


def _lossless_dc_table() -> _HuffTable:
    """17 difference categories 0..16, all 5-bit codes (17 < 31 keeps
    the all-ones code reserved). Category 16 is the lossless escape for
    a difference of exactly ±32768 — no appended bits (T.81 §H.1.2.2:
    differences are taken modulo 65536)."""
    bits = [0] * 16
    bits[4] = 17
    return _HuffTable(bits, list(range(17)))


def _lossless_predict(p, y: int, x: int, predictor: int, default: int) -> int:
    """T.81 §H.1.2.1 prediction: the first sample of the scan predicts
    the midpoint default, the rest of the first LINE predicts Ra
    (left), the first COLUMN predicts Rb (above), and interior samples
    use the selected predictor 1-7 over Ra/Rb/Rc (above-left). All in
    the point-transformed domain, over RECONSTRUCTED neighbors."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(p[0, x - 1])
    if x == 0:
        return int(p[y - 1, 0])
    ra = int(p[y, x - 1])
    rb = int(p[y - 1, x])
    rc = int(p[y - 1, x - 1])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1  # predictor 7


def encode_jpeg_lossless(
    img, predictor: int = 1, point_transform: int = 0
) -> bytes:
    """Encode as LOSSLESS sequential (SOF3) JPEG — T.81 Annex H.
    Predictor 1-7 over the causal neighborhood; differences modulo
    65536, Huffman-coded with DC-style SSSS categories (16 = the
    ±32768 escape, no appended bits). Components are stored DIRECTLY
    (lossless JPEG defines no color transform), 8-bit (uint8) or
    16-bit (uint16) precision, 1×1 sampling, one interleaved scan.
    ``point_transform`` Pt shifts samples right Pt before prediction
    and the decoder shifts them back left — the mode's only lossy
    knob, off by default: at Pt=0 decode is bit-for-bit identical to
    the input."""
    if not 1 <= predictor <= 7:
        raise ValueError("lossless predictor must be 1-7")
    img = np.asarray(img)
    if img.dtype == np.uint16:
        precision = 16
    elif img.dtype == np.uint8:
        precision = 8
    else:
        raise ValueError(
            "lossless encode expects uint8 or uint16 samples, got "
            f"{img.dtype}"
        )
    if not 0 <= point_transform < precision:
        raise ValueError("point_transform must be in [0, precision)")
    if img.ndim == 2:
        planes = [img]
    elif img.ndim == 3 and img.shape[2] in (1, 3):
        planes = [img[:, :, c] for c in range(img.shape[2])]
    else:
        raise ValueError("expected (h, w) or (h, w, 1|3) samples")
    h, w = planes[0].shape
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError("dimensions out of JPEG range")
    pt = point_transform
    shifted = [p.astype(np.int64) >> pt for p in planes]
    tab = _lossless_dc_table()
    out = bytearray(b"\xff\xd8")
    dht = bytes([0x00]) + bytes(tab.bits) + bytes(tab.huffval)
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    nf = len(planes)
    sof = (
        bytes([precision])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([nf])
    )
    for c in range(nf):
        # Tq is meaningless in lossless (no quantization): 0
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc3" + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = bytes([nf])
    for c in range(nf):
        sos += bytes([c + 1, 0x00])
    # Ss carries the predictor, Se must be 0, Al the point transform
    sos += bytes([predictor, 0, pt])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    writer = _BitWriter()
    default = 1 << (precision - pt - 1)
    for y in range(h):
        for x in range(w):
            for p in shifted:
                px = _lossless_predict(p, y, x, predictor, default)
                diff = (int(p[y, x]) - px) & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                if diff == -32768:
                    code, length = tab.encode[16]
                    writer.write(code, length)
                    continue
                size, bits_v = _magnitude_bits(diff)
                code, length = tab.encode[size]
                writer.write(code, length)
                if size:
                    writer.write(bits_v, size)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _decode_lossless_scan(
    payload, pos, h, w, tabs, predictor, pt, precision
):
    """Decode one interleaved SOF3 scan → uint8/uint16 array (h, w)
    or (h, w, 3). Reconstruction Rx = (Px + diff) mod 65536 in the
    point-transformed domain, output shifted back left Pt (T.81
    §H.2)."""
    if h * w * len(tabs) > 3 * _MAX_DECODE_PIXELS:
        return None
    reader = _BitReader(payload, pos)
    default = 1 << (precision - pt - 1)
    planes = [np.zeros((h, w), dtype=np.int64) for _ in tabs]
    try:
        for y in range(h):
            for x in range(w):
                for p, tab in zip(planes, tabs):
                    ssss = reader.decode_symbol(tab)
                    if ssss == 16:
                        diff = 32768
                    elif ssss:
                        diff = _extend(reader.receive(ssss), ssss)
                    else:
                        diff = 0
                    px = _lossless_predict(p, y, x, predictor, default)
                    p[y, x] = (px + diff) & 0xFFFF
    except _MarkerHit:
        return None
    dtype = np.uint8 if precision <= 8 else np.uint16
    outs = [(p << pt).astype(dtype) for p in planes]
    if len(outs) == 1:
        return outs[0]
    return np.stack(outs, axis=-1)
