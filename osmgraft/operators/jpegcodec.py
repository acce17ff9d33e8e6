"""Stdlib+numpy JPEG codec (ITU-T T.81, sequential + progressive Huffman).

JPEG is the dominant real-world training-image format; this module
implements it from the spec — no Pillow, no libjpeg: marker parse
(struct), entropy decode (canonical Huffman per T.81 F.2.2 via sized
peek LUTs), and a fully numpy-vectorized dequant + IDCT (one
orthonormal-basis einsum over every block of a component at once).

Decoder scope: SOF0 baseline / SOF1 extended sequential / SOF2
progressive (full T.81 Annex G — spectral selection, successive
approximation in DC and AC, EOBRUN, per-scan table redefinition,
restart intervals). 8-bit samples, 1-component grayscale or 3-component
YCbCr (JFIF) with sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0), 8- and
16-bit-precision quant tables. Arithmetic coding, lossless, 12-bit, and
CMYK raise ``ValueError`` — those payloads route to the injected Pillow
codec seam (``extract_features(codec=...)``).

The encoders are the synth/test counterparts (like ``encode_wav_pcm16``
for WAV): a baseline writer and a progressive writer sharing one
coefficient front half, with configurable quality / chroma subsampling /
restart interval / scan script. Both emit per-image canonical Huffman
tables where every used symbol gets the same code length (legal JPEG —
tables travel in DHT; the all-ones code stays unused) — compression is
irrelevant for staging, decode correctness is what the oracles pin: the
shared front half means a progressive decode must equal the baseline
decode of the same image BIT-FOR-BIT, which the tests assert.

Like the PNG path, payloads are untrusted: SOF geometry is capped before
any allocation and the entropy decode validates Huffman codes and
coefficient indices instead of trusting them.

Reference parity note: the reference delegates all raster work to system
libs (FreeType/cairo — e.g. ``src/label/font.cpp:195-361``); JPEG decode
has no reference analogue and exists for the multimodal training-pipeline
brief, so the spec (ITU-T T.81 / JFIF) is the authority here.
"""

from __future__ import annotations

import struct

import numpy as np

from osmgraft.guard import untrusted_parser

_MAX_SAMPLES = 64_000_000  # width*height*components cap, like decode_png


def _zigzag_order() -> np.ndarray:
    """Natural (row*8+col) indices in zigzag scan order, generated from the
    anti-diagonal walk instead of a hand-typed table."""
    order: list[int] = []
    for s in range(15):
        lo, hi = max(0, s - 7), min(7, s)
        rows = range(lo, hi + 1) if s % 2 else range(hi, lo - 1, -1)
        for r in rows:
            order.append(r * 8 + (s - r))
    return np.asarray(order, dtype=np.int64)


_ZZ = _zigzag_order()

# orthonormal DCT-II basis: JPEG's FDCT is F = C @ f @ C.T, IDCT f = C.T @ F @ C
_DCT_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


_LUT_CACHE: dict[tuple[bytes, bytes], tuple[int, list[int]]] = {}
_LUT_CACHE_MAX = 256  # tables are small but inputs are untrusted — bound it


def _build_lut(bits: list[int], vals: bytes) -> tuple[int, list[int]]:
    """Peek table sized to the table's own longest code: returns
    ``(lut_bits, lut)`` where ``lut[window] = (code_length << 8) |
    symbol`` for every ``lut_bits``-wide window, 0 for invalid prefixes.
    Decoding is one slice + one list index instead of a bit-by-bit tree
    walk. Sizing at the REAL max code length matters: per-image tables
    (this encoder's flat tables are <=9 bits) build 512-entry LUTs in
    microseconds, while a fixed 2^16 build would dominate thumbnail
    decodes. Memoized on the raw DHT payload — corpora reusing the
    spec's example tables build each table once per executor."""
    key = (bytes(bits), vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    maxlen = 1
    for length in range(16, 0, -1):
        if bits[length - 1]:
            maxlen = length
            break
    arr = np.zeros(1 << maxlen, np.uint16)
    code = 0
    k = 0
    for length in range(1, maxlen + 1):
        for _ in range(bits[length - 1]):
            base = code << (maxlen - length)
            arr[base : base + (1 << (maxlen - length))] = (length << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    lut = (maxlen, arr.tolist())  # list indexing beats ndarray scalar boxing
    if len(_LUT_CACHE) < _LUT_CACHE_MAX:
        _LUT_CACHE[key] = lut
    return lut


class _HuffTable:
    """Canonical Huffman table in T.81 DECODE form (mincode/maxcode/valptr)
    plus the 16-bit peek LUT used by the fast decode path."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals", "lut_bits", "lut")

    def __init__(self, bits: list[int], vals: bytes):
        if sum(bits) != len(vals):
            raise ValueError("DHT: BITS/HUFFVAL length mismatch")
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for length in range(1, 17):
            self.valptr[length] = k
            self.mincode[length] = code
            n = bits[length - 1]
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1
        self.lut_bits, self.lut = _build_lut(bits, vals)


class _BitReader:
    """MSB-first bit cursor over one entropy segment. The segment bytes
    are expanded once (vectorized) into an ASCII '0'/'1' string;
    :func:`_decode_block` then reads codes and coefficient bits as
    C-speed ``int(slice, 2)`` over cached locals — no per-bit Python
    arithmetic."""

    __slots__ = ("s", "pos")

    def __init__(self, seg: bytes):
        self.s = (np.unpackbits(np.frombuffer(seg, np.uint8)) + ord("0")).astype(
            np.uint8
        ).tobytes().decode("ascii") if seg else ""
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > len(self.s):
            raise ValueError("JPEG entropy stream truncated")
        self.pos = p + n
        return int(self.s[p : p + n], 2)

    def read_bit(self) -> int:
        p = self.pos
        if p >= len(self.s):
            raise ValueError("JPEG entropy stream truncated")
        self.pos = p + 1
        return 1 if self.s[p] == "1" else 0


def _huff_lut(r: _BitReader, t: _HuffTable) -> int:
    """LUT-decode one Huffman symbol (the progressive path's per-symbol
    primitive; the baseline path inlines the same logic in
    :func:`_decode_block`)."""
    s = r.s
    pos = r.pos
    b = t.lut_bits
    chunk = s[pos : pos + b]
    if len(chunk) < b:
        chunk += "1" * (b - len(chunk))
    e = t.lut[int(chunk, 2)]
    length = e >> 8
    if length == 0:
        raise ValueError("invalid Huffman code in JPEG stream")
    if pos + length > len(s):
        raise ValueError("JPEG entropy stream truncated")
    r.pos = pos + length
    return e & 0xFF


def _decode_block(reader: _BitReader, dct: _HuffTable, act: _HuffTable, blk, pred: int) -> int:
    """Entropy-decode ONE 8x8 block into ``blk`` (zigzag order) and return
    the updated DC predictor. This is the decoder's innermost loop, so the
    LUT decode and RECEIVE/EXTEND are inlined over cached locals — one
    string slice + one list index per Huffman symbol, one more slice per
    nonzero coefficient, no per-coefficient function calls."""
    s = reader.s
    pos = reader.pos
    n = len(s)
    dbits, dlut = dct.lut_bits, dct.lut
    abits, alut = act.lut_bits, act.lut
    # DC coefficient
    chunk = s[pos : pos + dbits]
    if len(chunk) < dbits:
        chunk += "1" * (dbits - len(chunk))
    e = dlut[int(chunk, 2)]
    length = e >> 8
    if length == 0:
        raise ValueError("invalid Huffman code in JPEG stream")
    if pos + length > n:
        raise ValueError("JPEG entropy stream truncated")
    pos += length
    size = e & 0xFF
    if size > 11:
        raise ValueError(f"DC size {size} invalid")
    if size:
        if pos + size > n:
            raise ValueError("JPEG entropy stream truncated")
        v = int(s[pos : pos + size], 2)
        pos += size
        pred += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
    blk[0] = pred
    # AC coefficients
    k = 1
    while k < 64:
        chunk = s[pos : pos + abits]
        if len(chunk) < abits:
            chunk += "1" * (abits - len(chunk))
        e = alut[int(chunk, 2)]
        length = e >> 8
        if length == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        if pos + length > n:
            raise ValueError("JPEG entropy stream truncated")
        pos += length
        rs = e & 0xFF
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run != 15:
                break  # EOB
            k += 16
            continue
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overrun")
        if pos + size > n:
            raise ValueError("JPEG entropy stream truncated")
        v = int(s[pos : pos + size], 2)
        pos += size
        blk[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
        k += 1
    reader.pos = pos
    return pred


def _scan_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded scan at RSTn markers and drop 0xFF00 byte
    stuffing; returns (segments, position of the terminating marker)."""
    segs: list[bytearray] = [bytearray()]
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytearray())
            i += 2
        else:
            break
    return [bytes(s) for s in segs], i


@untrusted_parser
def decode_jpeg(payload: bytes, max_samples: int = _MAX_SAMPLES) -> np.ndarray:
    """Baseline or progressive JPEG -> HxW uint8 (gray) or HxWx3 (RGB).

    See module docstring for the supported envelope; everything outside it
    raises ``ValueError`` (``NotImplementedError`` never — the seam treats
    a raise as "route to the injected codec")."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")

    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (height, width, comps) ; comps = [(cid, h, v, tq)]
    progressive = False
    scans: list[dict] = []

    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"JPEG marker desync at offset {i}")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4 : i + 2 + seglen]
        i += 2 + seglen

        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(body[p : p + 64], np.uint8).astype(np.int32)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(body[p : p + 128], ">u2").astype(np.int32)
                    p += 128
                else:
                    raise ValueError(f"DQT precision {pq} invalid")
                if tbl.size != 64:
                    raise ValueError("DQT table truncated")
                quant[tq] = tbl  # kept in zigzag order, like the coefficients
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                cnt = sum(bits)
                vals = body[p + 17 : p + 17 + cnt]
                p += 17 + cnt
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, height, width, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported (8-bit only)")
            comps = []
            for c in range(nf):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (height, width, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF marker 0xFF{marker:02X} unsupported (sequential + "
                "progressive Huffman only — lossless/arithmetic route to the "
                "injected codec seam)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            height, width, comps = frame
            ns = body[0]
            if not progressive:
                if ns != len(comps):
                    raise ValueError(
                        "JPEG non-interleaved multi-scan unsupported (single "
                        "interleaved scan only)"
                    )
                scan_tables = {}
                for c in range(ns):
                    cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                    scan_tables[cid] = (tt >> 4, tt & 0x0F)
                segs, _ = _scan_segments(payload, i)
                return _decode_scan(
                    height, width, comps, scan_tables, quant, huff_dc, huff_ac,
                    segs, restart_interval, max_samples,
                )
            # progressive: record the scan (tables resolved NOW — DHT may be
            # redefined between scans) and keep walking markers
            scids = []
            tables = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scids.append(cid)
                tables[cid] = (huff_dc.get(tt >> 4), huff_ac.get(tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            segs, i = _scan_segments(payload, i)
            scans.append(
                {
                    "scids": scids,
                    "tables": tables,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0x0F,
                    "segs": segs,
                    "rst": restart_interval,
                }
            )
        # APPn / COM / everything else: skipped
    if progressive and frame is not None and scans:
        height, width, comps = frame
        return _decode_progressive(height, width, comps, scans, quant, max_samples)
    raise ValueError("JPEG missing SOS/EOI structure")


def _decode_scan(
    height: int,
    width: int,
    comps: list[tuple[int, int, int, int]],
    scan_tables: dict[int, tuple[int, int]],
    quant: dict[int, np.ndarray],
    huff_dc: dict[int, _HuffTable],
    huff_ac: dict[int, _HuffTable],
    segs: list[bytes],
    restart_interval: int,
    max_samples: int,
) -> np.ndarray:
    if height < 1 or width < 1:
        raise ValueError(f"bad JPEG geometry {width}x{height}")
    if len(comps) not in (1, 3):
        raise ValueError(f"{len(comps)}-component JPEG unsupported (gray/YCbCr only)")
    if height * width * len(comps) > max_samples:
        raise ValueError(
            f"JPEG geometry {width}x{height}x{len(comps)} exceeds max_samples={max_samples}"
        )
    for _, h, v, _ in comps:
        if h not in (1, 2) or v not in (1, 2):
            raise ValueError(f"sampling factor {h}x{v} unsupported (1-2 only)")
    if len(comps) == 1:
        # a lone component is its own MCU grid; normalize factors to 1
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # per-component coefficient store (blocks_h, blocks_w, 64), zigzag order
    coefs = []
    for _, h, v, _ in comps:
        coefs.append(np.zeros((mcus_y * v, mcus_x * h, 64), np.int32))

    seg_idx = 0
    reader = _BitReader(segs[0] if segs else b"")
    dc_pred = [0] * len(comps)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG restart marker missing")
            reader = _BitReader(segs[seg_idx])
            dc_pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (cid, h, v, _tq) in enumerate(comps):
            if cid not in scan_tables:
                raise ValueError(f"SOS lacks tables for component {cid}")
            td, ta = scan_tables[cid]
            dct, act = huff_dc.get(td), huff_ac.get(ta)
            if dct is None or act is None:
                raise ValueError("SOS references undefined Huffman table")
            for bv in range(v):
                for bh in range(h):
                    blk = coefs[ci][my * v + bv, mx * h + bh]
                    dc_pred[ci] = _decode_block(reader, dct, act, blk, dc_pred[ci])

    return _reconstruct(coefs, comps, quant, hmax, vmax, height, width)


def _decode_progressive(
    height: int,
    width: int,
    comps: list[tuple[int, int, int, int]],
    scans: list[dict],
    quant: dict[int, np.ndarray],
    max_samples: int,
) -> np.ndarray:
    """Progressive (SOF2) entropy decode per T.81 Annex G: each scan
    delivers either a spectral band's first pass (Ah=0, values scaled by
    2^Al) or a successive-approximation refinement (Ah=Al+1, one bit per
    coefficient). DC scans may be interleaved (MCU walk, as baseline);
    AC scans are per-component over that component's own block grid, with
    EOBRUN spanning blocks. Restart markers reset DC predictors, EOBRUN
    and bit alignment. The accumulated coefficient arrays feed the same
    :func:`_reconstruct` as the baseline path."""
    if height < 1 or width < 1:
        raise ValueError(f"bad JPEG geometry {width}x{height}")
    if len(comps) not in (1, 3):
        raise ValueError(f"{len(comps)}-component JPEG unsupported (gray/YCbCr only)")
    if height * width * len(comps) > max_samples:
        raise ValueError(
            f"JPEG geometry {width}x{height}x{len(comps)} exceeds max_samples={max_samples}"
        )
    for _, h, v, _ in comps:
        if h not in (1, 2) or v not in (1, 2):
            raise ValueError(f"sampling factor {h}x{v} unsupported (1-2 only)")
    if len(comps) == 1:
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    coefs = [np.zeros((mcus_y * v, mcus_x * h, 64), np.int32) for _, h, v, _ in comps]
    by_id = {cid: ci for ci, (cid, _, _, _) in enumerate(comps)}

    for scan in scans:
        scids, tables = scan["scids"], scan["tables"]
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        segs, rst = scan["segs"], scan["rst"]
        for cid in scids:
            if cid not in by_id:
                raise ValueError(f"SOS references unknown component {cid}")
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            _prog_dc_scan(coefs, comps, by_id, scids, tables, ah, al, segs, rst,
                          mcus_x, mcus_y, hmax, vmax, height, width)
        else:
            if len(scids) != 1:
                raise ValueError("progressive AC scan must be single-component")
            if not (1 <= ss <= se <= 63):
                raise ValueError(f"bad spectral band {ss}..{se}")
            _prog_ac_scan(coefs, comps, by_id, scids[0], tables, ss, se, ah, al,
                          segs, rst, hmax, vmax, height, width)
    return _reconstruct(coefs, comps, quant, hmax, vmax, height, width)


def _prog_dc_scan(coefs, comps, by_id, scids, tables, ah, al, segs, rst,
                  mcus_x, mcus_y, hmax, vmax, height, width) -> None:
    """DC scan: first pass (Ah=0) Huffman-codes predictor diffs of
    DC >> Al; refinement (Ah>0) is one raw bit per block, OR-ed in at
    bit Al. Interleaved when the scan carries >1 component."""
    interleaved = len(scids) > 1
    seg_idx = 0
    reader = _BitReader(segs[0] if segs else b"")
    preds = {cid: 0 for cid in scids}
    p1 = 1 << al

    def decode_one(cid: int, blk) -> None:
        if ah == 0:
            dct = tables[cid][0]
            if dct is None:
                raise ValueError("DC scan references undefined Huffman table")
            s = _huff_lut(reader, dct)
            if s > 11:
                raise ValueError(f"DC size {s} invalid")
            if s:
                v = reader.read(s)
                preds[cid] += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
            blk[0] = preds[cid] << al
        else:
            if reader.read_bit():
                blk[0] |= p1

    if interleaved:
        units = mcus_x * mcus_y
        for mcu in range(units):
            if rst and mcu and mcu % rst == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("JPEG restart marker missing")
                reader = _BitReader(segs[seg_idx])
                preds = {cid: 0 for cid in scids}
            my, mx = divmod(mcu, mcus_x)
            for cid in scids:
                ci = by_id[cid]
                _, h, v, _ = comps[ci]
                for bv in range(v):
                    for bh in range(h):
                        decode_one(cid, coefs[ci][my * v + bv, mx * h + bh])
    else:
        # non-interleaved: the component's REAL block grid, not MCU-padded
        cid = scids[0]
        ci = by_id[cid]
        _, h, v, _ = comps[ci]
        cw = -(-width * h // hmax)
        chh = -(-height * v // vmax)
        bw_n = -(-cw // 8)
        bh_n = -(-chh // 8)
        for unit in range(bh_n * bw_n):
            if rst and unit and unit % rst == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("JPEG restart marker missing")
                reader = _BitReader(segs[seg_idx])
                preds = {cid: 0}
            by, bx = divmod(unit, bw_n)
            decode_one(cid, coefs[ci][by, bx])


def _prog_ac_scan(coefs, comps, by_id, cid, tables, ss, se, ah, al, segs, rst,
                  hmax, vmax, height, width) -> None:
    """AC band scan over one component's own block grid (ceil(cw/8) x
    ceil(ch/8) — never the MCU-padded grid). First pass (Ah=0) is
    runlength + EOBRUN coding of coefficients scaled by 2^Al; refinement
    (Ah=Al+1) adds one magnitude bit per already-nonzero coefficient
    (correction bits) and codes newly-nonzero positions with s=1
    symbols, per T.81 G.2 / the libjpeg decode_mcu_AC_refine walk."""
    ci = by_id[cid]
    _, h, v, _ = comps[ci]
    act = tables[cid][1]
    if act is None:
        raise ValueError("AC scan references undefined Huffman table")
    cw = -(-width * h // hmax)
    ch = -(-height * v // vmax)
    bw_n = -(-cw // 8)
    bh_n = -(-ch // 8)
    seg_idx = 0
    reader = _BitReader(segs[0] if segs else b"")
    eobrun = 0
    p1 = 1 << al
    m1 = -1 << al

    for unit in range(bh_n * bw_n):
        if rst and unit and unit % rst == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG restart marker missing")
            reader = _BitReader(segs[seg_idx])
            eobrun = 0
        by, bx = divmod(unit, bw_n)
        blk = coefs[ci][by, bx]
        if ah == 0:
            # ---- first pass --------------------------------------------
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_lut(reader, act)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read(r)
                        break
                    k += 16
                    continue
                k += r
                if k > se:
                    raise ValueError("AC coefficient index overrun")
                val = reader.read(s)
                val = val if val >= (1 << (s - 1)) else val - (1 << s) + 1
                blk[k] = val << al
                k += 1
        else:
            # ---- refinement pass ---------------------------------------
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_lut(reader, act)
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read(r)
                            break  # correction tail below consumes from k
                    else:
                        if s != 1:
                            raise ValueError("AC refinement size must be 1")
                        val = p1 if reader.read_bit() else m1
                    # advance r zero-history positions, reading correction
                    # bits at every nonzero-history position passed
                    while k <= se:
                        c = int(blk[k])
                        if c != 0:
                            if reader.read_bit() and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun:
                # EOB-covered remainder: correction bits only
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1


def _reconstruct(
    coefs: list[np.ndarray],
    comps: list[tuple[int, int, int, int]],
    quant: dict[int, np.ndarray],
    hmax: int,
    vmax: int,
    height: int,
    width: int,
) -> np.ndarray:
    """Dequantize + de-zigzag + IDCT + upsample + color transform,
    vectorized per component — shared by the baseline and progressive
    entropy decoders (both produce the same coefficient arrays)."""
    planes = []
    for ci, (_, h, v, tq) in enumerate(comps):
        if tq not in quant:
            raise ValueError(f"SOF references undefined quant table {tq}")
        deq = coefs[ci].astype(np.float64) * quant[tq][None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, _ZZ] = deq
        bh, bw = nat.shape[0], nat.shape[1]
        freq = nat.reshape(bh, bw, 8, 8)
        spatial = np.einsum("ky,ijyx,xl->ijkl", _DCT_C.T, freq, _DCT_C)
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        # crop to the component's own sample grid, then upsample to full res
        cw = -(-width * h // hmax)
        ch = -(-height * v // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (synth/test counterpart)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _flat_huff(symbols: set[int]) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Canonical table where every used symbol has the same code length —
    legal (all-ones code unused because n <= 2^L - 1), trivially decodable,
    and compression-agnostic by design (staging, not archiving)."""
    syms = sorted(symbols) or [0]
    length = 1
    while (1 << length) - 1 < len(syms):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    codes = {s: (i, length) for i, s in enumerate(syms)}
    return bits, bytes(syms), codes


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _prep_coefficients(img: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: color transform + chroma pooling +
    FDCT + quantize, vectorized. Returns (height, width, sampling, qtab,
    comp_coefs, mcus_x, mcus_y) with coefficients in zigzag order."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("JPEG encoder expects uint8 samples")
    if img.ndim == 2:
        comps_px = [img.astype(np.float64)]
        sampling = [(1, 1)]
    elif img.ndim == 3 and img.shape[2] == 3:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if subsampling == "444":
            comps_px = [y, cb, cr]
            sampling = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            comps_px = [y, _mean_pool2(cb), _mean_pool2(cr)]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsampling {subsampling!r} not in ('444', '420')")
    else:
        raise ValueError("expected HxW gray or HxWx3 RGB")

    height, width = img.shape[:2]
    # quant tables in zigzag order: luminance = chrominance = frequency ramp
    scale = max(0.0, (100 - quality) / 50.0)
    ramp = 1.0 + (np.add.outer(np.arange(8), np.arange(8)).reshape(64)[_np_argsort_zz()]) * 4.0 * scale
    qtab = np.clip(np.round(ramp), 1, 255).astype(np.int32)

    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # FDCT + quantize all blocks per component (vectorized), zigzag order
    comp_coefs = []
    for px, (h, v) in zip(comps_px, sampling):
        ph, pw = mcus_y * v * 8, mcus_x * h * 8
        pad = np.pad(px, ((0, ph - px.shape[0]), (0, pw - px.shape[1])), mode="edge")
        blocks = pad.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        freq = np.einsum("ky,ijyx,xl->ijkl", _DCT_C, blocks, _DCT_C.T)
        zz = freq.reshape(freq.shape[0], freq.shape[1], 64)[..., _ZZ]
        comp_coefs.append(np.round(zz / qtab[None, None, :]).astype(np.int32))
    return height, width, sampling, qtab, comp_coefs, mcus_x, mcus_y


def _jfif_headers(height, width, sampling, qtab, sof_marker: int) -> bytearray:
    """SOI + APP0 + DQT + SOFn header prefix shared by both encoders."""
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qtab))
    nf = len(sampling)
    sof = struct.pack(">BHHB", 8, height, width, nf)
    for ci, (h, v) in enumerate(sampling):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += seg(sof_marker, sof)
    return out


def encode_jpeg_baseline(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF writer: gray (HxW) -> 1 component; RGB (HxWx3) ->
    YCbCr with ``subsampling`` '444' (no chroma subsampling) or '420'
    (2x2 mean). ``quality=100`` emits all-ones quant tables (round-trip
    error bounded by DCT rounding, pinned in tests); lower quality scales
    a frequency-ramp table. ``restart_interval`` in MCUs (0 = none)."""
    height, width, sampling, qtab, comp_coefs, mcus_x, mcus_y = _prep_coefficients(
        img, quality, subsampling
    )
    comps_px = sampling  # per-component iteration only needs the count

    # pass 1: tokenize in MCU scan order, collecting symbol sets
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    tokens = []  # per MCU: list of (kind, payload)
    dc_pred = [0] * len(comps_px)
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            dc_pred = [0] * len(comps_px)
        my, mx = divmod(mcu, mcus_x)
        for ci, (h, v) in enumerate(sampling):
            for bv in range(v):
                for bh in range(h):
                    blk = comp_coefs[ci][my * v + bv, mx * h + bh]
                    diff = int(blk[0]) - dc_pred[ci]
                    dc_pred[ci] = int(blk[0])
                    s = _size_cat(diff)
                    dc_syms.add(s)
                    toks = [("dc", s, diff)]
                    run = 0
                    for k in range(1, 64):
                        val = int(blk[k])
                        if val == 0:
                            run += 1
                            continue
                        while run > 15:
                            ac_syms.add(0xF0)
                            toks.append(("ac", 0xF0, 0))
                            run -= 16
                        sz = _size_cat(val)
                        sym = (run << 4) | sz
                        ac_syms.add(sym)
                        toks.append(("ac", sym, val))
                        run = 0
                    if run:
                        ac_syms.add(0x00)
                        toks.append(("ac", 0x00, 0))
                    tokens.append(toks)

    dc_bits, dc_vals, dc_codes = _flat_huff(dc_syms)
    ac_bits, ac_vals, ac_codes = _flat_huff(ac_syms)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    nf = len(comps_px)
    out = _jfif_headers(height, width, sampling, qtab, 0xC0)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nf])
    for ci in range(nf):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    # pass 2: emit bits
    w = _BitWriter()
    blocks_per_mcu = sum(h * v for h, v in sampling)
    rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            w.pad_to_byte()
            out += w.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            w = _BitWriter()
        for toks in tokens[mcu * blocks_per_mcu : (mcu + 1) * blocks_per_mcu]:
            for kind, sym, val in toks:
                code, length = (dc_codes if kind == "dc" else ac_codes)[sym]
                w.write(code, length)
                s = sym & 0x0F if kind == "ac" else sym
                if s:
                    w.write(val if val > 0 else val + (1 << s) - 1, s)
    w.pad_to_byte()
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (test/synth counterpart of _decode_progressive)
# ---------------------------------------------------------------------------


class _SymCollect:
    """Pass-1 sink: records which Huffman symbols a scan emits (raw bits
    and restarts are ignored), so pass 2 can build the scan's table."""

    __slots__ = ("syms",)

    def __init__(self):
        self.syms: set[int] = set()

    def sym(self, s: int) -> None:
        self.syms.add(s)

    def bits(self, v: int, n: int) -> None:
        pass

    def restart(self) -> None:
        pass


class _SymEmit:
    """Pass-2 sink: Huffman-codes symbols, appends raw bits, and writes
    RSTn markers (byte-aligned) at restart boundaries."""

    __slots__ = ("codes", "out", "w", "rst")

    def __init__(self, codes: dict[int, tuple[int, int]], out: bytearray):
        self.codes = codes
        self.out = out
        self.w = _BitWriter()
        self.rst = 0

    def sym(self, s: int) -> None:
        code, length = self.codes[s]
        self.w.write(code, length)

    def bits(self, v: int, n: int) -> None:
        self.w.write(v, n)

    def restart(self) -> None:
        self.w.pad_to_byte()
        self.out += self.w.out
        self.out += bytes([0xFF, 0xD0 + (self.rst & 7)])
        self.rst += 1
        self.w = _BitWriter()

    def finish(self) -> None:
        self.w.pad_to_byte()
        self.out += self.w.out


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: |v| >> Al with the sign restored (truncation
    toward zero, T.81 G.1.2.2 — DC uses plain arithmetic shift instead)."""
    return -((-v) >> al) if v < 0 else v >> al


def _emit_dc_scan(sink, comp_coefs, sampling, scan_cis, ah, al, rst, mcus_x, mcus_y):
    """Interleaved DC scan: first pass (Ah=0) Huffman-codes diffs of
    DC >> Al; refinement emits bit Al of each block's DC, raw."""
    preds = [0] * len(sampling)
    for mcu in range(mcus_x * mcus_y):
        if rst and mcu and mcu % rst == 0:
            sink.restart()
            preds = [0] * len(sampling)
        my, mx = divmod(mcu, mcus_x)
        for ci in scan_cis:
            h, v = sampling[ci]
            for bv in range(v):
                for bh in range(h):
                    dc = int(comp_coefs[ci][my * v + bv, mx * h + bh, 0])
                    if ah == 0:
                        dv = dc >> al  # arithmetic shift (T.81 G.1.2.1)
                        diff = dv - preds[ci]
                        preds[ci] = dv
                        s = _size_cat(diff)
                        sink.sym(s)
                        if s:
                            sink.bits(diff if diff > 0 else diff + (1 << s) - 1, s)
                    else:
                        sink.bits((dc >> al) & 1, 1)


def _emit_ac_scan(sink, blocks, ss, se, ah, al, rst):
    """Single-component AC band scan over the component's real block
    grid (``blocks`` is an iterable of zigzag 64-vectors in raster
    order). First pass (Ah=0) runlength-codes coefficients truncated by
    2^Al with cross-block EOBRUN; refinement (Ah=Al+1) mirrors the
    decoder's position walk exactly — newly-nonzero positions get
    (run<<4)|1 symbols + a sign bit, already-nonzero positions passed
    emit one correction bit each, and EOB-covered remainders buffer
    their correction bits until the EOBRUN symbol flushes."""
    eobrun = 0
    eob_corr: list[int] = []

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            sink.sym(nbits << 4)
            if nbits:
                sink.bits(eobrun - (1 << nbits), nbits)
            for b in eob_corr:
                sink.bits(b, 1)
            eob_corr.clear()
            eobrun = 0

    for unit, blk in enumerate(blocks):
        if rst and unit and unit % rst == 0:
            flush_eob()
            sink.restart()
        if ah == 0:
            band = [_trunc_shift(int(blk[k]), al) for k in range(ss, se + 1)]
            nz = [j for j, v in enumerate(band) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last = nz[-1]
            for j in range(last + 1):
                v = band[j]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sink.sym(0xF0)
                    run -= 16
                s = _size_cat(v)
                sink.sym((run << 4) | s)
                sink.bits(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < se - ss:  # trailing zeros -> this block starts an EOB run
                eobrun = 1
        else:
            p_hist = [_trunc_shift(int(blk[k]), al + 1) for k in range(ss, se + 1)]
            cur = [_trunc_shift(int(blk[k]), al) for k in range(ss, se + 1)]
            corrbit = [abs(c) & 1 for c in cur]
            newly = [j for j in range(len(cur)) if p_hist[j] == 0 and cur[j] != 0]
            if not newly:
                eob_corr.extend(corrbit[j] for j in range(len(cur)) if p_hist[j])
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            j = 0  # walk position (band-relative), mirroring the decoder
            for target in newly:
                zrun = sum(1 for t in range(j, target) if p_hist[t] == 0)
                while zrun > 15:
                    sink.sym(0xF0)
                    cnt = 0
                    while cnt < 16:  # ZRL advances 16 zero-history positions
                        if p_hist[j]:
                            sink.bits(corrbit[j], 1)
                        else:
                            cnt += 1
                        j += 1
                    zrun -= 16
                sink.sym((zrun << 4) | 1)
                sink.bits(1 if cur[target] > 0 else 0, 1)
                while j < target:  # corrections up to the new coefficient
                    if p_hist[j]:
                        sink.bits(corrbit[j], 1)
                    j += 1
                j = target + 1
            if j < len(cur):  # trailing remainder -> EOB with buffered corr
                eob_corr.extend(corrbit[t] for t in range(j, len(cur)) if p_hist[t])
                eobrun = 1
    flush_eob()


def _default_scan_script(n_comps: int) -> list[tuple]:
    """libjpeg-style progressive scan script: DC first at Al=1, AC bands
    at Al=2, two AC refinement sweeps, DC refinement last. Entries are
    (kind, comp_indices, Ss, Se, Ah, Al)."""
    all_cis = list(range(n_comps))
    script: list[tuple] = [("dc", all_cis, 0, 0, 0, 1)]
    for ci in all_cis:
        script.append(("ac", [ci], 1, 5, 0, 2))
    for ci in all_cis:
        script.append(("ac", [ci], 6, 63, 0, 2))
    for ci in all_cis:
        script.append(("ac", [ci], 1, 63, 2, 1))
    for ci in all_cis:
        script.append(("ac", [ci], 1, 63, 1, 0))
    script.append(("dc", all_cis, 0, 0, 1, 0))
    return script


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    scan_script: list[tuple] | None = None,
) -> bytes:
    """Progressive (SOF2) JFIF writer over the same coefficient front
    half as :func:`encode_jpeg_baseline` — the two encoders quantize
    identically, so decoding a progressive stream must reproduce the
    baseline decode of the same image bit-for-bit (pinned in tests).
    Each scan gets its own flat Huffman table (DHT redefined per scan,
    table ids 0); DC refinement scans are raw bits. The default scan
    script exercises spectral selection, successive approximation in
    both DC and AC, ZRL-with-corrections and EOBRUN paths."""
    height, width, sampling, qtab, comp_coefs, mcus_x, mcus_y = _prep_coefficients(
        img, quality, subsampling
    )
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    script = scan_script if scan_script is not None else _default_scan_script(len(sampling))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = _jfif_headers(height, width, sampling, qtab, 0xC2)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def comp_blocks(ci: int):
        h, v = sampling[ci]
        cw = -(-width * h // hmax)
        chh = -(-height * v // vmax)
        bw_n = -(-cw // 8)
        bh_n = -(-chh // 8)
        for unit in range(bh_n * bw_n):
            by, bx = divmod(unit, bw_n)
            yield comp_coefs[ci][by, bx]

    for kind, cis, ss, se, ah, al in script:
        def run_scan(sink):
            if kind == "dc":
                _emit_dc_scan(sink, comp_coefs, sampling, cis, ah, al,
                              restart_interval, mcus_x, mcus_y)
            else:
                _emit_ac_scan(sink, comp_blocks(cis[0]), ss, se, ah, al,
                              restart_interval)

        collect = _SymCollect()
        run_scan(collect)
        tc = 0x00 if kind == "dc" else 0x10  # table class+id
        needs_table = not (kind == "dc" and ah != 0)  # DC refine: raw bits
        if needs_table and (collect.syms or kind == "ac"):
            bits, vals, codes = _flat_huff(collect.syms)
            out += seg(0xC4, bytes([tc]) + bytes(bits) + vals)
        else:
            codes = {}
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        emit = _SymEmit(codes, out)
        run_scan(emit)
        emit.finish()

    out += b"\xff\xd9"
    return bytes(out)


def _np_argsort_zz() -> np.ndarray:
    """Permutation taking a natural-order 64-vector into zigzag order."""
    return _ZZ


def _mean_pool2(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = h + (h & 1), w + (w & 1)
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
