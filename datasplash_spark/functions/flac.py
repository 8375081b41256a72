"""Zero-dependency FLAC codec (round 10).

Speech/audio training corpora (LibriSpeech-style) ship FLAC, not
WAV — this is the audio analog of the PDF/TIFF additions: a
correctness-first reference kernel for the one lossless audio codec
a zero-dependency engine can carry, with a fixture-writing encoder,
strict quarantine, and the same ``decode → typed rows`` posture as
:func:`..multimodal.decode_wav` (bytes never shuffle).

Scope:

- **Reader** (:func:`decode_flac`): native-FLAC streams —
  STREAMINFO + skipped metadata blocks, fixed-blocksize frames,
  subframe types CONSTANT / VERBATIM / FIXED (orders 0–4) / LPC
  (any order), rice residuals (both 4- and 5-bit parameter methods,
  escape-to-raw partitions, any partition order), wasted-bits
  shifts, all four stereo decorrelation modes (independent,
  left-side, right-side, mid-side), sample sizes 8/16/24, frame
  CRC-8 (header) and CRC-16 (frame) VERIFIED — a corrupt frame
  quarantines rather than emitting wrong samples. Returns raw
  int32 samples (lossless; ``bit_depth`` reports the source width).
- **Writer** (:func:`encode_flac`): STREAMINFO + fixed-blocksize
  frames, per-frame best-of fixed predictors (orders 0–2) with
  single-partition rice residuals, optional verbatim fallback and
  left-side/right-side/mid-side stereo modes — real files any
  external decoder plays, and the roundtrip fixture half.

Validation: lossless roundtrip property-fuzz across block sizes /
orders / channel modes / bit depths, plus hand-pinned rice and CRC
vectors (mirrored-bug guards).

Reference anchor: no analog in the reference (datasplash has no
audio surface); north-star multimodal extension (BASELINE.json).
"""

from __future__ import annotations


class _BitReader:
    __slots__ = ("d", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        d = self.d
        while n > 0:
            if self.pos >= len(d):
                raise ValueError("flac: truncated bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = d[self.pos]
            out = (out << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
            if n > 1 << 20:
                raise ValueError("flac: runaway unary code")
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
    header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the
    FLAC whole-frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_number_encode(n: int) -> bytes:
    """FLAC frame numbers use UTF-8-style coding (extended to 36
    bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 - nbytes + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | n
    return bytes([lead] + out[::-1])


def _utf8_number_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad UTF-8 frame number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


#: FIXED predictor coefficients by order (residual = convolution)
_FIXED = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError(f"flac: residual method {method} reserved")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("flac: partition order does not divide block")
    out: list[int] = []
    for p in range(nparts):
        n = block_size >> porder
        if p == 0:
            n -= order
        if n < 0:
            raise ValueError("flac: predictor order exceeds partition")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.unary()
                low = r.read(param) if param else 0
                z = (q << param) | low
                out.append((z >> 1) ^ -(z & 1))  # unzigzag
    return out


def _read_subframe(r: _BitReader, block_size: int, bits: int) -> list[int]:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):  # wasted bits: unary count - 1
        wasted = 1 + r.unary()
        bits -= wasted
    if ftype == 0:  # CONSTANT
        v = r.read_signed(bits)
        samples = [v] * block_size
    elif ftype == 1:  # VERBATIM
        samples = [r.read_signed(bits) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED order 0..4
        order = ftype - 8
        warm = [r.read_signed(bits) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        coefs = _FIXED[order]
        samples = list(warm)
        for res in resid:
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[-1 - j]
            samples.append(res + pred)
    elif ftype >= 32:  # LPC, order - 1 in low 5 bits
        order = (ftype & 0x1F) + 1
        warm = [r.read_signed(bits) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        samples = list(warm)
        for res in resid:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[-1 - j]
            samples.append(res + (acc >> shift))
    else:
        raise ValueError(f"flac: reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(raw: bytes) -> dict:
    """Decode a native-FLAC stream. Returns ``{"sample_rate",
    "n_channels", "bit_depth", "n_samples", "samples": int32
    ndarray (frames, channels)}`` — lossless (raw integers, no
    domain conversion). Raises ``ValueError`` naming the defect for
    malformed/reserved shapes and on any CRC mismatch."""
    import numpy as np

    if raw[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC magic")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(raw):
        hdr = raw[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = (int.from_bytes(raw[pos + 1 : pos + 4], "big"),)
        body = raw[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if btype == 0:
            if ln < 34:
                raise ValueError("flac: short STREAMINFO")
            streaminfo = body
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)  # min framesize
    si.read(24)  # max framesize
    sample_rate = si.read(20)
    n_channels = si.read(3) + 1
    bit_depth = si.read(5) + 1
    total = si.read(36)
    if bit_depth not in (8, 12, 16, 20, 24, 32):
        raise ValueError(f"flac: {bit_depth}-bit samples unsupported")

    chans: list[list[int]] = [[] for _ in range(n_channels)]
    r = _BitReader(raw, pos)
    while r.pos < len(raw):
        frame_start = r.pos
        sync = r.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        if r.read(1):
            raise ValueError("flac: reserved frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("flac: reserved frame bit set")
        _fnum = _utf8_number_decode(r)
        if bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            block_size = _BLOCKSIZE_CODES[bs_code]
        else:
            raise ValueError(f"flac: reserved block-size code {bs_code}")
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample-rate code")
        bits = (
            bit_depth if ss_code == 0 else _SAMPLE_SIZE_CODES.get(ss_code)
        )
        if bits is None:
            raise ValueError(f"flac: reserved sample-size code {ss_code}")
        r.align()
        # header CRC-8 covers sync through just before this byte
        if _crc8(raw[frame_start : r.pos]) != r.read(8):
            raise ValueError("flac: frame header CRC mismatch")

        if ch_code <= 7:
            if ch_code + 1 != n_channels:
                raise ValueError("flac: channel count mismatch")
            subs = [
                _read_subframe(r, block_size, bits)
                for _ in range(n_channels)
            ]
        elif ch_code in (8, 9, 10):
            if n_channels != 2:
                raise ValueError("flac: stereo decorrelation needs 2 ch")
            if ch_code == 8:  # left-side: side gets +1 bit
                left = _read_subframe(r, block_size, bits)
                side = _read_subframe(r, block_size, bits + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right-side: side first, +1 bit
                side = _read_subframe(r, block_size, bits + 1)
                right = _read_subframe(r, block_size, bits)
                subs = [[rr + s for rr, s in zip(right, side)], right]
            else:  # mid-side
                mid = _read_subframe(r, block_size, bits)
                side = _read_subframe(r, block_size, bits + 1)
                lr = []
                rr = []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    lr.append((m + s) >> 1)
                    rr.append((m - s) >> 1)
                subs = [lr, rr]
        else:
            raise ValueError(f"flac: reserved channel code {ch_code}")
        r.align()
        crc_calc = _crc16(raw[frame_start : r.pos])
        if crc_calc != r.read(16):
            raise ValueError("flac: frame CRC mismatch")
        for c in range(n_channels):
            chans[c].extend(subs[c])
        if total and len(chans[0]) >= total:
            break

    n = len(chans[0])
    if total:
        n = min(n, total)
    samples = np.zeros((n, n_channels), dtype=np.int32)
    for c in range(n_channels):
        samples[:, c] = np.asarray(chans[c][:n], dtype=np.int64).astype(
            np.int32
        )
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bit_depth": bit_depth,
        "n_samples": n,
        "samples": samples,
    }


def _write_residual(w: _BitWriter, resid: list[int], order: int) -> None:
    """Single-partition rice residual (method 0, partition order 0);
    parameter estimated from the mean magnitude, escape-to-raw when
    zigzag values would need > 30-bit quotients."""
    zig = [(v << 1) ^ (v >> 63) if v < 0 else v << 1 for v in resid]
    zig = [((v << 1) ^ -1) if False else z for v, z in zip(resid, zig)]
    zig = [(-v * 2 - 1) if v < 0 else v * 2 for v in resid]
    mean = (sum(zig) // max(len(zig), 1)) if zig else 0
    param = 0
    while (1 << (param + 1)) < mean + 1 and param < 14:
        param += 1
    # escape if the worst quotient would blow up the unary run
    worst_q = max((z >> param for z in zig), default=0)
    w.write(0, 2)  # method 0: 4-bit params
    w.write(0, 4)  # partition order 0
    if worst_q > 1 << 16:
        maxbits = max((z.bit_length() for z in zig), default=0) + 1
        maxbits = min(max(maxbits, 1), 31)
        w.write(0xF, 4)  # escape
        w.write(maxbits, 5)
        for v in resid:
            w.write(v & ((1 << maxbits) - 1), maxbits)
        return
    w.write(param, 4)
    for z in zig:
        q = z >> param
        w.write(1, q + 1)  # q zeros then a 1
        if param:
            w.write(z & ((1 << param) - 1), param)


def _write_subframe(
    w: _BitWriter, samples: list[int], bits: int, strategy: str
) -> None:
    n = len(samples)
    if strategy != "verbatim" and all(s == samples[0] for s in samples):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(samples[0] & ((1 << bits) - 1), bits)
        return
    if strategy == "verbatim" or n < 3:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for s in samples:
            w.write(s & ((1 << bits) - 1), bits)
        return
    # best fixed order 0..2 by residual magnitude sum
    best_order, best_resid, best_cost = 0, samples, None
    for order in range(0, 3):
        coefs = _FIXED[order]
        resid = []
        ok = True
        for i in range(order, n):
            pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            res = samples[i] - pred
            if abs(res) > 1 << 30:
                ok = False
                break
            resid.append(res)
        if not ok:
            continue
        cost = sum(abs(v) for v in resid)
        if best_cost is None or cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
    order, resid = best_order, best_resid
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)
    for s in samples[:order]:
        w.write(s & ((1 << bits) - 1), bits)
    _write_residual(w, resid, order)


def encode_flac(
    samples,
    sample_rate: int = 16000,
    bits: int = 16,
    block_size: int = 4096,
    channel_mode: str = "independent",
    strategy: str = "fixed",
) -> bytes:
    """FLAC writer (fixture half): int ``(frames,)`` or ``(frames,
    channels)`` arrays at 8/16/24 bits, fixed-blocksize frames,
    best-of FIXED orders 0–2 with single-partition rice (or
    ``strategy="verbatim"``), ``channel_mode`` in {"independent",
    "left-side", "right-side", "mid-side"} for 2-channel input."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    nframes, nch = arr.shape
    if bits not in (8, 16, 24):
        raise ValueError("flac encode: bits must be 8, 16, or 24")
    lim = 1 << (bits - 1)
    if arr.max(initial=0) >= lim or arr.min(initial=0) < -lim:
        raise ValueError("flac encode: samples exceed bit depth")
    if channel_mode != "independent" and nch != 2:
        raise ValueError("flac encode: stereo mode needs 2 channels")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bits - 1, 5)
    si.write(nframes, 36)
    body = si_bytes = None
    si.align()
    si_bytes = si.bytes() + bytes(16)  # md5 unset (spec-legal zeros)
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    ss_code = {8: 1, 16: 4, 24: 6}[bits]
    ch_code = {
        "independent": nch - 1,
        "left-side": 8,
        "right-side": 9,
        "mid-side": 10,
    }[channel_mode]

    fnum = 0
    for start in range(0, max(nframes, 1), block_size):
        blk = arr[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize stream
        w.write(7, 4)  # 16-bit blocksize-1 follows
        w.write(0, 4)  # sample rate from STREAMINFO
        w.write(ch_code, 4)
        w.write(ss_code, 3)
        w.write(0, 1)
        for b in _utf8_number_encode(fnum):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        hdr += bytes([_crc8(hdr)])
        w2 = _BitWriter()
        if ch_code <= 7:
            for c in range(nch):
                _write_subframe(
                    w2, [int(v) for v in blk[:, c]], bits, strategy
                )
        else:
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            side = [l - r2 for l, r2 in zip(left, right)]
            if ch_code == 8:
                _write_subframe(w2, left, bits, strategy)
                _write_subframe(w2, side, bits + 1, strategy)
            elif ch_code == 9:
                _write_subframe(w2, side, bits + 1, strategy)
                _write_subframe(w2, right, bits, strategy)
            else:
                mid = [(l + r2) >> 1 for l, r2 in zip(left, right)]
                _write_subframe(w2, mid, bits, strategy)
                _write_subframe(w2, side, bits + 1, strategy)
        w2.align()
        frame = hdr + w2.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        fnum += 1
    return bytes(out)
