"""PDF standard security handler (round 10): pure-stdlib RC4 +
AES-128/256 kernels and the ISO 32000-1 §7.6 key-derivation /
verification algorithms, so ENCRYPTED PDFs with an EMPTY USER
PASSWORD — the overwhelmingly common "owner-locked" case (printing /
copying restrictions, no open password) — extract like any other
document instead of quarantining. Only genuinely password-protected
files (and non-Standard security handlers) still raise the typed
``pdf: encrypted`` quarantine.

Coverage (all with empty user OR empty owner password):

- **R2** (PDF 1.1, RC4 40-bit) and **R3/R4 V2** (RC4 40–128-bit),
  ISO 32000-1 Algorithms 2/3/4/5/7.
- **R4 /AESV2** (PDF 1.6, AES-128-CBC crypt filters, per-object key
  salted with ``sAlT``).
- **R6 /AESV3** (PDF 2.0 / Acrobat X, AES-256-CBC, the hardened
  Algorithm 2.B SHA-256/384/512 + AES-CBC iterated KDF).

Kernels are pure Python over stdlib ``hashlib``: RC4 is the 20-line
KSA/PRGA; AES generates its S-box and GF(2⁸) log tables at import
(no hand-typed tables to mistype) and is validated in tests against
the FIPS-197 appendix vectors. Throughput is irrelevant here —
encrypted streams are document-sized (KBs) and decryption happens
once per stream inside the same Arrow batch that decodes the page,
never in a shuffle.

Writer half: :func:`make_encryption` produces the ``/Encrypt``
dictionary plus a stream-encryption callback for
``encode_pdf_text(encrypt=...)`` fixtures, with salts/IVs derived
deterministically from the document ID (fixtures are reproducible;
determinism of an IV is a non-issue for test fixtures).

Reference anchor: no analog in datasplash (no document surface);
north-star multimodal/text extension (BASELINE.json). Algorithms:
ISO 32000-1:2008 §7.6.3 (Algorithms 2-7), ISO 32000-2 §7.6.4.3.4
(Algorithm 2.B), FIPS-197 (AES).
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache

# Optional acceleration (r13 optimization, guide §1.2 step 2): the
# ``cryptography`` wheel, when importable, provides the identical
# RC4/AES-CBC primitives as compiled code — profiling the pdf_extract
# kernels showed ~35% of per-document Python time inside these
# pure-Python loops (RC4 KSA + AES rounds). Output is byte-identical
# (both implement the same ciphers; the test suite runs the FIPS/ISO
# vectors against BOTH paths), the stdlib implementation below
# remains the always-available fallback, and nothing outside this
# module changes — the zero-dependency contract holds: absence of
# the wheel only costs speed.
try:  # pragma: no cover - environment-dependent
    from cryptography.hazmat.primitives.ciphers import Cipher as _Cipher
    from cryptography.hazmat.primitives.ciphers.algorithms import (
        AES as _AES,
    )
    from cryptography.hazmat.primitives.ciphers.modes import CBC as _CBC

    try:  # 43+ moved ARC4 under decrepit
        from cryptography.hazmat.decrepit.ciphers.algorithms import (
            ARC4 as _ARC4,
        )
    except ImportError:
        from cryptography.hazmat.primitives.ciphers.algorithms import (
            ARC4 as _ARC4,
        )
except ImportError:  # pragma: no cover - environment-dependent
    _Cipher = None

#: RC4 key lengths the accelerated backend accepts (bits/8); PDF
#: object keys are 10 or 16 bytes, auth-chain keys 5 or 16 — all in
#: range, but guard anyway and fall back for exotic /Length values.
_RC4_FAST_LENS = frozenset((5, 7, 8, 10, 16, 20, 24, 32))

#: AES key lengths (bytes) — the only sizes FIPS-197 defines; PDF
#: uses 16 (AESV2) and 32 (AESV3), plus 16 in the R6 KDF rounds.
_AES_FAST_LENS = frozenset((16, 24, 32))

# ---------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    if _Cipher is not None and len(key) in _RC4_FAST_LENS:
        enc = _Cipher(_ARC4(key), None).encryptor()
        return enc.update(data) + enc.finalize()
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------
# AES (FIPS-197) — tables generated, not transcribed
# ---------------------------------------------------------------------


def _aes_tables():
    # GF(2^8) exp/log with generator 3 (x+1), reduction poly 0x11B
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= ((x << 1) ^ (0x11B if x & 0x80 else 0)) & 0x1FF
        x &= 0xFF
    sbox = [0] * 256
    for i in range(256):
        # exp index is mod 255 (exp[255] wraps to exp[0] = 1 — the
        # inverse of 1 is 1)
        inv = 0 if i == 0 else exp[(255 - log[i]) % 255]
        b, s = inv, inv
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        sbox[i] = s ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return exp, log, sbox, inv_sbox


_EXP, _LOG, _SBOX, _INV_SBOX = _aes_tables()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[(_LOG[a] + _LOG[b]) % 255]


def _t_tables():
    """T-tables (SubBytes+MixColumns fused into 32-bit lookups, the
    standard software-AES shape — one table per state row, each a
    byte rotation of the previous): ``Te`` for the cipher, ``Td``
    for the equivalent inverse cipher. Generated from the S-box, not
    transcribed."""
    te0, td0 = [0] * 256, [0] * 256
    for x in range(256):
        s = _SBOX[x]
        te0[x] = (
            (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
        )
        si = _INV_SBOX[x]
        td0[x] = (
            (_gmul(si, 14) << 24)
            | (_gmul(si, 9) << 16)
            | (_gmul(si, 13) << 8)
            | _gmul(si, 11)
        )

    def ror8(t):
        return [((w >> 8) | (w << 24)) & 0xFFFFFFFF for w in t]

    te1 = ror8(te0)
    te2 = ror8(te1)
    te3 = ror8(te2)
    td1 = ror8(td0)
    td2 = ror8(td1)
    td3 = ror8(td2)
    return (te0, te1, te2, te3), (td0, td1, td2, td3)


(_TE0, _TE1, _TE2, _TE3), (_TD0, _TD1, _TD2, _TD3) = _t_tables()


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as a flat list of 4-byte words."""
    nk = len(key) // 4
    nr = {4: 10, 8: 14}[nk]
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = ((rcon << 1) ^ (0x11B if rcon & 0x80 else 0)) & 0xFF
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return words


def _inv_mix_word(w: int) -> int:
    a = [(w >> 24) & 0xFF, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF]
    return (
        (_gmul(a[0], 14) ^ _gmul(a[1], 11) ^ _gmul(a[2], 13) ^ _gmul(a[3], 9))
        << 24
        | (_gmul(a[0], 9) ^ _gmul(a[1], 14) ^ _gmul(a[2], 11) ^ _gmul(a[3], 13))
        << 16
        | (_gmul(a[0], 13) ^ _gmul(a[1], 9) ^ _gmul(a[2], 14) ^ _gmul(a[3], 11))
        << 8
        | (_gmul(a[0], 11) ^ _gmul(a[1], 13) ^ _gmul(a[2], 9) ^ _gmul(a[3], 14))
    )


@lru_cache(maxsize=128)
def _schedules(key: bytes) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(encryption, equivalent-inverse-cipher) round-key words as
    32-bit ints; cached per key — CBC loops and repeated per-object
    calls reuse the expansion."""
    words = _expand_key(key)
    enc = tuple(int.from_bytes(bytes(w), "big") for w in words)
    nr = len(enc) // 4 - 1
    dec: list[int] = []
    for rnd in range(nr, -1, -1):
        for c in range(4):
            w = enc[4 * rnd + c]
            if 0 < rnd < nr:
                w = _inv_mix_word(w)
            dec.append(w)
    return enc, tuple(dec)


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    rk, _ = _schedules(key)
    nr = len(rk) // 4 - 1
    s0, s1, s2, s3 = struct.unpack(">IIII", block)
    s0 ^= rk[0]; s1 ^= rk[1]; s2 ^= rk[2]; s3 ^= rk[3]  # noqa: E702
    te0, te1, te2, te3 = _TE0, _TE1, _TE2, _TE3
    for rnd in range(1, nr):
        k = 4 * rnd
        t0 = (te0[s0 >> 24] ^ te1[(s1 >> 16) & 0xFF]
              ^ te2[(s2 >> 8) & 0xFF] ^ te3[s3 & 0xFF] ^ rk[k])
        t1 = (te0[s1 >> 24] ^ te1[(s2 >> 16) & 0xFF]
              ^ te2[(s3 >> 8) & 0xFF] ^ te3[s0 & 0xFF] ^ rk[k + 1])
        t2 = (te0[s2 >> 24] ^ te1[(s3 >> 16) & 0xFF]
              ^ te2[(s0 >> 8) & 0xFF] ^ te3[s1 & 0xFF] ^ rk[k + 2])
        t3 = (te0[s3 >> 24] ^ te1[(s0 >> 16) & 0xFF]
              ^ te2[(s1 >> 8) & 0xFF] ^ te3[s2 & 0xFF] ^ rk[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    sb = _SBOX
    k = 4 * nr
    out = []
    for i, (a, b, c, d) in enumerate(
        ((s0, s1, s2, s3), (s1, s2, s3, s0), (s2, s3, s0, s1), (s3, s0, s1, s2))
    ):
        out.append(
            ((sb[a >> 24] << 24) | (sb[(b >> 16) & 0xFF] << 16)
             | (sb[(c >> 8) & 0xFF] << 8) | sb[d & 0xFF]) ^ rk[k + i]
        )
    return struct.pack(">IIII", *out)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    _, rk = _schedules(key)
    nr = len(rk) // 4 - 1
    s0, s1, s2, s3 = struct.unpack(">IIII", block)
    s0 ^= rk[0]; s1 ^= rk[1]; s2 ^= rk[2]; s3 ^= rk[3]  # noqa: E702
    td0, td1, td2, td3 = _TD0, _TD1, _TD2, _TD3
    for rnd in range(1, nr):
        k = 4 * rnd
        t0 = (td0[s0 >> 24] ^ td1[(s3 >> 16) & 0xFF]
              ^ td2[(s2 >> 8) & 0xFF] ^ td3[s1 & 0xFF] ^ rk[k])
        t1 = (td0[s1 >> 24] ^ td1[(s0 >> 16) & 0xFF]
              ^ td2[(s3 >> 8) & 0xFF] ^ td3[s2 & 0xFF] ^ rk[k + 1])
        t2 = (td0[s2 >> 24] ^ td1[(s1 >> 16) & 0xFF]
              ^ td2[(s0 >> 8) & 0xFF] ^ td3[s3 & 0xFF] ^ rk[k + 2])
        t3 = (td0[s3 >> 24] ^ td1[(s2 >> 16) & 0xFF]
              ^ td2[(s1 >> 8) & 0xFF] ^ td3[s0 & 0xFF] ^ rk[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    isb = _INV_SBOX
    k = 4 * nr
    out = []
    for i, (a, b, c, d) in enumerate(
        ((s0, s3, s2, s1), (s1, s0, s3, s2), (s2, s1, s0, s3), (s3, s2, s1, s0))
    ):
        out.append(
            ((isb[a >> 24] << 24) | (isb[(b >> 16) & 0xFF] << 16)
             | (isb[(c >> 8) & 0xFF] << 8) | isb[d & 0xFF]) ^ rk[k + i]
        )
    return struct.pack(">IIII", *out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, NO padding — ``len(data)`` must be a block multiple."""
    if len(data) % 16:
        raise ValueError("aes-cbc: data not block-aligned")
    if _Cipher is not None and len(key) in _AES_FAST_LENS and len(iv) == 16:
        enc = _Cipher(_AES(key), _CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = aes_encrypt_block(key, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, NO padding removal — ciphertext must be block-aligned."""
    if len(data) % 16:
        raise ValueError("aes-cbc: ciphertext not block-aligned")
    if _Cipher is not None and len(key) in _AES_FAST_LENS and len(iv) == 16:
        dec = _Cipher(_AES(key), _CBC(iv)).decryptor()
        return dec.update(data) + dec.finalize()
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        ct = data[i : i + 16]
        pt = aes_decrypt_block(key, ct)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = ct
    return bytes(out)


# ---------------------------------------------------------------------
# Standard security handler — ISO 32000 §7.6.3 / §7.6.4
# ---------------------------------------------------------------------

#: the 32-byte password pad of Algorithm 2 (ISO 32000-1 Table 21 ff.)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def _key_algo2(
    pw: bytes, o: bytes, p: int, id0: bytes, r: int, keylen: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: file encryption key from the (padded) user
    password, for R ≤ 4."""
    h = hashlib.md5(_pad_password(pw))
    h.update(o[:32])
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()[:keylen]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()[:keylen]
    return key


def _owner_key_algo3(owner_pw: bytes, r: int, keylen: int) -> bytes:
    """Algorithm 3 steps a-d: the RC4 key that encrypts /O."""
    h = hashlib.md5(_pad_password(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    return h[:keylen]


def _rc4_chain(key: bytes, data: bytes, reverse: bool = False) -> bytes:
    """The 20-step XOR-keyed RC4 chain of Algorithms 3/5/7
    (``i = 0..19``, key bytes XORed with ``i``); ``reverse`` runs
    ``19..0`` — the decryption direction of Algorithm 7."""
    steps = range(19, -1, -1) if reverse else range(20)
    for i in steps:
        data = rc4(bytes(b ^ i for b in key), data)
    return data


def _make_o_entry(owner_pw: bytes, user_pw: bytes, r: int, keylen: int) -> bytes:
    """Algorithm 3: the /O value."""
    k = _owner_key_algo3(owner_pw or user_pw, r, keylen)
    data = _pad_password(user_pw)
    if r == 2:
        return rc4(k, data)
    return _rc4_chain(k, data)


def _make_u_entry(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R2) / 5 (R ≥ 3): the /U value."""
    if r == 2:
        return rc4(key, PAD)
    x = hashlib.md5(PAD + id0).digest()
    x = _rc4_chain(key, x)
    return x + x  # 16 meaningful bytes + 16 arbitrary (spec-allowed)


def _check_user_password(
    pw: bytes, u: bytes, o: bytes, p: int, id0: bytes, r: int, keylen: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 6: returns the file key when ``pw`` is the user
    password, else None."""
    key = _key_algo2(pw, o, p, id0, r, keylen, encrypt_metadata)
    expect = _make_u_entry(key, id0, r)
    n = 32 if r == 2 else 16
    return key if expect[:n] == u[:n] else None


def _check_owner_password(
    pw: bytes, u: bytes, o: bytes, p: int, id0: bytes, r: int, keylen: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 7: decrypt /O with the owner key to recover the
    user password, then validate it via Algorithm 6."""
    k = _owner_key_algo3(pw, r, keylen)
    if r == 2:
        user_padded = rc4(k, o)
    else:
        user_padded = _rc4_chain(k, o, reverse=True)
    return _check_user_password(
        user_padded, u, o, p, id0, r, keylen, encrypt_metadata
    )


@lru_cache(maxsize=4096)
def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (ISO 32000-2): the hardened R6 KDF —
    SHA-256/384/512 selected per round by an AES-128-CBC encryption
    of the running state. ``lru_cache``d: the KDF is deliberately
    expensive (anti-brute-force), and a corpus re-validating the
    same (password, salt) pair — or re-opening the same file —
    should pay it once per executor, not once per call."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class PdfStandardSecurity:
    """A verified standard-security-handler session: holds the file
    key and the stream crypt method, decrypts per-object stream
    bytes. Construct via :func:`open_standard_security`."""

    def __init__(self, key: bytes, method: str, r: int) -> None:
        self.key = key
        self.method = method  # 'rc4' | 'aesv2' | 'aesv3' | 'identity'
        self.r = r

    def _object_key(self, num: int, gen: int) -> bytes:
        if self.method == "aesv3":
            return self.key  # R5/R6: file key used directly
        h = hashlib.md5(
            self.key
            + struct.pack("<I", num)[:3]
            + struct.pack("<I", gen)[:2]
        )
        if self.method == "aesv2":
            h.update(b"sAlT")
        return h.digest()[: min(len(self.key) + 5, 16)]

    def decrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        if self.method == "identity":
            return data
        if not data:
            # some producers emit zero-length stream objects and
            # leave them unencrypted; quarantining the whole document
            # over them is wrong (review finding)
            return b""
        k = self._object_key(num, gen)
        if self.method == "rc4":
            return rc4(k, data)
        # AES-CBC: 16-byte IV prefix + PKCS#5 padding. Corruption
        # messages must NOT contain the word 'encrypted' — the typed
        # quarantine in pdf_text_features keys on it, and a
        # bit-flipped stream is 'malformed', not password-protected.
        if len(data) < 32 or len(data) % 16:
            raise ValueError("pdf: AES stream not block-aligned")
        pt = aes_cbc_decrypt(k, data[:16], data[16:])
        padlen = pt[-1]
        if not 1 <= padlen <= 16:
            raise ValueError("pdf: bad AES padding")
        return pt[:-padlen]

    def encrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        """Fixture half (writer): inverse of :meth:`decrypt_stream`.
        IV derived from (key, num, gen, data) — deterministic
        fixtures."""
        if self.method == "identity":
            return data
        k = self._object_key(num, gen)
        if self.method == "rc4":
            return rc4(k, data)
        iv = hashlib.md5(
            self.key + struct.pack("<II", num, gen) + data[:64]
        ).digest()
        padlen = 16 - len(data) % 16
        return iv + aes_cbc_encrypt(k, iv, data + bytes([padlen]) * padlen)


def open_standard_security(
    enc: dict, id0: bytes, password: bytes = b""
) -> PdfStandardSecurity:
    """Verify ``password`` (default empty — the owner-locked case)
    against a PLAIN-VALUE /Encrypt dictionary (``Filter``/``CFM`` as
    str, ``O``/``U``/``OE``/``UE`` as bytes, numbers as int) and
    return the decryption session. Raises ``ValueError`` with the
    typed ``pdf: encrypted`` prefix for non-Standard handlers,
    unsupported revisions, or a wrong password — the quarantine
    contract of :mod:`.pdf`."""
    if enc.get("Filter") != "Standard":
        raise ValueError(
            f"pdf: encrypted (security handler {enc.get('Filter')!r} "
            "unsupported)"
        )
    v = int(enc.get("V", 0))
    r = int(enc.get("R", 2))
    o = enc.get("O", b"")
    u = enc.get("U", b"")
    p = int(enc.get("P", -1))
    encrypt_metadata = bool(enc.get("EncryptMetadata", True))

    # stream crypt method (V4/V5 name a crypt filter; V1/V2 are RC4)
    method = "rc4"
    if v in (4, 5):
        stmf = enc.get("StmF", "Identity")
        if stmf == "Identity":
            method = "identity"
        else:
            cfm = enc.get("CF", {}).get(stmf, {}).get("CFM", "")
            method = {"V2": "rc4", "AESV2": "aesv2", "AESV3": "aesv3"}.get(
                cfm, ""
            )
            if not method:
                raise ValueError(
                    f"pdf: encrypted (crypt filter method {cfm!r} "
                    "unsupported)"
                )

    if r in (2, 3, 4):
        keylen = 5 if v == 1 else int(enc.get("Length", 40)) // 8
        if v in (4, 5):
            cf_len = enc.get("CF", {}).get(enc.get("StmF", ""), {}).get(
                "Length"
            )
            if cf_len:
                # /CF Length is documented in bytes but written in
                # bits by some producers — normalize. 40 is valid as
                # BITS (5 bytes) but impossible as bytes (max 32),
                # so >= 40 means bits.
                keylen = (
                    int(cf_len) // 8 if int(cf_len) >= 40 else int(cf_len)
                )
        if method == "aesv2":
            keylen = 16
        key = _check_user_password(
            password, u, o, p, id0, r, keylen, encrypt_metadata
        ) or _check_owner_password(
            password, u, o, p, id0, r, keylen, encrypt_metadata
        )
        if key is None:
            raise ValueError("pdf: encrypted (password required)")
        return PdfStandardSecurity(key, method, r)

    if r == 6 or r == 5:
        if len(u) < 48 or len(o) < 48:
            raise ValueError("pdf: encrypted (malformed R6 U/O)")
        kdf = hash_r6 if r == 6 else (
            lambda pw, salt, ud=b"": hashlib.sha256(pw + salt + ud).digest()
        )
        if kdf(password, u[32:40]) == u[:32]:  # user password
            ikey = kdf(password, u[40:48])
            key = aes_cbc_decrypt(ikey, b"\0" * 16, enc.get("UE", b"")[:32])
        elif kdf(password, o[32:40], u[:48]) == o[:32]:  # owner password
            ikey = kdf(password, o[40:48], u[:48])
            key = aes_cbc_decrypt(ikey, b"\0" * 16, enc.get("OE", b"")[:32])
        else:
            raise ValueError("pdf: encrypted (password required)")
        # R5/R6 streams are AES-256 unless an explicit V4/V5 crypt
        # filter said otherwise (a missing /V must not leave the
        # V1/V2 default 'rc4' silently RC4-ing AES ciphertext)
        return PdfStandardSecurity(
            key, method if v in (4, 5) else "aesv3", r
        )

    raise ValueError(f"pdf: encrypted (revision {r} unsupported)")


# ---------------------------------------------------------------------
# Writer half: build /Encrypt dicts + an encrypting session
# ---------------------------------------------------------------------


def _pdf_hex_str(b: bytes) -> bytes:
    return b"<" + b.hex().encode() + b">"


def make_encryption(
    kind: str, id0: bytes, p: int = -3904
) -> tuple[bytes, PdfStandardSecurity]:
    """Build the ``/Encrypt`` dictionary BYTES and an encrypting
    session for fixture writing, empty user+owner password.
    ``kind``: ``rc4-40`` (R2 V1), ``rc4`` (R3 V2 128-bit), ``aes``
    (R4 V4 /AESV2), ``aes256`` (R6 V5 /AESV3). Salts and the R6
    file key derive deterministically from ``id0``."""
    if kind == "rc4-40" or kind == "rc4":
        r, v, keylen = (2, 1, 5) if kind == "rc4-40" else (3, 2, 16)
        o = _make_o_entry(b"", b"", r, keylen)
        key = _key_algo2(b"", o, p, id0, r, keylen)
        u = _make_u_entry(key, id0, r)
        d = b"<< /Filter /Standard /V %d /R %d /Length %d /P %d /O %s /U %s >>" % (
            v, r, keylen * 8, p, _pdf_hex_str(o), _pdf_hex_str(u[:32]),
        )
        return d, PdfStandardSecurity(key, "rc4", r)
    if kind == "aes":
        r, keylen = 4, 16
        o = _make_o_entry(b"", b"", r, keylen)
        key = _key_algo2(b"", o, p, id0, r, keylen)
        u = _make_u_entry(key, id0, r)
        d = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d /O %s /U %s "
            b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            b"/StmF /StdCF /StrF /StdCF >>"
            % (p, _pdf_hex_str(o), _pdf_hex_str(u[:32]))
        )
        return d, PdfStandardSecurity(key, "aesv2", r)
    if kind == "aes256":
        r = 6
        # FILE KEY is per-document (id0); the SALTS are fixed
        # constants so every fixture shares one U/O derivation and
        # the deliberately-expensive hash_r6 KDF amortizes across a
        # synthesized corpus via its cache (salt diversity buys a
        # fixture nothing — the per-file secret is the file key).
        key = hashlib.sha256(b"filekey" + id0).digest()
        uvs = hashlib.md5(b"uvs-fixed-salt").digest()[:8]
        uks = hashlib.md5(b"uks-fixed-salt").digest()[:8]
        u = hash_r6(b"", uvs) + uvs + uks
        ue = aes_cbc_encrypt(hash_r6(b"", uks), b"\0" * 16, key)
        ovs = hashlib.md5(b"ovs-fixed-salt").digest()[:8]
        oks = hashlib.md5(b"oks-fixed-salt").digest()[:8]
        o = hash_r6(b"", ovs, u) + ovs + oks
        oe = aes_cbc_encrypt(hash_r6(b"", oks, u), b"\0" * 16, key)
        perms_pt = (
            struct.pack("<I", p & 0xFFFFFFFF)
            + b"\xff\xff\xff\xff"
            + b"T"
            + b"adb"
            + hashlib.md5(b"rnd" + id0).digest()[:4]
        )
        perms = aes_encrypt_block(key, perms_pt)
        d = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d "
            b"/O %s /U %s /OE %s /UE %s /Perms %s "
            b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF >>"
            % (
                p,
                _pdf_hex_str(o), _pdf_hex_str(u),
                _pdf_hex_str(oe), _pdf_hex_str(ue),
                _pdf_hex_str(perms),
            )
        )
        return d, PdfStandardSecurity(key, "aesv3", r)
    raise ValueError(f"pdf: unknown encryption kind {kind!r}")
