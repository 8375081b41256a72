"""PDF standard-security-handler tests (round 10): AES/RC4 kernels
against published vectors, key-derivation/verification per ISO
32000-1 §7.6.3 + ISO 32000-2 Algorithm 2.B, and encrypted
writer→reader roundtrips across every layout × filter × cipher.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datasplash_spark.functions import pdfcrypt as pc
from datasplash_spark.functions import pdf as P


# ---------------------------------------------------------------------
# kernels vs published vectors
# ---------------------------------------------------------------------


def test_aes_fips197_vectors():
    # FIPS-197 Appendix C.1 (AES-128) and C.3 (AES-256)
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    c128 = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert pc.aes_encrypt_block(k128, pt) == c128
    assert pc.aes_decrypt_block(k128, c128) == pt
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f"
    )
    c256 = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert pc.aes_encrypt_block(k256, pt) == c256
    assert pc.aes_decrypt_block(k256, c256) == pt
    # NIST SP 800-38A F.2.5: AES-256-CBC, first two blocks
    key = bytes.fromhex(
        "603deb1015ca71be2b73aef0857d7781"
        "1f352c073b6108d72d9810a30914dff4"
    )
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    blocks = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
    )
    ct = bytes.fromhex(
        "f58c4c04d6e5f1ba779eabfb5f7bfbd6"
        "9cfc4e967edb808d679f777bc6702c7d"
    )
    assert pc.aes_cbc_encrypt(key, iv, blocks) == ct
    assert pc.aes_cbc_decrypt(key, iv, ct) == blocks


def test_aes_sbox_generated_correctly():
    # spot values from the FIPS-197 S-box table, incl. the x=1 cell
    # (inverse of 1 is 1 — the exp-table wraparound regression)
    assert pc._SBOX[0x00] == 0x63
    assert pc._SBOX[0x01] == 0x7C
    assert pc._SBOX[0x53] == 0xED
    assert pc._SBOX[0xFF] == 0x16
    assert all(pc._INV_SBOX[pc._SBOX[i]] == i for i in range(256))


def test_rc4_published_vectors():
    assert pc.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert pc.rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert (
        pc.rc4(b"Secret", b"Attack at dawn").hex().upper()
        == "45A01F645FC35B383552544B9BF5"
    )
    # symmetric
    assert pc.rc4(b"Key", pc.rc4(b"Key", b"roundtrip")) == b"roundtrip"


def test_fast_and_pure_paths_agree(monkeypatch):
    """The r13 optional ``cryptography`` acceleration must be
    byte-identical to the stdlib fallback: run vectors + roundtrips
    through the pure path (acceleration disabled) and compare with
    whatever path is live (fast when the wheel is importable)."""
    key16 = bytes(range(16))
    key32 = bytes(range(32))
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    data = bytes(range(256)) * 3  # 48 blocks
    live = {
        "rc4_5": pc.rc4(b"12345", data),
        "rc4_16": pc.rc4(key16, data),
        "cbc_e16": pc.aes_cbc_encrypt(key16, iv, data),
        "cbc_e32": pc.aes_cbc_encrypt(key32, iv, data),
    }
    live["cbc_d16"] = pc.aes_cbc_decrypt(key16, iv, live["cbc_e16"])
    live["cbc_d32"] = pc.aes_cbc_decrypt(key32, iv, live["cbc_e32"])
    monkeypatch.setattr(pc, "_Cipher", None)  # force the pure path
    assert pc.rc4(b"12345", data) == live["rc4_5"]
    assert pc.rc4(key16, data) == live["rc4_16"]
    assert pc.aes_cbc_encrypt(key16, iv, data) == live["cbc_e16"]
    assert pc.aes_cbc_encrypt(key32, iv, data) == live["cbc_e32"]
    assert pc.aes_cbc_decrypt(key16, iv, live["cbc_e16"]) == data
    assert pc.aes_cbc_decrypt(key32, iv, live["cbc_e32"]) == data
    assert live["cbc_d16"] == data and live["cbc_d32"] == data
    # published vectors through the pure path too (the live-path run
    # of these is the preceding tests when the wheel is importable)
    assert pc.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    k256 = bytes.fromhex(
        "603deb1015ca71be2b73aef0857d7781"
        "1f352c073b6108d72d9810a30914dff4"
    )
    blocks = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
    )
    ct = bytes.fromhex(
        "f58c4c04d6e5f1ba779eabfb5f7bfbd6"
        "9cfc4e967edb808d679f777bc6702c7d"
    )
    assert pc.aes_cbc_encrypt(k256, iv, blocks) == ct


def test_aes_cbc_alignment_errors():
    with pytest.raises(ValueError, match="block-aligned"):
        pc.aes_cbc_encrypt(bytes(16), bytes(16), b"short")
    with pytest.raises(ValueError, match="block-aligned"):
        pc.aes_cbc_decrypt(bytes(16), bytes(16), b"0123456789")


# ---------------------------------------------------------------------
# handler: verification + password paths
# ---------------------------------------------------------------------


def _r3_entries(user_pw: bytes, owner_pw: bytes, id0: bytes):
    o = pc._make_o_entry(owner_pw, user_pw, 3, 16)
    key = pc._key_algo2(user_pw, o, -3904, id0, 3, 16)
    u = pc._make_u_entry(key, id0, 3)
    return {
        "Filter": "Standard", "V": 2, "R": 3, "Length": 128,
        "P": -3904, "O": o, "U": u[:32],
    }, key


def test_password_required_raises():
    id0 = b"\x02" * 16
    enc, _ = _r3_entries(b"secret", b"", id0)
    with pytest.raises(ValueError, match="password required"):
        pc.open_standard_security(enc, id0)
    # correct user password opens
    h = pc.open_standard_security(enc, id0, password=b"secret")
    assert h.method == "rc4" and len(h.key) == 16


def test_owner_locked_and_algorithm7():
    # owner password set, user password EMPTY: opens with no
    # password (the owner-locked case) AND with the owner password
    # (Algorithm 7 recovers the user password from /O)
    id0 = b"\x03" * 16
    enc, key = _r3_entries(b"", b"own", id0)
    h_empty = pc.open_standard_security(enc, id0)
    h_owner = pc.open_standard_security(enc, id0, password=b"own")
    assert h_empty.key == h_owner.key == key


def test_r6_validation_and_tamper():
    d, sess = pc.make_encryption("aes256", b"\x07" * 16)
    # parse our own dict bytes through the PDF lexer → plain values
    lex = P._Lexer(d)
    tok = lex.token()
    assert tok[0] == "dict"
    plain = P._plain({}, tok)
    h = pc.open_standard_security(plain, b"\x07" * 16)
    assert h.key == sess.key and h.method == "aesv3"
    # tampered U (validation hash byte flipped) → password required
    bad = dict(plain)
    bad["U"] = bytes([plain["U"][0] ^ 1]) + plain["U"][1:]
    with pytest.raises(ValueError, match="password required"):
        pc.open_standard_security(bad, b"\x07" * 16)


def test_unsupported_handlers_quarantine_typed():
    with pytest.raises(ValueError, match="security handler"):
        pc.open_standard_security({"Filter": "Adobe.PubSec"}, b"")
    with pytest.raises(ValueError, match="revision"):
        pc.open_standard_security(
            {"Filter": "Standard", "V": 6, "R": 99, "O": b"0" * 32,
             "U": b"0" * 32}, b"",
        )
    with pytest.raises(ValueError, match="crypt filter"):
        pc.open_standard_security(
            {"Filter": "Standard", "V": 4, "R": 4, "O": b"0" * 32,
             "U": b"0" * 32, "StmF": "StdCF",
             "CF": {"StdCF": {"CFM": "AESV9"}}}, b"",
        )


# ---------------------------------------------------------------------
# end-to-end: encrypted writer → reader
# ---------------------------------------------------------------------


def test_encrypted_pdf_roundtrip_all_combos():
    pages = [
        "hello world line one\nsecond line",
        "page two with (parens) and \\ backslash",
        "unicode: żółć",
    ]
    base = P.extract_pdf_text(P.encode_pdf_text(pages))
    for layout in ("classic", "objstm"):
        for filt in ("flate", "lzw"):
            for enc in (None, "rc4-40", "rc4", "aes", "aes256"):
                raw = P.encode_pdf_text(
                    pages, layout=layout, filter_name=filt, encrypt=enc
                )
                assert P.extract_pdf_text(raw) == base, (layout, filt, enc)


def test_encrypted_pdf_is_actually_encrypted():
    # the plaintext must NOT appear in the file bytes (streams are
    # really ciphered, not just flagged)
    marker = "zq unique marker zq"
    for enc in ("rc4-40", "rc4", "aes", "aes256"):
        raw = P.encode_pdf_text([marker], compress=False, encrypt=enc)
        assert b"zq unique marker zq" not in raw, enc
        assert P.extract_pdf_text(raw)["pages"] == [marker]


def test_password_protected_file_quarantines():
    # splice R3 entries derived for a NON-empty user password into a
    # real file's trailer: extraction must raise the typed reason
    raw = P.encode_pdf_text(["x"], compress=False)
    enc, key = _r3_entries(b"secret", b"", b"\x05" * 16)
    d = (
        b"/Encrypt << /Filter /Standard /V 2 /R 3 /Length 128 /P -3904"
        b" /O <" + enc["O"].hex().encode() + b"> /U <"
        + enc["U"].hex().encode() + b"> >> /ID [<"
        + (b"\x05" * 16).hex().encode() + b"><"
        + (b"\x05" * 16).hex().encode() + b">] "
    )
    raw = raw.replace(b"/Root", d + b"/Root", 1)
    with pytest.raises(ValueError, match="password required"):
        P.extract_pdf_text(raw)


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"),
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=3,
    ),
    st.sampled_from(["rc4-40", "rc4", "aes", "aes256"]),
    st.sampled_from(["classic", "objstm"]),
)
@settings(max_examples=30, deadline=None)
def test_encrypted_roundtrip_property(pages, enc, layout):
    raw = P.encode_pdf_text(pages, layout=layout, encrypt=enc)
    d = P.extract_pdf_text(raw)
    assert d["pages"] == pages and d["n_pages"] == len(pages)


# ---------------------------------------------------------------------
# CID / Type0 fonts with ToUnicode CMaps (round 10 s2)
# ---------------------------------------------------------------------


def test_cid_font_roundtrip_all_combos():
    pages = ["hello world\nsecond line", "żółć € and 🚀 astral", ""]
    base = P.extract_pdf_text(P.encode_pdf_text(pages))
    for layout in ("classic", "objstm"):
        for filt in ("flate", "lzw"):
            for enc in (None, "rc4", "aes256"):
                raw = P.encode_pdf_text(
                    pages, layout=layout, filter_name=filt,
                    encrypt=enc, cid_font=True,
                )
                assert P.extract_pdf_text(raw) == base, (layout, filt, enc)


def test_cid_font_fixture_bites():
    # a reader that ignores the CMap must NOT get the text back —
    # break the /ToUnicode link and the codes stay raw
    raw = P.encode_pdf_text(["secret text"], compress=False, cid_font=True)
    broken = raw.replace(b"/ToUnicode", b"/ToUnicccc")
    assert P.extract_pdf_text(broken)["pages"][0] != "secret text"


def test_parse_tounicode_bfrange_forms():
    # incremented-destination bfrange + array form + surrogate pairs
    cmap = (
        b"1 begincodespacerange\n<00> <ff>\nendcodespacerange\n"
        b"1 beginbfrange\n<41> <43> <0061>\nendbfrange\n"
        b"1 beginbfrange\n<50> <51> [<0058> <2603>]\nendbfrange\n"
        b"1 beginbfchar\n<60> <d83dde00>\nendbfchar\n"
    )
    mapping, clen = P._parse_tounicode(cmap)
    assert clen == 1
    assert mapping[0x41] == "a" and mapping[0x42] == "b"
    assert mapping[0x43] == "c"
    assert mapping[0x50] == "X" and mapping[0x51] == "☃"
    assert mapping[0x60] == "\U0001f600"  # surrogate pair decodes


def test_inherited_resources_resolve():
    # move /Resources from the page up to the /Pages node: the font
    # map must still resolve through /Parent (spec inheritance)
    raw = P.encode_pdf_text(["inherit me"], compress=False, cid_font=True)
    assert b"/Resources" in raw
    # classic layout: page dicts carry Resources; splice them out of
    # the page and into the Pages node
    res = b"/Resources << /Font << /F1 3 0 R >> >> "
    assert raw.count(res) == 1
    raw2 = raw.replace(res, b"", 1).replace(
        b"/Count 1 >>", b"/Count 1 " + res + b">>", 1
    )
    assert P.extract_pdf_text(raw2)["pages"] == ["inherit me"]


# ---------------------------------------------------------------------
# review-finding regressions (round 10 s2)
# ---------------------------------------------------------------------


def test_cf_length_40_means_bits():
    # /CF Length 40 is a legitimate BITS value (5-byte RC4 key);
    # reading it as bytes would derive an impossible 40-byte key
    id0 = b"\x09" * 16
    o = pc._make_o_entry(b"", b"", 4, 5)
    key = pc._key_algo2(b"", o, -3904, id0, 4, 5)
    u = pc._make_u_entry(key, id0, 4)
    enc = {
        "Filter": "Standard", "V": 4, "R": 4, "P": -3904,
        "O": o, "U": u[:32], "StmF": "StdCF",
        "CF": {"StdCF": {"CFM": "V2", "Length": 40}},
    }
    h = pc.open_standard_security(enc, id0)
    assert len(h.key) == 5


def test_r6_without_v_still_aes():
    # a malformed-but-openable R6 dict missing /V must decrypt with
    # AES-256, never fall back to the V1/V2 RC4 default
    d, sess = pc.make_encryption("aes256", b"\x0a" * 16)
    lex = P._Lexer(d)
    plain = P._plain({}, lex.token())
    del plain["V"]
    h = pc.open_standard_security(plain, b"\x0a" * 16)
    assert h.method == "aesv3" and h.key == sess.key


def test_corrupt_aes_stream_not_classified_encrypted():
    # corruption messages must not contain 'encrypted' (the typed
    # quarantine in pdf_text_features keys on that word)
    _d, sess = pc.make_encryption("aes", b"\x0b" * 16)
    try:
        sess.decrypt_stream(5, 0, b"short")
    except ValueError as e:
        assert "encrypted" not in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_later_trailer_without_encrypt_supersedes():
    # decrypted-and-resaved incremental update: the LAST full trailer
    # has no /Encrypt, so the (stale) earlier /Encrypt must not fire
    raw = P.encode_pdf_text(["plain text"], compress=False)
    enc, _ = _r3_entries(b"secret", b"", b"\x0c" * 16)
    stale = (
        b"trailer\n<< /Size 99 /Root 1 0 R /Encrypt << /Filter "
        b"/Standard /V 2 /R 3 /Length 128 /P -3904 /O <"
        + enc["O"].hex().encode() + b"> /U <" + enc["U"].hex().encode()
        + b"> >> >>\n"
    )
    # splice the stale encrypted trailer BEFORE the real one
    k = raw.index(b"trailer")
    spliced = raw[:k] + stale + raw[k:]
    assert P.extract_pdf_text(spliced)["pages"] == ["plain text"]


# ---------------------------------------------------------------------
# independent KDF transcriptions + golden pins (round 11, ADVICE):
# the writer/reader roundtrips share one KDF implementation, so a
# transcription error in Algorithms 2 / 2.B would round-trip green
# and only surface as quarantines on real-world encrypted corpora.
# No external PDF tool exists in this container to generate golden
# fixtures, so the next-best guard: a SECOND, structurally different
# transcription of each KDF lives here in the tests (full-digest
# chaining vs truncate-then-hash; pdf.js-style while loop vs
# post-increment break), plus pinned golden hex so any future drift
# in either copy is loud.


_SPEC_PAD = bytes.fromhex(
    "28bf4e5e4e758a4164004e56fffa01082e2e00b6d0683e802f0ca9fe6453697a"
)


def _algo2_independent(pw, o, p, id0, r, keylen, encrypt_metadata=True):
    import hashlib

    msg = (pw + _SPEC_PAD)[:32] + o[:32]
    msg += (p & 0xFFFFFFFF).to_bytes(4, "little") + id0
    if r >= 4 and not encrypt_metadata:
        msg += b"\xff\xff\xff\xff"
    key = hashlib.md5(msg).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def _r6_independent(pw, salt, udata=b""):
    import hashlib

    k = hashlib.sha256(pw + salt + udata).digest()
    e = b"\x00" * 64
    i = 0
    while i < 64 or e[-1] > i - 32:
        k1 = (pw + k + udata) * 64
        # independent CBC chaining over the (vector-tested) block
        # kernel: key = K[0:16], IV = K[16:32], no padding
        out, prev = [], k[16:32]
        for off in range(0, len(k1), 16):
            prev = pc.aes_encrypt_block(
                k[:16], bytes(x ^ y for x, y in zip(k1[off:off + 16], prev))
            )
            out.append(prev)
        e = b"".join(out)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
    return k[:32]


def test_kdf_algo2_vs_independent_transcription():
    id0 = bytes(range(16))
    o = pc._make_o_entry(b"owner", b"user", 3, 16)
    cases = [
        (b"user", o, -3904, id0, 2, 5, True),
        (b"user", o, -3904, id0, 3, 16, True),
        (b"user", o, -44, id0, 4, 16, True),
        (b"user", o, -44, id0, 4, 16, False),
        (b"", o, -1, b"", 3, 16, True),
        (b"long password exceeding the 32-byte pad window!!", o,
         -3904, id0, 3, 16, True),
    ]
    for pw, oo, p, i0, r, kl, em in cases:
        assert pc._key_algo2(pw, oo, p, i0, r, kl, em) == \
            _algo2_independent(pw, oo, p, i0, r, kl, em)


def test_kdf_r6_vs_independent_transcription():
    cases = [
        (b"user", b"\x01" * 8, b""),
        (b"user", b"\x01" * 8, b"\xaa" * 48),
        (b"", b"saltsalt", b""),
        (b"another-password", bytes(range(8)), b"\x55" * 48),
    ]
    for pw, salt, ud in cases:
        assert pc.hash_r6(pw, salt, ud) == _r6_independent(pw, salt, ud)


_KDF_GOLDEN = {
    "o": "0ba3835f88f90388e74e54584125ce142be0de24c6b0d37746e075b891756671",
    "k2": "ebc53cf170c71152a5ba9925bd0fefc3",
    "r6": "273444d38b9bfa2ef7f9ec30b363c84a94e674abb67e0e8c8ca3479a96551090",
}


def test_kdf_golden_pins():
    """Frozen outputs of both KDFs on fixed inputs: if either the
    library or the independent transcription drifts, this fails with
    the hex diff (the in-container stand-in for externally generated
    qpdf/pikepdf fixtures)."""
    id0 = bytes(range(16))
    o = pc._make_o_entry(b"owner", b"user", 3, 16)
    k2 = pc._key_algo2(b"user", o, -3904, id0, 3, 16)
    r6 = pc.hash_r6(b"user", b"\x01" * 8)
    pins = {"o": o.hex(), "k2": k2.hex(), "r6": r6.hex()}
    assert pins == _KDF_GOLDEN


def test_zero_length_stream_decrypts_to_empty():
    # some producers emit empty stream objects and leave them
    # unencrypted — must not quarantine the document (ADVICE r10)
    for method in ("aes", "rc4", "aes256"):
        _d, sess = pc.make_encryption(method, b"\x0b" * 16)
        assert sess.decrypt_stream(7, 0, b"") == b""


def test_trailer_token_inside_content_stream_ignored():
    # the literal word 'trailer' followed by dict-like text inside a
    # page's (uncompressed) content stream must not participate in
    # /Encrypt last-wins resolution (ADVICE r10)
    raw = P.encode_pdf_text(
        ["see trailer << /Encrypt 9 0 R >> for details"],
        compress=False,
    )
    out = P.extract_pdf_text(raw)
    assert out["pages"] == ["see trailer << /Encrypt 9 0 R >> for details"]
