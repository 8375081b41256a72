"""Character-encoding transports for the document router (round 13).

A 100 TB shared-drive dump is not all UTF-8: Windows exports ship
UTF-16 (with or without BOM), and legacy web text is windows-1252.
Without handling, a UTF-16 document routes 'text' and decodes to
NUL-laced mojibake, and a cp1252 high byte (smart quote, em dash)
becomes U+FFFD — silent corpus corruption either way. This module
treats encodings the way the router treats gzip: a TRANSPORT that
decodes, re-encodes to UTF-8, and re-sniffs the inner document, so
``utf16le:md`` composes exactly like ``gz:md``:

- BOMs route directly (UTF-32 checked before UTF-16 — the UTF-32-LE
  BOM starts with the UTF-16-LE one);
- BOM-less UTF-16 is detected by the NUL lattice ASCII-heavy text
  leaves on one byte parity (strictly one-sided, so real binary
  with NULs on both parities never routes here — that stays with
  the media quarantine);
- transport decode is STRICT: a BOM'd document that does not decode
  is corrupt and quarantines typed, it does not degrade;
- the plain-text fallback decodes UTF-8 strict first and falls back
  to windows-1252 (the de-facto superset the web agreed on) only
  when UTF-8 fails — pure-ASCII and valid-UTF-8 text never touches
  the fallback.

Reference anchor: the reference has no charset handling (Beam text
IO assumes UTF-8) — north-star LLM-pipeline surface
(BASELINE.json); conventions per the Unicode standard (BOMs) and
the WHATWG encoding spec (windows-1252 as the web fallback).
"""

from __future__ import annotations

#: transport kinds → python codec; UTF-32 first (BOM prefix rule)
TRANSPORT_CODECS = {
    "utf32le": "utf-32-le",
    "utf32be": "utf-32-be",
    "utf16le": "utf-16-le",
    "utf16be": "utf-16-be",
}


def sniff_transport_encoding(raw: bytes) -> str | None:
    """``'utf32le'/'utf32be'/'utf16le'/'utf16be'`` for BOM'd input
    (BOM included in the payload — the decoder strips it), the
    UTF-16 kinds also for BOM-less input whose NUL lattice is
    strictly one-sided, else ``None``. ``FF FE 00 00`` is
    inherently ambiguous (UTF-32-LE BOM vs UTF-16-LE BOM + U+0000);
    UTF-32 wins per the Unicode convention — real text does not
    begin with NUL."""
    if raw[:4] == b"\xff\xfe\x00\x00":
        return "utf32le"
    if raw[:4] == b"\x00\x00\xfe\xff":
        return "utf32be"
    if raw[:2] == b"\xff\xfe":
        return "utf16le"
    if raw[:2] == b"\xfe\xff":
        return "utf16be"
    # BOM-less UTF-16: ASCII-heavy text leaves >=40% NULs on exactly
    # one byte parity and essentially none on the other
    sample = raw[:512]
    if len(sample) >= 8:
        even = sample[0::2].count(0) / len(sample[0::2])
        odd = sample[1::2].count(0) / len(sample[1::2])
        if odd >= 0.4 and even <= 0.05:
            return "utf16le"
        if even >= 0.4 and odd <= 0.05:
            return "utf16be"
    return None


def decode_transport(kind: str, raw: bytes) -> bytes:
    """Decode a transport-encoded document STRICTLY and re-encode
    UTF-8 for the inner re-sniff; raises ``ValueError`` (typed) for
    corrupt payloads — a truncated code unit quarantines its
    document."""
    codec = TRANSPORT_CODECS[kind]
    bom = {
        "utf32le": b"\xff\xfe\x00\x00",
        "utf32be": b"\x00\x00\xfe\xff",
        "utf16le": b"\xff\xfe",
        "utf16be": b"\xfe\xff",
    }[kind]
    payload = raw[len(bom):] if raw.startswith(bom) else raw
    try:
        text = payload.decode(codec)
    except UnicodeDecodeError as e:
        raise ValueError(f"{kind}: corrupt transport payload ({e})")
    return text.encode("utf-8")


def decode_fallback(raw: bytes) -> tuple[str, str]:
    """``(encoding, text)`` for plain-text payloads: UTF-8 strict
    first (a leading BOM char is stripped), windows-1252 otherwise.
    cp1252's five undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) decode
    replace — they do not occur in real 1252 text."""
    try:
        text = raw.decode("utf-8")
        if text[:1] == "\ufeff":
            text = text[1:]
        return "utf-8", text
    except UnicodeDecodeError:
        return "cp1252", raw.decode("cp1252", "replace")


def synthesize_charset_from_text(
    df, text="text", id_col="doc_id", units_mod=3, poison_mod=0
):
    """Deterministic mixed-encoding corpus for the corpus gate: per
    doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped), the encoding rotating on ``doc_id % 4`` —

    - 0: plain UTF-8 text (a fixed header line + one line per
      unit);
    - 1: the same document BOM'd UTF-16-LE (must come back
      byte-identical in text under kind ``utf16le:text``);
    - 2: the MARKDOWN fixture BOM'd UTF-16-BE (the transport must
      compose with the inner re-sniff: kind ``utf16be:md``);
    - 3: the plain document plus a line of cp1252-only characters
      (em dash, ellipsis), ENCODED cp1252 — the UTF-8-strict →
      windows-1252 fallback pin.

    With ``poison_mod=k`` every doc where ``doc_id % k == 7`` is a
    BOM'd UTF-16 payload with a truncated trailing code unit (the
    strict-transport quarantine pin). Input normalization (mirrored
    in the oracle): every byte outside printable ASCII → space
    (keeps slot 3 cp1252-encodable), the markup-union class →
    ``-``, whitespace runs → one space. Returns ``(doc_id,
    n_units, media binary)``."""
    import re

    def synth(batches):
        import pandas as pd

        from . import markdown as mdw

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = re.sub(r"[^\x20-\x7e]", " ", t or "")
                t = re.sub(
                    r"[\\~^%&$#{}_<>`*\[\]()!|=:;'\"/]", "-", t
                )
                t = re.sub(r"\s+", " ", t).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                content = "\n".join(
                    ["charset fixture d%d" % did] + units
                )
                if poison_mod and did % poison_mod == 7:
                    media = (
                        b"\xff\xfe"
                        + content.encode("utf-16-le")
                        + b"\x41"
                    )
                elif did % 4 == 0:
                    media = content.encode("utf-8")
                elif did % 4 == 1:
                    media = b"\xff\xfe" + content.encode("utf-16-le")
                elif did % 4 == 2:
                    media = b"\xfe\xff" + mdw.encode_markdown(
                        units
                    ).decode("utf-8").encode("utf-16-be")
                else:
                    media = (
                        content + "\ncaf\xe9 — legacy …"
                    ).encode("cp1252")
                ids.append(did)
                nus.append(n)
                medias.append(media)
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )
