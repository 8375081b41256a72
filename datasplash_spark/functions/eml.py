"""Email (RFC 5322 / MIME) text extraction (round 13).

Mail archives (mbox exports, .eml dumps, list archives) are a
classic text-corpus source; this module gives the universal router
(``functions/doctext.py``) an email family on the stdlib ``email``
package, under the same contract as the other formats:

- headers are metadata, not corpus text — only ``Subject`` survives
  (as the document's first line);
- the MIME tree walks like a mail client: every ``text/plain`` leaf
  concatenates (transfer encodings — base64, quoted-printable —
  decoded by the stdlib, charsets honored); when NO plain part
  exists, ``text/html`` leaves run through the shared HTML
  extractor; attachments and non-text parts drop;
- whitespace follows the shared paragraph contract per part.

Detection is conservative: at least TWO distinct RFC 5322 header
keys from the common set in the first lines, a ``:`` shape on each,
before any blank line — prose that merely starts with "From: my
perspective" never carries a second header.

Reference anchor: the reference has no mail codec — north-star
LLM-pipeline surface (BASELINE.json); grammar per RFC 5322 and the
stdlib ``email`` package's public API.
"""

from __future__ import annotations

import re

from . import web as _web

_HEADER_KEYS = (
    "from", "to", "subject", "date", "received", "message-id",
    "mime-version", "cc", "reply-to", "return-path", "sender",
    "content-type",
)
_HEADER_RE = re.compile(r"^([A-Za-z][\w-]{0,30}):[ \t]")


def sniff_eml(head: str) -> bool:
    """True when the head opens with an RFC 5322 header block: at
    least two DISTINCT keys from the common set before the first
    blank line (an mbox ``From `` envelope line may precede)."""
    lines = head.split("\n")
    if lines and lines[0].startswith("From "):
        lines = lines[1:]
    seen: set[str] = set()
    for line in lines[:30]:
        if not line.strip():
            break
        m = _HEADER_RE.match(line)
        if m and m.group(1).lower() in _HEADER_KEYS:
            seen.add(m.group(1).lower())
        if len(seen) >= 2:
            return True
    return False


def eml_to_text(raw: bytes) -> str:
    """One email → corpus text (module docstring). Raises typed
    errors only for input that is not header-shaped at all — the
    stdlib parser itself is lenient by design."""
    import email
    from email.header import decode_header, make_header

    from .doctext import _html_to_text_py
    from .web import collapse_extracted_whitespace

    # compat32 policy: ~5× faster than policy.default at corpus
    # scale (measured — the modern policy re-parses every header
    # through the structured registry); transfer decoding comes
    # from get_payload(decode=True), charset from the part, and
    # RFC 2047 subjects through decode_header explicitly
    msg = email.message_from_bytes(raw)
    parts: list[str] = []
    subject = msg.get("Subject")
    if subject:
        try:
            subject = str(make_header(decode_header(subject)))
        except Exception:
            pass
        subject = re.sub(r"\s+", " ", subject).strip()
        if subject:
            parts.append(subject)
    plains: list[str] = []
    htmls: list[str] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        if ctype not in ("text/plain", "text/html"):
            continue
        if part.get_content_disposition() == "attachment":
            continue
        payload = part.get_payload(decode=True)
        if payload is None:
            payload = str(part.get_payload()).encode(
                "utf-8", "surrogateescape"
            )
        charset = part.get_content_charset() or "utf-8"
        try:
            body = payload.decode(charset, "replace")
        except LookupError:
            body = payload.decode("utf-8", "replace")
        if ctype == "text/plain":
            plains.append(collapse_extracted_whitespace(body))
        else:
            htmls.append(_html_to_text_py(body))
    parts.extend(p for p in (plains or htmls) if p)
    return "\n".join(parts)


_BOUNDARY = "=-datasplash-fixture-boundary"


def encode_eml(
    units: list[str], doc_id: int = 0, html_only: bool = False
) -> bytes:
    """Fixture half: a real multipart MIME message per unit list —
    fixed From/To/Date headers (metadata that must vanish), a
    Subject that must survive as the first line, and per the mode
    either a QUOTED-PRINTABLE ``text/plain`` part (one paragraph
    per unit — the transfer-decode pin) plus a ``text/html``
    sibling that must be IGNORED while a plain part exists, or
    (``html_only=True``) only the html part, whose extracted text
    must then be used."""
    import quopri

    plain_body = "\n\n".join(units)
    qp = quopri.encodestring(plain_body.encode("utf-8")).decode(
        "ascii"
    )
    html_body = "".join("<p>%s</p>" % u for u in units)
    lines = [
        "From: fixtures@example.com",
        "To: corpus@example.com",
        "Date: Mon, 01 Jan 2024 00:00:00 +0000",
        "Subject: Doc %d" % doc_id,
        "MIME-Version: 1.0",
        'Content-Type: multipart/alternative; boundary="%s"'
        % _BOUNDARY,
        "",
    ]
    if not html_only:
        lines += [
            "--" + _BOUNDARY,
            'Content-Type: text/plain; charset="utf-8"',
            "Content-Transfer-Encoding: quoted-printable",
            "",
            qp,
        ]
    lines += [
        "--" + _BOUNDARY,
        'Content-Type: text/html; charset="utf-8"',
        "Content-Transfer-Encoding: 7bit",
        "",
        "<html><body>%s</body></html>" % html_body,
        "--" + _BOUNDARY + "--",
        "",
    ]
    return "\r\n".join(lines).encode("utf-8")


def eml_expected_text(units: list[str], doc_id: int = 0) -> str:
    """The exact text :func:`eml_to_text` extracts from
    :func:`encode_eml` (both modes produce the same: subject line,
    then one line per non-empty unit — the plain part's blank-line
    paragraphs and the html part's ``<p>`` blocks collapse
    identically under the shared whitespace contract)."""
    parts = ["Doc %d" % doc_id]
    body = "\n".join(u for u in units if u)
    if body:
        parts.append(body)
    return "\n".join(parts)


EML_FEATURES_SCHEMA = (
    "doc_id bigint, n_chars int, text string, ok boolean, err string"
)


def synthesize_eml_from_text(
    df, text="text", id_col="doc_id", units_mod=3
):
    """Deterministic synthetic mail corpus for the corpus gate: per
    doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped), rendered through :func:`encode_eml` — plain+html for
    even doc_ids (the plain part must win), html-only for odd (the
    html fallback must extract). Input normalization (mirrored in
    the oracle): markup/header-special characters → ``-``, the
    shared divergent set → ``-``, whitespace runs → one space.
    Returns ``(doc_id, n_units, media binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[<>&=:\"'\\]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                medias.append(
                    encode_eml(units, did, html_only=(did % 2 == 1))
                )
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )


def eml_text_features(df, id_col="doc_id", media_col="media"):
    """Extract mail text into typed rows (``doc_id, n_chars, text,
    ok, err``) with per-document quarantine; extraction runs where
    the message lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                try:
                    data = bytes(raw) if raw is not None else b""
                    t = eml_to_text(data)
                    rows.append((did, len(t), t, True, None))
                except Exception as e:
                    rows.append((did, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_chars", "text", "ok", "err"],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=EML_FEATURES_SCHEMA
    )
