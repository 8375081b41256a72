"""iCalendar text extraction + vCard privacy quarantine (round 13).

Shared drives carry calendar exports (`.ics`) and contact dumps
(`.vcf`) alongside documents; without a family the router types
both 'text' and the corpus inherits RRULEs, UIDs, and — far worse —
whole address books of names, phone numbers, and emails as prose.
Two policies, one module:

- **iCalendar (RFC 5545)**: prose-bearing properties survive —
  each VEVENT/VTODO/VJOURNAL contributes its ``SUMMARY`` line and
  its ``DESCRIPTION`` (and ``LOCATION``) under the shared paragraph
  contract, with RFC 5545 line UNFOLDING (a CRLF followed by a
  space/tab continues the previous line) and text-value unescaping
  (``\\n`` → newline, ``\\,`` ``\\;`` ``\\\\`` literal); everything
  else (DTSTART, RRULE, UID, ORGANIZER/ATTENDEE mailto: lines,
  VALARM blocks) is plumbing and VANISHES.
- **vCard (RFC 6350)**: the whole document is TYPED QUARANTINE —
  a contact dump is PII by construction, not corpus text; admitting
  even its FN lines would leak names into the corpus. The router
  rejects it the way it rejects media blobs, with the err row
  naming the policy.

Detection is a magic in all but name: ``BEGIN:VCALENDAR`` /
``BEGIN:VCARD`` as the first non-blank line (BOM tolerated).

Reference anchor: the reference has no calendar codec — north-star
LLM-pipeline surface (BASELINE.json); grammar per RFC 5545
(iCalendar) and RFC 6350 (vCard).
"""

from __future__ import annotations

import re

from . import web as _web

#: components whose SUMMARY/DESCRIPTION/LOCATION are prose; VALARM
#: descriptions are machine reminders and drop with their block
_PROSE_COMPONENTS = frozenset({"VEVENT", "VTODO", "VJOURNAL"})
_PROSE_PROPS = ("SUMMARY", "DESCRIPTION", "LOCATION")


def sniff_calendar(head: str) -> str | None:
    """``'ics'`` / ``'vcf'`` when the first non-blank line opens the
    respective envelope, else ``None``."""
    for line in head.split("\n"):
        s = line.strip()
        if not s:
            continue
        if s.upper().startswith("BEGIN:VCALENDAR"):
            return "ics"
        if s.upper().startswith("BEGIN:VCARD"):
            return "vcf"
        return None
    return None


def _unfold(src: str) -> list[str]:
    """RFC 5545 §3.1 line unfolding: CRLF + single WSP continues the
    previous line."""
    lines: list[str] = []
    for raw in src.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if raw[:1] in (" ", "\t") and lines:
            lines[-1] += raw[1:]
        else:
            lines.append(raw)
    return lines


_UNESCAPE = {
    "\\n": "\n", "\\N": "\n", "\\,": ",", "\\;": ";", "\\\\": "\\",
}


def _unescape_text(v: str) -> str:
    return re.sub(
        r"\\[nN,;\\]", lambda m: _UNESCAPE[m.group(0)], v
    )


def ics_to_text(src: str) -> str:
    """One iCalendar stream → its prose (module docstring): per
    prose component, SUMMARY then DESCRIPTION then LOCATION, one
    block per component; nested VALARMs drop. Raises typed errors
    for an unterminated envelope — a truncated export quarantines
    rather than shedding its tail silently."""
    from .web import collapse_extracted_whitespace

    lines = _unfold(src)
    if not lines or not lines[0].strip().upper().startswith(
        "BEGIN:VCALENDAR"
    ):
        raise ValueError("ics: missing BEGIN:VCALENDAR envelope")
    stack: list[str] = []
    parts: list[str] = []
    pending: dict[str, str] = {}
    saw_end = False
    for line in lines:
        s = line.strip()
        if not s:
            continue
        up = s.upper()
        if up.startswith("BEGIN:"):
            stack.append(up[6:])
            if up[6:] in _PROSE_COMPONENTS:
                pending = {}
            continue
        if up.startswith("END:"):
            comp = up[4:]
            if comp == "VCALENDAR":
                saw_end = True
            if stack and stack[-1] == comp:
                stack.pop()
            if comp in _PROSE_COMPONENTS:
                for prop in _PROSE_PROPS:
                    v = pending.get(prop)
                    if v:
                        parts.append(v)
                pending = {}
            continue
        # property line NAME[;param...]:value — prose props only,
        # only directly inside a prose component (VALARM bodies and
        # calendar-level X- props drop)
        if not stack or stack[-1] not in _PROSE_COMPONENTS:
            continue
        # params may carry quoted values containing colons
        # (DESCRIPTION;ALTREP="cid:x":text — RFC 5545 §3.2), so the
        # param scan must be quote-aware
        m = re.match(
            r'([A-Za-z0-9-]+)(?:;(?:[^":;\n]|"[^"\n]*"|;)*)?:(.*)$',
            s,
        )
        if not m:
            continue
        name = m.group(1).upper()
        if name in _PROSE_PROPS and name not in pending:
            v = collapse_extracted_whitespace(
                _unescape_text(m.group(2))
            )
            if v:
                pending[name] = v
    if not saw_end:
        raise ValueError("ics: unterminated VCALENDAR (truncated "
                         "export)")
    return "\n".join(parts)


def ics_event_count(src: str) -> int:
    """Number of prose components (VEVENT/VTODO/VJOURNAL) in the
    stream."""
    return sum(
        1
        for line in _unfold(src)
        if line.strip().upper().startswith("BEGIN:")
        and line.strip().upper()[6:] in _PROSE_COMPONENTS
    )


def encode_ics(units: list[str], doc_id: int = 0) -> bytes:
    """Fixture half: a real iCalendar file per unit list — calendar
    plumbing (PRODID, timezone), one VEVENT per unit with DTSTART/
    RRULE/UID/ORGANIZER noise that must VANISH, a SUMMARY that must
    survive, a DESCRIPTION carrying the unit with an ESCAPED comma
    and a FOLDED long line (the §3.1 pins), and a nested VALARM
    whose DESCRIPTION must drop."""
    lines = [
        "BEGIN:VCALENDAR",
        "VERSION:2.0",
        "PRODID:-//datasplash//fixtures//EN",
    ]
    for u, unit in enumerate(units):
        # fold the description after 20 octets: the reader must
        # unfold before parsing the value
        desc = "u%d\\, that is: %s" % (u, unit)
        head, tail = desc[:20], desc[20:]
        lines += [
            "BEGIN:VEVENT",
            "UID:evt-%d-%d@example.com" % (doc_id, u),
            "DTSTAMP:20240101T000000Z",
            "DTSTART:20240101T%02d0000Z" % (u % 24),
            "RRULE:FREQ=WEEKLY;BYDAY=MO",
            "ORGANIZER;CN=Fixture:mailto:noise@example.com",
            "SUMMARY:Event %d" % u,
            "DESCRIPTION:" + head,
        ]
        if tail:
            lines.append(" " + tail)
        lines += [
            "BEGIN:VALARM",
            "ACTION:DISPLAY",
            "DESCRIPTION:machine reminder drops",
            "TRIGGER:-PT15M",
            "END:VALARM",
            "END:VEVENT",
        ]
    lines.append("END:VCALENDAR")
    return "\r\n".join(lines).encode("utf-8")


def encode_vcf(doc_id: int = 0, n_cards: int = 2) -> bytes:
    """Fixture half: a vCard dump — PII-shaped contact rows the
    router must QUARANTINE, never admit."""
    cards = []
    for c in range(n_cards):
        cards.append(
            "BEGIN:VCARD\r\nVERSION:4.0\r\n"
            "FN:Fixture Person %d-%d\r\n"
            "TEL;TYPE=cell:+1-555-01%02d\r\n"
            "EMAIL:person%d.%d@example.com\r\n"
            "END:VCARD" % (doc_id, c, c % 100, doc_id, c)
        )
    return "\r\n".join(cards).encode("utf-8")


def ics_expected_text(units: list[str], doc_id: int = 0) -> str:
    """The exact text :func:`ics_to_text` extracts from
    :func:`encode_ics`: per unit its SUMMARY line then the unfolded,
    unescaped DESCRIPTION."""
    parts: list[str] = []
    for u, unit in enumerate(units):
        parts.append("Event %d" % u)
        parts.append(("u%d, that is: %s" % (u, unit)).strip())
    return "\n".join(parts)


ICS_FEATURES_SCHEMA = (
    "doc_id bigint, n_events int, text string, ok boolean, "
    "err string"
)


def synthesize_ics_from_text(
    df, text="text", id_col="doc_id", units_mod=3, poison_mod=0
):
    """Deterministic synthetic calendar corpus for the corpus gate:
    per doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped), rendered through :func:`encode_ics`. With
    ``poison_mod=k`` every doc where ``doc_id % k == 7`` becomes a
    vCard dump (:func:`encode_vcf`) — the privacy-quarantine pin.
    Input normalization (mirrored in the oracle): value-grammar
    characters (backslash, semicolon, comma, colon) → ``-``, the
    shared divergent set → ``-``, whitespace runs → one space.
    Returns ``(doc_id, n_units, media binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[\\\\;,:]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                if poison_mod and did % poison_mod == 7:
                    medias.append(encode_vcf(did))
                else:
                    medias.append(encode_ics(units, did))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )


def ics_text_features(df, id_col="doc_id", media_col="media"):
    """Extract calendars into typed rows (``doc_id, n_events, text,
    ok, err``); vCard input quarantines with the privacy policy in
    the err row. Extraction runs where the blob lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                try:
                    data = bytes(raw) if raw is not None else b""
                    src = data.decode("utf-8", "replace")
                    kind = sniff_calendar(src[:256])
                    if kind == "vcf":
                        raise ValueError(
                            "vcf: contact dump is PII, not corpus "
                            "text (privacy quarantine)"
                        )
                    rows.append(
                        (
                            did,
                            ics_event_count(src),
                            ics_to_text(src),
                            True,
                            None,
                        )
                    )
                except Exception as e:
                    rows.append((did, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_events", "text", "ok", "err"],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=ICS_FEATURES_SCHEMA
    )
