"""Subtitle/caption text extraction — SRT and WebVTT (round 12).

Transcript sidecars are how speech enters a training corpus (they
ride next to every mp4/audio asset this engine already handles);
this module gives the universal document router
(``functions/doctext.py``) extractors for the two formats that
carry virtually all of them, with the same zero-dependency contract
as the other families: deterministic writers (fixture half) and
readers the router dispatches to per row inside the Arrow kernel.

Extraction model:

- SRT: cue blocks split on blank lines; the leading numeric index
  line and the ``HH:MM:SS,mmm --> …`` timestamp line drop, the cue
  text lines survive; inline markup (``<i>``/``<b>``/``<font>``
  tags, ASS-style ``{\\an8}`` positioning braces) strips.
- WebVTT: the ``WEBVTT`` header block and ``NOTE``/``STYLE``/
  ``REGION`` blocks drop; per cue the optional identifier line and
  the timestamp line (cue settings included) drop, text lines
  survive; voice/class spans (``<v Name>``, ``<c.yellow>``) strip
  like the SRT tags.
- whitespace: horizontal runs collapse, cue texts join with ONE
  newline (the shared paragraph contract).

Reference anchor: the reference has no subtitle codec — north-star
LLM-pipeline surface (BASELINE.json); SRT is the de-facto SubRip
format, WebVTT is a W3C spec.
"""

from __future__ import annotations

import re

from . import web as _web

_TS_SRT_RE = re.compile(
    r"^\d{1,2}:\d{2}:\d{2}[,.]\d{3}\s+-->\s+\d{1,2}:\d{2}:\d{2}[,.]\d{3}"
)
_TS_VTT_RE = re.compile(r"^(?:\d{1,}:)?\d{2}:\d{2}\.\d{3}\s+-->\s+")
_ASS_BRACE_RE = re.compile(r"\{\\?[^{}]*\}")
_TAG_RE = re.compile(r"</?[A-Za-z][^<>\n]*>")


def _strip_cue_markup(line: str) -> str:
    line = _ASS_BRACE_RE.sub(" ", line)
    line = _TAG_RE.sub(" ", line)
    return re.sub(r"[ \t]+", " ", line).strip()


def srt_to_text(src: str) -> str:
    """SubRip → the cue text (see the module docstring)."""
    s = src.replace("\r\n", "\n").replace("\r", "\n")
    out: list[str] = []
    for block in re.split(r"\n[ \t]*\n", s):
        lines = block.split("\n")
        i = 0
        while i < len(lines) and not lines[i].strip():
            i += 1
        if i < len(lines) and lines[i].strip().isdigit():
            # the cue index — but only when a timestamp follows
            # (a pure-digit TEXT line must survive)
            if i + 1 < len(lines) and _TS_SRT_RE.match(
                lines[i + 1].strip()
            ):
                i += 1
        if i < len(lines) and _TS_SRT_RE.match(lines[i].strip()):
            i += 1
        for raw in lines[i:]:
            t = _strip_cue_markup(raw)
            if t:
                out.append(t)
    return "\n".join(out)


def vtt_to_text(src: str) -> str:
    """WebVTT → the cue text (see the module docstring)."""
    s = src.replace("\r\n", "\n").replace("\r", "\n")
    if s.startswith("\ufeff"):
        s = s[1:]
    out: list[str] = []
    for block in re.split(r"\n[ \t]*\n", s):
        lines = [ln for ln in block.split("\n") if ln.strip()]
        if not lines:
            continue
        head = lines[0].strip()
        if head.startswith(("WEBVTT", "NOTE", "STYLE", "REGION")):
            continue
        i = 0
        if (
            not _TS_VTT_RE.match(head)
            and len(lines) > 1
            and _TS_VTT_RE.match(lines[1].strip())
        ):
            i = 1  # cue identifier line
        if i < len(lines) and _TS_VTT_RE.match(lines[i].strip()):
            i += 1
        for raw in lines[i:]:
            t = _strip_cue_markup(raw)
            if t:
                out.append(t)
    return "\n".join(out)


def _wrap_mid_word(cue: str, fmt: str = "<i>%s</i>") -> str:
    words = cue.split(" ") if cue else []
    if words:
        words = list(words)
        mid = len(words) // 2
        if mid != 0:
            words[mid] = fmt % words[mid]
    return " ".join(words)


def encode_srt(cues: list[str]) -> bytes:
    """Fixture half: a real SRT file — numeric index + timestamp
    line per cue, the middle word italic-tagged, the first cue
    carrying an ASS positioning brace; both must strip."""
    blocks = []
    for i, cue in enumerate(cues):
        text = _wrap_mid_word(cue)
        if i == 0 and text:
            text = "{\\an8}" + text
        lines = [
            str(i + 1),
            "00:%02d:%02d,000 --> 00:%02d:%02d,500"
            % ((2 * i) // 60, (2 * i) % 60, (2 * i + 1) // 60,
               (2 * i + 1) % 60),
        ]
        if text:
            lines.append(text)
        blocks.append("\n".join(lines))
    return ("\n\n".join(blocks) + "\n").encode("utf-8")


def encode_vtt(cues: list[str]) -> bytes:
    """Fixture half: a real WebVTT file — header, a NOTE block that
    must vanish, per cue an identifier line, a timestamp line WITH
    cue settings, and a class-span wrap on the middle word."""
    parts = ["WEBVTT", "", "NOTE synthetic fixture", ""]
    for i, cue in enumerate(cues):
        text = _wrap_mid_word(cue, fmt="<c.yellow>%s</c>")
        parts.append("cue%d" % i)
        parts.append(
            "%02d:%02d.000 --> %02d:%02d.500 align:start"
            % ((2 * i) // 60, (2 * i) % 60, (2 * i + 1) // 60,
               (2 * i + 1) % 60)
        )
        if text:
            parts.append(text)
        parts.append("")
    return "\n".join(parts).encode("utf-8")


def subtitles_expected_text(cues: list[str]) -> str:
    """The exact text both extractors recover from their encoders —
    the cue texts, empty cues skipped, one per line."""
    return "\n".join(c for c in cues if c)


SUBTITLE_FEATURES_SCHEMA = (
    "doc_id bigint, kind string, n_chars int, text string, "
    "ok boolean, err string"
)


def synthesize_subtitles_from_text(
    df, text="text", id_col="doc_id", units_mod=3
):
    """Deterministic synthetic subtitle corpus for the corpus gate:
    per doc ``1 + len(text) % units_mod`` cues (words round-robin,
    clamped so no cue is empty), rendered as SRT for even doc_ids
    and WebVTT for odd. Input normalization (mirrored in the
    oracle): markup-special characters → ``-``, whitespace runs →
    one space. Returns ``(doc_id, n_units, media binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[<>{}&]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                cues = [" ".join(words[i::n]) for i in range(n)]
                enc = encode_srt if did % 2 == 0 else encode_vtt
                ids.append(did)
                nus.append(n)
                medias.append(enc(cues))
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )


def subtitle_text_features(df, id_col="doc_id", media_col="media"):
    """Extract cue text from a subtitle column into typed rows
    (``doc_id, kind, n_chars, text, ok, err``) with per-document
    quarantine — format resolved per row by the WEBVTT header, the
    same dispatch the universal router uses."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                try:
                    data = bytes(raw) if raw is not None else b""
                    s = data.decode("utf-8", "replace")
                    if s.lstrip("\ufeff").startswith("WEBVTT"):
                        kind, t = "vtt", vtt_to_text(s)
                    else:
                        kind, t = "srt", srt_to_text(s)
                    rows.append((did, kind, len(t), t, True, None))
                except Exception as e:  # pragma: no cover (lenient)
                    rows.append((did, None, None, None, False, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "n_chars", "text", "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=SUBTITLE_FEATURES_SCHEMA
    )
