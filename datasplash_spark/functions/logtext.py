"""Log-file text extraction (round 13).

Server/application logs are the most common text format on a
shared drive after source code and CSV dumps; without a family the
universal router (``functions/doctext.py``) types them 'text' and
the corpus inherits timestamps, hostnames, and IP addresses as
prose. This module gives the router a log family under the shared
contract:

- the line HEADER (timestamp, host, level, client fields) is
  metadata, not corpus text — only the MESSAGE survives, one line
  per message;
- five dialects cover the shapes that dominate real dumps:
  BSD syslog (RFC 3164 layout: ``Mon dd HH:MM:SS host proc[pid]:
  message``), versioned syslog (RFC 5424: ``<pri>1 TIMESTAMP host
  app procid msgid SD message`` — the severity rides ``pri & 7``),
  ISO-timestamp application logs (``2024-01-01T00:00:00Z LEVEL
  [component] message`` — the log4j/structlog/uvicorn family),
  NCSA Common Log Format access lines (the quoted request line is
  the message — there is no other prose on an access line), and
  logfmt (``ts=… level=… msg="…"`` — the Go/Heroku convention; the
  ``msg``/``message`` value is the message, quote-aware and
  unescaped, every other pair is metadata), and JSON-structured
  logs (the bunyan/pino/Kubernetes convention: one JSON object per
  line with at least two logging-staple keys — ``msg``/``message``
  is the message, ``level``/``severity`` classes it, everything
  else is metadata; a DATA jsonl file lacks the staples and stays
  on the tabular route);
- a non-blank line that matches NO header shape is a CONTINUATION
  (a traceback / wrapped message) and ATTACHES to the previous
  message with a single space — it never becomes its own message;
- blank lines vanish; per-message level/status classes aggregate to
  ``n_error`` / ``n_warn`` (ISO levels; CLF 5xx/4xx; syslog carries
  no severity in this layout → 0).

Detection is conservative (the loss-direction rule the md sniff
documents): at least three of the first twenty non-blank lines must
match a header shape AND headers must be the majority — prose never
clears that, while a traceback-heavy real log still does. Detection
runs BEFORE the tabular sniff: a tab-separated ISO log would
otherwise route 'csv' and flatten lossily.

Reference anchor: the reference has no log codec — north-star
LLM-pipeline surface (BASELINE.json); shapes per RFC 3164 (syslog),
NCSA httpd common log format, and the de-facto ISO-8601+level
application-log layout.
"""

from __future__ import annotations

import re

from . import web as _web

#: ISO application-log severity tokens, upper-case as emitted by
#: every mainstream logger; WARN-class and ERROR-class drive the
#: n_warn / n_error message counters
_WARN_LEVELS = frozenset({"WARN", "WARNING", "NOTICE"})
_ERROR_LEVELS = frozenset(
    {"ERROR", "ERR", "CRIT", "CRITICAL", "FATAL", "SEVERE"}
)
_LEVEL_ALT = (
    "TRACE|DEBUG|INFO|NOTICE|WARNING|WARN|ERROR|ERR|CRITICAL|CRIT"
    "|FATAL|SEVERE"
)

_SYSLOG_RE = re.compile(
    r"^(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
    r" [ \d]\d \d{2}:\d{2}:\d{2} \S+ [\w./-]+(?:\[\d+\])?: (.*)$"
)
_ISO_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d{1,6})?"
    r"(?:Z|[+-]\d{2}:?\d{2})?[ \t]+(" + _LEVEL_ALT + r")\b:?"
    r"[ \t]+(?:\[[^\]\n]*\][ \t]+)?(.*)$"
)
_CLF_RE = re.compile(
    r'^\S+ \S+ \S+ \[\d{2}/[A-Z][a-z]{2}/\d{4}'
    r':\d{2}:\d{2}:\d{2} [+-]\d{4}\] "([^"\n]*)" (\d{3}) (?:\d+|-)'
)
#: RFC 5424: <pri>VERSION TIMESTAMP HOST APP PROCID MSGID SD [MSG];
#: the '<pri>1 ' head is a magic in all but name
_SYSLOG5424_RE = re.compile(
    r"^<(\d{1,3})>\d \S+ \S+ \S+ \S+ \S+ "
    r"(?:-|\[[^\]\n]*\])(?: (.*))?$"
)
_LOGFMT_TOKEN_RE = re.compile(
    r'([A-Za-z_][\w.]*)=("(?:[^"\\\n]|\\.)*"|\S*)'
)
#: a line only reads as logfmt when k=v pairs cover it entirely,
#: there are at least two, and one key is a logging staple — prose
#: with a stray x=1 never clears this
_LOGFMT_STAPLES = frozenset(
    {"msg", "message", "level", "lvl", "ts", "time", "timestamp"}
)
_LOGFMT_ERROR_VALUES = frozenset(
    {"error", "err", "fatal", "crit", "critical", "panic"}
)
_LOGFMT_WARN_VALUES = frozenset({"warn", "warning"})


def _logfmt_parse(line: str):
    pos, n = 0, len(line)
    pairs: dict[str, str] = {}
    while pos < n:
        if line[pos] == " ":
            pos += 1
            continue
        m = _LOGFMT_TOKEN_RE.match(line, pos)
        if not m:
            return None
        pairs[m.group(1)] = m.group(2)
        pos = m.end()
        if pos < n and line[pos] != " ":
            return None
    if len(pairs) < 2 or not (_LOGFMT_STAPLES & set(pairs)):
        return None
    return pairs


def _logfmt_unquote(v: str) -> str:
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        return re.sub(r"\\(.)", r"\1", v[1:-1])
    return v


def _match_header(line: str):
    """``(dialect, message, level_class)`` for a header-shaped log
    line, else ``None``. ``level_class`` is '', 'warn', or
    'error'. A trailing CR is stripped up front: logs split on LF,
    and a Windows-origin logfmt line would otherwise fail the
    pairs-cover-the-line rule on its ``\\r`` (review finding)."""
    line = line.rstrip("\r")
    m = _ISO_RE.match(line)
    if m:
        lvl = m.group(1)
        cls = (
            "error"
            if lvl in _ERROR_LEVELS
            else "warn" if lvl in _WARN_LEVELS else ""
        )
        return "iso", m.group(2).rstrip(), cls
    m = _SYSLOG_RE.match(line)
    if m:
        return "syslog", m.group(2).rstrip(), ""
    m = _SYSLOG5424_RE.match(line)
    if m:
        sev = int(m.group(1)) & 7
        cls = "error" if sev <= 3 else "warn" if sev == 4 else ""
        return "syslog5424", (m.group(2) or "").rstrip(), cls
    m = _CLF_RE.match(line)
    if m:
        status = m.group(2)
        cls = (
            "error"
            if status[:1] == "5"
            else "warn" if status[:1] == "4" else ""
        )
        return "clf", m.group(1).rstrip(), cls
    s = line.strip()
    if s[:1] == "{" and s[-1:] == "}":
        import json as _json

        try:
            obj = _json.loads(s)
        except Exception:
            obj = None
        if (
            isinstance(obj, dict)
            and len((_LOGFMT_STAPLES | {"severity"}) & obj.keys())
            >= 2
        ):
            lvl = str(
                obj.get("level", obj.get("severity", ""))
            ).lower()
            cls = (
                "error"
                if lvl in _LOGFMT_ERROR_VALUES
                else "warn" if lvl in _LOGFMT_WARN_VALUES else ""
            )
            msg = obj.get("msg", obj.get("message", ""))
            if msg is None:
                msg = ""
            elif not isinstance(msg, str):
                msg = str(msg)
            return "jsonlog", msg.rstrip(), cls
    pairs = _logfmt_parse(line)
    if pairs is not None:
        lvl = _logfmt_unquote(
            pairs.get("level", pairs.get("lvl", ""))
        ).lower()
        cls = (
            "error"
            if lvl in _LOGFMT_ERROR_VALUES
            else "warn" if lvl in _LOGFMT_WARN_VALUES else ""
        )
        msg = _logfmt_unquote(
            pairs.get("msg", pairs.get("message", ""))
        )
        return "logfmt", msg.rstrip(), cls
    return None


def sniff_log(head: str) -> bool:
    """True when the head reads as a log file: among the first
    twenty non-blank lines at least THREE match a header shape and
    headers are the majority (continuation lines — tracebacks,
    wrapped messages — are expected minorities; prose never clears
    the bar)."""
    seen = hits = 0
    for line in head.split("\n"):
        if not line.strip():
            continue
        seen += 1
        if _match_header(line) is not None:
            hits += 1
        if seen >= 20:
            break
    return hits >= 3 and hits * 2 > seen


def log_to_text(src: str) -> str:
    """One log file → its message text (module docstring): header
    metadata drops, one line per MESSAGE, continuations attached
    with a single space. Raises typed errors for binary input and
    for content with no parseable header line at all (a routed log
    that parses to nothing is poison, not an empty document)."""
    return _log_scan(src)[0]


def log_line_stats(src: str) -> dict:
    """``{dialect, n_lines, n_messages, n_error, n_warn}`` for one
    log file — ``dialect`` is the first header's (real dumps mix;
    the first line names the family), counters per the module
    docstring."""
    return _log_scan(src)[1]


def _log_scan(src: str):
    if "\x00" in src:
        raise ValueError("log: binary bytes (NUL) in log text")
    messages: list[str] = []
    dialect = None
    n_lines = n_error = n_warn = 0
    for line in src.split("\n"):
        if not line.strip():
            continue
        n_lines += 1
        hit = _match_header(line)
        if hit is not None:
            d, msg, cls = hit
            if dialect is None:
                dialect = d
            messages.append(msg)
            if cls == "error":
                n_error += 1
            elif cls == "warn":
                n_warn += 1
        elif messages:
            messages[-1] = (
                messages[-1] + " " + line.strip()
            ).strip()
        else:
            # rotation slice: the file starts mid-message (the
            # previous shard holds its header) — the orphan tail
            # becomes its own message rather than poisoning the doc
            messages.append(line.strip())
    if dialect is None:
        raise ValueError("log: no parseable header lines")
    return "\n".join(messages), {
        "dialect": dialect,
        "n_lines": n_lines,
        "n_messages": len(messages),
        "n_error": n_error,
        "n_warn": n_warn,
    }


_CONTINUATION = "    at fixture.py:42, in run"
_ISO_LEVELS = ("INFO", "WARN", "ERROR")
_CLF_STATUS = (200, 404, 500)
#: RFC 5424 pri values cycling info/warn/error: facility 1 with
#: severity 6 (info) / 4 (warning) / 3 (err)
_PRI_CYCLE = (14, 12, 11)
_LOGFMT_LEVELS = ("info", "warn", "error")


def encode_log(
    units: list[str], doc_id: int = 0, dialect: str = "iso"
) -> bytes:
    """Fixture half: a real log file per unit list in one of three
    dialects —

    - ``syslog``: one RFC 3164-layout line per unit, the unit as
      the message (no severity in this layout);
    - ``iso``: one ISO-timestamp line per unit with the level
      cycling INFO/WARN/ERROR on the unit index and a ``[svc]``
      component token that must DROP; every ERROR line is followed
      by an indented continuation line that must ATTACH to its
      message (the traceback pin);
    - ``clf``: one NCSA access line per unit, the request target a
      ``-``-slug of the unit; the quoted request line is the
      message; status cycles 200/404/500 on the unit index;
    - ``syslog5424``: one RFC 5424 line per unit — version tag,
      five header fields and a structured-data element that must
      all VANISH, the pri cycling info/warning/err severities on
      the unit index (the ``pri & 7`` classing pin);
    - ``logfmt``: one k=v line per unit — ts/svc pairs that must
      VANISH, ``level`` cycling info/warn/error, and the unit
      inside a QUOTED ``msg`` value (the quote-aware unescape
      pin);
    - ``jsonlog``: one JSON object per unit — time/svc/pid members
      that must VANISH, ``level`` cycling, the unit under ``msg``
      (the JSON string round-trip pin)."""
    lines: list[str] = []
    for u, unit in enumerate(units):
        if dialect == "syslog":
            lines.append(
                "Jan  2 03:04:%02d host%d app[%d]: %s"
                % (u % 60, doc_id % 10, 100 + u, unit)
            )
        elif dialect == "iso":
            lvl = _ISO_LEVELS[u % 3]
            lines.append(
                "2024-01-01T00:00:%02dZ %s [svc] %s"
                % (u % 60, lvl, unit)
            )
            if lvl == "ERROR":
                lines.append(_CONTINUATION)
        elif dialect == "clf":
            lines.append(
                '192.0.2.%d - frank [01/Jan/2024:00:00:%02d +0000]'
                ' "GET /%s HTTP/1.1" %d %d'
                % (
                    doc_id % 256,
                    u % 60,
                    unit.replace(" ", "-"),
                    _CLF_STATUS[u % 3],
                    123 + u,
                )
            )
        elif dialect == "syslog5424":
            lines.append(
                "<%d>1 2024-01-01T00:00:%02dZ host%d app %d ID%d "
                '[sd@32473 k="v"] %s'
                % (_PRI_CYCLE[u % 3], u % 60, doc_id % 10,
                   1000 + u, u, unit)
            )
        elif dialect == "logfmt":
            lines.append(
                'ts=2024-01-01T00:00:%02dZ level=%s svc=api '
                'msg="%s"'
                % (u % 60, _LOGFMT_LEVELS[u % 3], unit)
            )
        elif dialect == "jsonlog":
            import json as _json

            lines.append(
                _json.dumps(
                    {
                        "time": "2024-01-01T00:00:%02dZ" % (u % 60),
                        "level": _LOGFMT_LEVELS[u % 3],
                        "svc": "api",
                        "pid": 1000 + u,
                        "msg": unit,
                    },
                    separators=(",", ":"),
                )
            )
        else:
            raise ValueError(f"encode_log: unknown dialect {dialect!r}")
    return "\n".join(lines).encode("utf-8")


def log_expected_text(
    units: list[str], doc_id: int = 0, dialect: str = "iso"
) -> str:
    """The exact text :func:`log_to_text` extracts from
    :func:`encode_log`: one line per unit — the unit itself
    (syslog, syslog5424, logfmt, jsonlog), the unit with the
    continuation attached on ERROR lines (iso), or the rebuilt
    request line (clf)."""
    out: list[str] = []
    for u, unit in enumerate(units):
        if dialect == "iso" and u % 3 == 2:
            out.append((unit + " " + _CONTINUATION.strip()).strip())
        elif dialect == "clf":
            out.append(
                "GET /%s HTTP/1.1" % unit.replace(" ", "-")
            )
        else:
            out.append(unit)
    return "\n".join(out)


def log_expected_stats(
    units: list[str], dialect: str = "iso"
) -> dict:
    """Closed-form expected counters for :func:`encode_log` (the
    writer's level/status cycle)."""
    n = len(units)
    n_err = sum(1 for u in range(n) if u % 3 == 2)
    n_wrn = sum(1 for u in range(n) if u % 3 == 1)
    if dialect == "syslog":
        return {
            "dialect": dialect,
            "n_lines": n,
            "n_messages": n,
            "n_error": 0,
            "n_warn": 0,
        }
    if dialect == "iso":
        return {
            "dialect": dialect,
            "n_lines": n + n_err,
            "n_messages": n,
            "n_error": n_err,
            "n_warn": n_wrn,
        }
    if dialect in ("clf", "syslog5424", "logfmt", "jsonlog"):
        return {
            "dialect": dialect,
            "n_lines": n,
            "n_messages": n,
            "n_error": n_err,
            "n_warn": n_wrn,
        }
    raise ValueError(f"log_expected_stats: unknown dialect {dialect!r}")


LOG_FEATURES_SCHEMA = (
    "doc_id bigint, dialect string, n_lines int, n_messages int, "
    "n_error int, n_warn int, text string, ok boolean, err string"
)

#: deterministic poison blob for the gate's quarantine rows: NUL
#: bytes make it binary garbage no dialect parses
POISON_LOG = b"\x1b[31m\x00corrupt binary log\x00tail"


def synthesize_log_from_text(
    df, text="text", id_col="doc_id", units_mod=3, poison_mod=0
):
    """Deterministic synthetic log corpus for the corpus gate: per
    doc ``1 + len(text) % units_mod`` units (words round-robin,
    clamped), rendered through :func:`encode_log` with the dialect
    rotating on ``doc_id % 6`` (syslog / iso / clf / syslog5424 /
    logfmt / jsonlog). With
    ``poison_mod=k`` every doc where ``doc_id % k == 7`` is
    replaced by :data:`POISON_LOG` (the typed-quarantine pin).
    Input normalization (mirrored in the oracle): quotes, brackets
    and backslash → ``-`` (line-grammar characters), the shared
    divergent set → ``-``, whitespace runs → one space. Returns
    ``(doc_id, n_units, media binary)``."""

    def synth(batches):
        import pandas as pd

        for b in batches:
            ids, nus, medias = [], [], []
            for did, t in zip(b[id_col], b[text]):
                did = int(did)
                t = (t or "").translate(_web.SYNTH_DIVERGENT_TABLE)
                t = re.sub(r"[\"\[\]\\\\]", "-", t)
                t = re.sub(r"\s+", " ", t, flags=re.ASCII).strip()
                n = 1 + len(t) % int(units_mod)
                words = t.split(" ")
                n = min(n, len(words))
                units = [" ".join(words[i::n]) for i in range(n)]
                ids.append(did)
                nus.append(n)
                if poison_mod and did % poison_mod == 7:
                    medias.append(POISON_LOG)
                else:
                    medias.append(
                        encode_log(
                            units,
                            did,
                            (
                                "syslog", "iso", "clf",
                                "syslog5424", "logfmt", "jsonlog",
                            )[did % 6],
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "n_units": nus, "media": medias}
            )

    return df.select(id_col, text).mapInPandas(
        synth, schema="doc_id bigint, n_units int, media binary"
    )


def log_text_features(df, id_col="doc_id", media_col="media"):
    """Extract log files into typed rows (``doc_id, dialect,
    n_lines, n_messages, n_error, n_warn, text, ok, err``) with
    per-document quarantine; extraction runs where the blob
    lives."""

    def extract(batches):
        import pandas as pd

        for b in batches:
            rows = []
            for did, raw in zip(b[id_col], b[media_col]):
                try:
                    data = bytes(raw) if raw is not None else b""
                    src = data.decode("utf-8", "replace")
                    text, st = _log_scan(src)
                    rows.append(
                        (
                            did,
                            st["dialect"],
                            st["n_lines"],
                            st["n_messages"],
                            st["n_error"],
                            st["n_warn"],
                            text,
                            True,
                            None,
                        )
                    )
                except Exception as e:
                    rows.append(
                        (did, None, None, None, None, None, None,
                         False, str(e))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "dialect", "n_lines", "n_messages",
                    "n_error", "n_warn", "text", "ok", "err",
                ],
            )

    return df.select(id_col, media_col).mapInPandas(
        extract, schema=LOG_FEATURES_SCHEMA
    )
