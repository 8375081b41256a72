"""Minimal EDN codec (pure Python, no deps).

The reference reads/writes EDN — Clojure's data notation — as its
native line format (``read-edn-file`` /root/reference/src/clj/
datasplash/core.clj:1334-1378, ``write-edn-file`` 1380-1394,
``to-edn``/``pr-str`` 810-816). Python has no stdlib EDN, so this
module implements the subset the reference's tests exercise: nil,
booleans, integers, floats, strings, keywords, symbols, vectors,
lists, sets, and maps (nested arbitrarily).

Mapping EDN → Python: keywords become ``":name"`` strings (keeping
the colon so round-trips are lossless), maps → dict, vectors/lists →
list, sets → set, nil → None.

Tagged literals (clojure.edn reads these by default — read-edn-file
inherits them, core.clj:1334-1378): ``#inst`` → timezone-aware
``datetime`` (UTC), ``#uuid`` → ``uuid.UUID``, ``#_`` discards the
next form. Other tags go through ``loads(..., readers={tag: fn})``,
then ``default=fn(tag, value)`` — mirroring clojure.edn's
``:readers`` / ``:default`` options — else raise. Unhandled-by-
default tags can round-trip via the :class:`Tagged` record.

Used by the EDN IO in ``datasplash_spark.sources`` via Arrow-batched
UDFs — parsing is the slow path by design; columnar formats stay the
recommendation (SURVEY §2.2).
"""

from __future__ import annotations

_WS = set(" \t\n\r,")
_DELIMS = {"(": ")", "[": "]", "{": "}"}
_STR_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}
_OUT_ESCAPES = {"\n": "\\n", "\t": "\\t", "\r": "\\r", '"': '\\"', "\\": "\\\\"}


class EdnError(ValueError):
    pass


class Tagged:
    """An EDN tagged literal preserved verbatim: ``#tag value``."""

    __slots__ = ("tag", "value")

    def __init__(self, tag: str, value):
        self.tag = tag
        self.value = value

    def __eq__(self, other):
        return (
            isinstance(other, Tagged)
            and self.tag == other.tag
            and self.value == other.value
        )

    def __hash__(self):
        return hash((self.tag, repr(self.value)))

    def __repr__(self):  # pragma: no cover
        return f"Tagged({self.tag!r}, {self.value!r})"


def _read_inst(s: str):
    import datetime as _dt

    if not isinstance(s, str):
        raise EdnError(f"#inst expects a string, got {type(s).__name__}")
    iso = s[:-1] + "+00:00" if s.endswith("Z") else s
    try:
        d = _dt.datetime.fromisoformat(iso)
    except ValueError as e:
        raise EdnError(f"bad #inst {s!r}: {e}") from None
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return d.astimezone(_dt.timezone.utc)


def _read_uuid(s: str):
    import uuid as _uuid

    if not isinstance(s, str):
        raise EdnError(f"#uuid expects a string, got {type(s).__name__}")
    try:
        return _uuid.UUID(s)
    except ValueError as e:
        raise EdnError(f"bad #uuid {s!r}: {e}") from None


#: built-in tag readers, as in clojure.edn (#inst and #uuid always on)
_BUILTIN_READERS = {"inst": _read_inst, "uuid": _read_uuid}


def loads(text: str, readers: dict | None = None, default=None):
    """Parse one EDN value from ``text`` (trailing whitespace ok).

    ``readers`` maps tag name → fn(value); ``default`` is
    fn(tag, value) for tags with no reader (use ``Tagged`` to keep
    them round-trippable). Unknown tags without a default raise."""
    ctx = (readers or {}, default)
    val, pos = _read(text, 0, ctx)
    pos = _skip_ws(text, pos)
    if pos != len(text):
        raise EdnError(f"trailing data at {pos}: {text[pos:pos+20]!r}")
    return val


def _skip_ws(s: str, i: int) -> int:
    while i < len(s):
        if s[i] in _WS:
            i += 1
        elif s[i] == ";":  # comment to end of line
            while i < len(s) and s[i] != "\n":
                i += 1
        else:
            break
    return i


_NO_CTX = ({}, None)


def _read(s: str, i: int, ctx=_NO_CTX):
    i = _skip_ws(s, i)
    if i >= len(s):
        raise EdnError("unexpected end of input")
    c = s[i]
    if c == "{":
        return _read_map(s, i + 1, ctx)
    if c in "([":
        return _read_seq(s, i + 1, _DELIMS[c], ctx)
    if c == "#":
        if s.startswith("#{", i):
            items, j = _read_seq(s, i + 2, "}", ctx)
            try:
                return set(items), j
            except TypeError:  # unhashable members → frozen repr list
                return items, j
        if s.startswith("#_", i):  # discard next form
            _, j = _read(s, i + 2, ctx)
            return _read(s, j, ctx)
        return _read_tagged(s, i + 1, ctx)
    if c == '"':
        return _read_string(s, i + 1)
    return _read_atom(s, i)


def _read_tagged(s: str, i: int, ctx):
    j = i
    while j < len(s) and s[j] not in _WS and s[j] not in ')]}"#':
        j += 1
    tag = s[i:j]
    if not tag or not (tag[0].isalpha()):
        raise EdnError(f"bad dispatch at {i - 1}: {s[i - 1:i + 10]!r}")
    val, j = _read(s, j, ctx)
    readers, default = ctx
    fn = readers.get(tag) or _BUILTIN_READERS.get(tag)
    if fn is not None:
        return fn(val), j
    if default is not None:
        return default(tag, val), j
    raise EdnError(f"no reader for tag #{tag}")


def _read_seq(s: str, i: int, closer: str, ctx=_NO_CTX):
    items = []
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise EdnError(f"unterminated sequence, expected {closer!r}")
        if s[i] == closer:
            return items, i + 1
        val, i = _read(s, i, ctx)
        items.append(val)


def _read_map(s: str, i: int, ctx=_NO_CTX):
    out = {}
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise EdnError("unterminated map")
        if s[i] == "}":
            return out, i + 1
        k, i = _read(s, i, ctx)
        i = _skip_ws(s, i)
        if i >= len(s) or s[i] == "}":
            raise EdnError("map with odd number of forms")
        v, i = _read(s, i, ctx)
        if isinstance(k, (list, dict, set)):
            k = _freeze(k)
        out[k] = v


def _freeze(v):
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, set):
        return frozenset(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted(((_freeze(k), _freeze(x)) for k, x in v.items())))
    return v


def _read_string(s: str, i: int):
    out = []
    while i < len(s):
        c = s[i]
        if c == "\\":
            if i + 1 >= len(s):
                raise EdnError("dangling escape")
            esc = s[i + 1]
            out.append(_STR_ESCAPES.get(esc, esc))
            i += 2
        elif c == '"':
            return "".join(out), i + 1
        else:
            out.append(c)
            i += 1
    raise EdnError("unterminated string")


def _read_atom(s: str, i: int):
    j = i
    while j < len(s) and s[j] not in _WS and s[j] not in ")]}":
        j += 1
    tok = s[i:j]
    if not tok:
        raise EdnError(f"empty token at {i}")
    if tok == "nil":
        return None, j
    if tok == "true":
        return True, j
    if tok == "false":
        return False, j
    if tok[0] == ":":
        return tok, j  # keyword, kept with leading colon
    try:
        return int(tok), j
    except ValueError:
        pass
    try:
        return float(tok), j
    except ValueError:
        pass
    return tok, j  # bare symbol → string


def dumps(val) -> str:
    """Serialize a Python value to EDN (``pr-str`` analog)."""
    import datetime as _dt
    import uuid as _uuid

    if val is None:
        return "nil"
    if isinstance(val, Tagged):
        return f"#{val.tag} {dumps(val.value)}"
    if isinstance(val, _dt.datetime):
        d = (
            val.astimezone(_dt.timezone.utc)
            if val.tzinfo is not None
            else val.replace(tzinfo=_dt.timezone.utc)
        )
        # Clojure's #inst print format: millis precision, -00:00 zone
        return f'#inst "{d.strftime("%Y-%m-%dT%H:%M:%S")}.{d.microsecond // 1000:03d}-00:00"'
    if isinstance(val, _dt.date):
        return f'#inst "{val.isoformat()}T00:00:00.000-00:00"'
    if isinstance(val, _uuid.UUID):
        return f'#uuid "{val}"'
    if val is True:
        return "true"
    if val is False:
        return "false"
    if isinstance(val, str):
        if val.startswith(":"):
            return val  # keyword round-trip
        return '"' + "".join(_OUT_ESCAPES.get(c, c) for c in val) + '"'
    if isinstance(val, (int, float)):
        return repr(val)
    if isinstance(val, (list, tuple)):
        return "[" + " ".join(dumps(v) for v in val) + "]"
    if isinstance(val, (set, frozenset)):
        return "#{" + " ".join(dumps(v) for v in sorted(val, key=repr)) + "}"
    if isinstance(val, dict):
        return (
            "{"
            + " ".join(f"{dumps(k)} {dumps(v)}" for k, v in val.items())
            + "}"
        )
    raise EdnError(f"cannot serialize {type(val).__name__}")
