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


def loads(text: str):
    """Parse one EDN value from ``text`` (trailing whitespace ok)."""
    val, pos = _read(text, 0)
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


def _read(s: str, i: int):
    i = _skip_ws(s, i)
    if i >= len(s):
        raise EdnError("unexpected end of input")
    c = s[i]
    if c == "{":
        return _read_map(s, i + 1)
    if c in "([":
        return _read_seq(s, i + 1, _DELIMS[c])
    if c == "#":
        if s.startswith("#{", i):
            items, j = _read_seq(s, i + 2, "}")
            try:
                return set(items), j
            except TypeError:  # unhashable members → frozen repr list
                return items, j
        raise EdnError(f"unsupported dispatch at {i}: {s[i:i+10]!r}")
    if c == '"':
        return _read_string(s, i + 1)
    return _read_atom(s, i)


def _read_seq(s: str, i: int, closer: str):
    items = []
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise EdnError(f"unterminated sequence, expected {closer!r}")
        if s[i] == closer:
            return items, i + 1
        val, i = _read(s, i)
        items.append(val)


def _read_map(s: str, i: int):
    out = {}
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise EdnError("unterminated map")
        if s[i] == "}":
            return out, i + 1
        k, i = _read(s, i)
        i = _skip_ws(s, i)
        if i >= len(s) or s[i] == "}":
            raise EdnError("map with odd number of forms")
        v, i = _read(s, i)
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
    if val is None:
        return "nil"
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
