"""Datastore data-model conversion (the SURVEY-scoped slice).

The reference converts Google Datastore ``Entity``/``Value`` protos
↔ Clojure maps (/root/reference/src/clj/datasplash/datastore.clj:
44-176): INTEGER, DOUBLE, STRING, BOOLEAN, BLOB, ARRAY, nested
ENTITY, TIMESTAMP, GEO_POINT, NULL; entity key/kind/namespace/path
ride in metadata (datastore.clj:73-94). Per SURVEY §2.2, the IO
itself is out of scope (no mainstream Spark connector); the
*data-model conversion* is what carries over.

Without the GCP proto classes, the wire shape here is the JSON form
of a Datastore entity (the REST/export representation):
``{"key": {...}, "properties": {name: {"<type>Value": ...}}}`` —
the same tagged-union type system as the proto. Conversions are pure
and symmetric, suitable for `mapInPandas` over an export dump
(Datastore backups are entity-JSON), with key/kind/namespace carried
as explicit fields rather than Clojure metadata (Python dicts have
no meta).
"""

from __future__ import annotations

import base64
import datetime as _dt
from typing import Any

_SENTINELS = ("__key__", "__kind__", "__namespace__", "__path__")


class DatastoreError(ValueError):
    pass


def value_to_py(v: dict) -> Any:
    """Tagged Datastore value → Python (value->clj analog,
    datastore.clj:59-67)."""
    if not isinstance(v, dict):
        raise DatastoreError(f"expected tagged value dict, got {type(v).__name__}")
    if "nullValue" in v:
        return None
    if "integerValue" in v:
        return int(v["integerValue"])
    if "doubleValue" in v:
        return float(v["doubleValue"])
    if "stringValue" in v:
        return v["stringValue"]
    if "booleanValue" in v:
        return bool(v["booleanValue"])
    if "blobValue" in v:
        return base64.b64decode(v["blobValue"])
    if "timestampValue" in v:
        ts = v["timestampValue"]
        return _dt.datetime.fromisoformat(ts.replace("Z", "+00:00"))
    if "geoPointValue" in v:
        g = v["geoPointValue"]
        return (float(g.get("latitude", 0.0)), float(g.get("longitude", 0.0)))
    if "arrayValue" in v:
        return [value_to_py(x) for x in v["arrayValue"].get("values", [])]
    if "entityValue" in v:
        return entity_to_py(v["entityValue"])
    raise DatastoreError(f"Datastore type not supported: {sorted(v)}")


def py_to_value(v: Any) -> dict:
    """Python → tagged Datastore value (make-ds-value-builder analog,
    datastore.clj:96-129). Sets/tuples → arrays, dicts → nested
    entities, keywords-as-':str' → strings."""
    if v is None:
        return {"nullValue": None}
    if isinstance(v, bool):  # before int: bool is an int subclass
        return {"booleanValue": v}
    if isinstance(v, int):
        return {"integerValue": str(v)}
    if isinstance(v, float):
        return {"doubleValue": v}
    if isinstance(v, str):
        return {"stringValue": v[1:] if v.startswith(":") else v}
    if isinstance(v, bytes):
        return {"blobValue": base64.b64encode(v).decode("ascii")}
    if isinstance(v, _dt.datetime):
        return {"timestampValue": v.isoformat()}
    if isinstance(v, (list, tuple)):
        return {"arrayValue": {"values": [py_to_value(x) for x in v]}}
    if isinstance(v, (set, frozenset)):
        return {
            "arrayValue": {"values": [py_to_value(x) for x in sorted(v, key=repr)]}
        }
    if isinstance(v, dict):
        return {"entityValue": py_to_entity(v)}
    raise DatastoreError(f"cannot convert {type(v).__name__} to a Datastore value")


def entity_to_py(e: dict) -> dict:
    """Entity → plain dict (entity->clj analog, datastore.clj:73-94):
    properties flatten to keys; key name/kind/namespace/ancestor path
    land in ``__key__``/``__kind__``/``__namespace__``/``__path__``."""
    out = {name: value_to_py(val) for name, val in e.get("properties", {}).items()}
    key = e.get("key")
    if key:
        # id-keys come back as int, name-keys as str — py_to_entity
        # re-emits int keys as "id" and str keys as "name", so the
        # round trip preserves the Datastore identity kind
        path = [
            {
                "kind": p.get("kind"),
                "key": p["name"] if "name" in p else int(p["id"]),
            }
            for p in key.get("path", [])
        ]
        if path:
            out["__kind__"] = path[-1]["kind"]
            out["__key__"] = path[-1]["key"]
            if path[:-1]:
                out["__path__"] = path[:-1]
        ns = key.get("partitionId", {}).get("namespaceId")
        if ns:
            out["__namespace__"] = ns
    return out


def py_to_entity(
    d: dict,
    kind: str | None = None,
    key_name: Any = None,
    namespace: str | None = None,
) -> dict:
    """dict → Entity (make-ds-entity analog, datastore.clj:131-176).
    ``__kind__``/``__key__``/``__namespace__``/``__path__`` fields (or
    the explicit kwargs, which win) become the entity key."""
    kind = kind or d.get("__kind__")
    key_name = key_name if key_name is not None else d.get("__key__")
    namespace = namespace or d.get("__namespace__")
    path_prefix = d.get("__path__") or []
    props = {
        k: py_to_value(v) for k, v in d.items() if k not in _SENTINELS
    }
    out: dict = {"properties": props}
    def _path_elem(k: str, name_or_id) -> dict:
        if name_or_id is None:
            return {"kind": k}
        if isinstance(name_or_id, int):
            return {"kind": k, "id": str(name_or_id)}
        return {"kind": k, "name": name_or_id}

    if kind is not None:
        key: dict = {
            "path": [
                *[_path_elem(p["kind"], p["key"]) for p in path_prefix],
                _path_elem(kind, key_name),
            ]
        }
        if namespace:
            key["partitionId"] = {"namespaceId": namespace}
        out["key"] = key
    return out
