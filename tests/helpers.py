"""Test-suite shim over the SHIPPED testing API: the PAssert-style
assertion surface now lives in ``datasplash_spark.testing`` (the
user-facing analog of the reference's datasplash.testing namespace,
testing/assert.clj:16-105); the suite consumes the same functions a
user would.
"""

from __future__ import annotations

from datasplash_spark.testing import (  # noqa: F401
    as_map,
    as_multimap,
    contains_only,
    equals_to,
    is_empty,
    rows_multiset,
    satisfies,
)
