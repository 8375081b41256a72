#!/usr/bin/env python
"""Regenerate the README "Driver-gate rotation status" section from
the CORRECTNESS_r*.json artifacts + the live registry order, so the
rotation state (which query is driver-proven in which round, which
are still gate_sim-only) is self-documenting instead of living in
ROUNDLOG prose.

Usage: python scripts/rotation_status.py        # rewrites README.md
       python scripts/rotation_status.py --print  # stdout only
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- rotation-status:begin -->"
END = "<!-- rotation-status:end -->"


def build_section() -> str:
    from datasplash_spark import queries as Q

    latest_green: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        rounds.append(rnd)
        data = json.load(open(path))
        entries = data.get("queries") or data
        for name, row in entries.items():
            if not isinstance(row, dict):
                continue
            # driver-green = full hash match; a no_oracle row with a
            # successful Spark run counts as the (weaker, by-design)
            # rows-only driver row
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            rows_only_ok = (
                row.get("err") == "no_oracle"
                and (row.get("spark_rows") or 0) >= 0
                and row.get("spark_rows") is not None
            )
            if green or rows_only_ok:
                latest_green[name] = max(latest_green.get(name, 0), rnd)

    names = list(Q.queries())
    rows_only = Q.rows_only()
    window = set(names[:50])
    latest_round = max(rounds) if rounds else 0

    buckets: dict[str, list[str]] = {}
    for name in names:
        if name in rows_only:
            proven = latest_green.get(name)
            tag = (
                f"rows-only by design (r{proven} driver row)"
                if proven
                else "rows-only by design (no driver row yet)"
            )
        elif name not in latest_green:
            tag = "gate_sim-only (never driver-gated)"
        else:
            tag = f"driver-green r{latest_green[name]}"
        buckets.setdefault(tag, []).append(name)

    lines = [
        BEGIN,
        "",
        "## Driver-gate rotation status",
        "",
        "The external driver checks the FIRST 50 registry entries per",
        "round; the registry rotates so every query earns a driver-green",
        "`CORRECTNESS_r{N}.json` row over consecutive rounds. Generated",
        f"by `scripts/rotation_status.py` from rounds {rounds} — regenerate",
        "after each round's artifacts land.",
        "",
        "| Status | Rounds since driver row | Queries |",
        "| --- | --- | --- |",
    ]
    for tag in sorted(buckets, reverse=True):
        qnames = buckets[tag]
        m = re.search(r"r(\d+)(?: driver row)?\)?$", tag)
        stale = (
            str(latest_round - int(m.group(1)))
            if m
            else ("n/a" if "never" in tag or "no driver" in tag else "—")
        )
        shown = ", ".join(
            f"`{n}`" + (" *(in current window)*" if n in qnames and n in window and "never" in tag else "")
            for n in qnames
        )
        lines.append(f"| {tag} ({len(qnames)}) | {stale} | {shown} |")
    in_window_unproven = [
        n for n in names[:50] if n not in latest_green and n not in rows_only
    ]
    lines += [
        "",
        f"Current window (positions 1–50) contains every query not yet "
        f"driver-proven on current code; {len(in_window_unproven)} of them "
        f"have never had a driver row and will earn one in round "
        f"{latest_round + 1}: "
        + ", ".join(f"`{n}`" for n in in_window_unproven)
        + ".",
        "",
        END,
    ]
    return "\n".join(lines)


def main() -> int:
    section = build_section()
    if "--print" in sys.argv:
        print(section)
        return 0
    readme_path = os.path.join(REPO, "README.md")
    readme = open(readme_path).read()
    if BEGIN in readme:
        readme = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END),
            lambda _: section,
            readme,
            flags=re.S,
        )
    else:
        readme = readme.rstrip() + "\n\n" + section + "\n"
    open(readme_path, "w").write(readme)
    print("README.md rotation-status section updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
