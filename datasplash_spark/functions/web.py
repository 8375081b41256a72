"""Web-corpus curation operators: URL parsing, canonicalization,
host-level aggregation, and host/path filtering — the FIRST stage of
a web-scale pipeline (RefinedWeb, C4, CCNet all lead with URL-level
filtering before any text is read) — LLM-data-pipeline extensions
(BASELINE.json north_star).

Design for 100 TB:

- Parsing/normalization are regexp + array expressions in one
  stateless codegen'd scan — no Python, no shuffle, no UDF.
- :func:`host_stats` reduces to a hosts-sized table (one partial-agg
  groupBy on the extracted host — text never shuffles).
- :func:`url_filter` is a broadcast-set membership check (blocklists
  are list-sized, never corpus-sized).

Engine mirror: everything is regexp_extract / string_split /
list_filter / list_sort — DuckDB mirrors each step 1:1, so the
oracle SQL is a direct transliteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.elementwise import ColumnLike, _col

#: Query parameters that carry tracking state, never content — the
#: standard strip set (utm_* per Google's campaign spec, click ids).
TRACKING_PARAM_REGEX = r"^(utm_[a-z]+|fbclid|gclid|ref)="

#: the core-entity decode table shared by the Column pipeline here
#: and the kernel-side mirror (functions/doctext.py). ``&amp;`` is
#: decoded LAST so escaped markup (``&amp;lt;``) is not
#: double-decoded (review finding).
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def decode_entities_py(s: str) -> str:
    """Kernel-side core-entity decode — the ONE copy of the shared
    table walk (``&amp;`` deliberately last) the text extractors
    use (round-12 review: three modules had inlined it)."""
    for ent, rep in HTML_ENTITIES:
        s = s.replace(ent, rep)
    return s


#: Characters the modality extraction kernels drop or strip but the
#: synthesizers' ``re.ASCII``-flagged normalization would keep
#: (ADVICE r12, verified by fuzzing): NUL (CommonMark-inspired
#: inline handling drops it) plus every non-ASCII character Python
#: ``str.strip()`` considers whitespace (U+0085, U+00A0, U+1680,
#: U+2000-U+200A, U+2028/29, U+202F, U+205F, U+3000). The
#: markdown/wikitext/subtitle synthesizer normalizations AND their
#: DuckDB oracles replace these alongside the per-format special
#: characters, so extracted text stays exactly SQL-replayable on ANY
#: corpus, not just ASCII ones.
SYNTH_DIVERGENT_CHARS = (
    "\x00\x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)

#: the same replacement as a str.translate table (kernel-side use).
SYNTH_DIVERGENT_TABLE = str.maketrans(
    {c: "-" for c in SYNTH_DIVERGENT_CHARS}
)

#: the same set as an RE2 character-class FRAGMENT for the DuckDB
#: oracles (standard SQL strings pass backslashes through to RE2;
#: spliced into the oracles' special-character classes via a
#: ``@DIVERGENT@`` placeholder).
SYNTH_DIVERGENT_RE2 = (
    "\\x{0}\\x{85}\\x{A0}\\x{1680}\\x{2000}-\\x{200A}"
    "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}"
)


def collapse_extracted_whitespace(s: str) -> str:
    """The extractors' shared whitespace contract, one copy:
    horizontal runs → one space, blank-line runs → one newline, no
    edge whitespace."""
    import re as _re

    s = _re.sub(r"[ \t\r\f]+", " ", s)
    s = _re.sub(r" ?\n ?", "\n", s)
    s = _re.sub(r"\n{2,}", "\n", s)
    return s.strip()

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_scheme(url: ColumnLike) -> Column:
    """Lowercased scheme ('' when the URL has none)."""
    return F.lower(F.regexp_extract(_col(url), _SCHEME_RE, 1))


def url_host(url: ColumnLike) -> Column:
    """Lowercased host (authority) — '' when absent. Ports are part
    of the authority and preserved; registrable-domain reduction is
    a suffix-list problem out of scope here."""
    return F.lower(F.regexp_extract(_col(url), _HOST_RE, 1))


def url_path(url: ColumnLike) -> Column:
    """Path component, case-preserved ('' when absent)."""
    return F.regexp_extract(_col(url), _PATH_RE, 1)


def url_query(url: ColumnLike) -> Column:
    """Raw query string without the '?' ('' when absent; fragment
    excluded)."""
    return F.regexp_extract(_col(url), _QUERY_RE, 1)


def normalize_url(url: ColumnLike) -> Column:
    """Canonical URL for dedup keys and blocklist joins: lowercase
    scheme+host, keep the path verbatim, DROP the fragment, strip
    tracking parameters (:data:`TRACKING_PARAM_REGEX`), and SORT the
    surviving query parameters so param order never splits a dup
    group. Pure Column — regexp + split + filter + sort_array +
    rejoin in one scan.

    Inputs that don't parse (no ``scheme://host``) pass through
    VERBATIM — collapsing every malformed URL to an empty canonical
    form would silently merge them into one dedup group.

    Reference anchor: no analog in datasplash; web-curation
    extension surface (BASELINE.json north_star).
    """
    c = _col(url)
    params = F.filter(
        F.split(url_query(c), "&", -1),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
    )
    q = F.array_join(F.sort_array(params), "&")
    canon = F.concat(
        url_scheme(c),
        F.lit("://"),
        url_host(c),
        url_path(c),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(url_host(c) != "", canon).otherwise(c)


def host_stats(
    df: DataFrame,
    url: ColumnLike = "url",
    text: ColumnLike = "text",
) -> DataFrame:
    """Per-host corpus profile: ``(host, n_docs, n_urls, total_chars)``
    — the table a curation team eyeballs to build block/allow lists.
    One partial-agg groupBy on the extracted host; text lengths
    reduce map-side, document text never shuffles."""
    return (
        df.select(
            url_host(url).alias("host"),
            normalize_url(url).alias("_nu"),
            F.length(_col(text)).cast("long").alias("_chars"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("_nu").alias("n_urls"),
            F.sum("_chars").alias("total_chars"),
        )
    )


def url_filter(
    df: DataFrame,
    blocked_hosts: list[str] | None = None,
    blocked_path_terms: list[str] | None = None,
    url: ColumnLike = "url",
    blocked_host_suffixes: list[str] | None = None,
) -> DataFrame:
    """URL-level admission (the RefinedWeb first gate): drop rows
    whose host is blocklisted (exact, or — via
    ``blocked_host_suffixes`` — any subdomain: 'spam.com' blocks
    'a.spam.com' and 'spam.com' but NOT 'notspam.com') or whose
    lowercased path contains any blocked term. Adds ``keep``
    (boolean) and ``drop_reason`` ('host' | 'path' | NULL) instead
    of filtering, so the caller can audit the funnel;
    ``.where("keep")`` applies it. Blocklists are broadcast
    literals — no join, no shuffle."""
    hosts = [h.lower() for h in (blocked_hosts or [])]
    suffixes = [s.lower().lstrip(".") for s in (blocked_host_suffixes or [])]
    terms = [t.lower() for t in (blocked_path_terms or [])]
    h = url_host(url)
    p = F.lower(url_path(url))
    host_hit = (
        h.isin(hosts) if hosts else F.lit(False)
    )
    for s in suffixes:
        host_hit = host_hit | (h == s) | h.endswith("." + s)
    path_hit = F.lit(False)
    for t in terms:
        path_hit = path_hit | p.contains(t)
    reason = (
        F.when(host_hit, F.lit("host"))
        .when(path_hit, F.lit("path"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        "*", reason.isNull().alias("keep"), reason.alias("drop_reason")
    )


def html_extract(html: ColumnLike) -> dict[str, Column]:
    """Regexp-based HTML main-content extraction — the decisive first
    text pass of a web-crawl pipeline (C4/RefinedWeb strip markup
    before any quality scoring), built entirely from JVM regexp
    expressions so it runs inside the codegen'd scan stage with no
    Python and no shuffle:

    1. drop ``<script>``/``<style>``/``<!-- -->`` blocks wholesale
       (their CONTENT is never corpus text),
    2. capture ``<title>`` before stripping,
    3. convert block-level closers to newlines (paragraph structure
       survives for the downstream line/paragraph dedup passes),
    4. strip every remaining tag, decode the five core entities +
       numeric references are left intact (a full entity table is a
       kernel-slot concern), collapse runs of whitespace.

    Returns ``{"title", "text", "n_tags", "n_links"}`` Columns.
    Regexp-based extraction is deliberate: at 100 TB a DOM parse per
    document is a Python-kernel cost (and trafilatura-class recall
    needs one — that plugs into the mapInPandas slot); the regexp
    pass is the cheap high-precision bulk path the big public
    pipelines actually ship."""
    h = _col(html)
    # 1. script/style/comment blocks (dotall via (?s), case-insensitive)
    cleaned = F.regexp_replace(
        h, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " "
    )
    cleaned = F.regexp_replace(cleaned, r"(?s)<!--.*?-->", " ")
    title = F.regexp_extract(cleaned, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    n_tags = F.size(
        F.regexp_extract_all(h, F.lit(r"(?s)<[A-Za-z/!][^>]*>"), F.lit(0))
    ).cast("long")
    n_links = F.size(
        F.regexp_extract_all(h, F.lit(r"(?is)<a\s[^>]*href"), F.lit(0))
    ).cast("long")
    # 3. block closers -> newline, then 4. strip tags
    blocky = F.regexp_replace(
        cleaned,
        r"(?i)</(p|div|h[1-6]|li|tr|br|section|article)\s*>|<br\s*/?>",
        "\n",
    )
    text = F.regexp_replace(blocky, r"(?s)<[A-Za-z/!][^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        text = F.replace(text, F.lit(ent), F.lit(rep))
    # collapse horizontal whitespace, keep the paragraph newlines
    text = F.regexp_replace(text, r"[ \t\r\f]+", " ")
    text = F.regexp_replace(text, r" ?\n ?", "\n")
    text = F.regexp_replace(text, r"\n{2,}", "\n")
    return {
        "title": F.trim(title),
        "text": F.trim(text),
        "n_tags": n_tags,
        "n_links": n_links,
    }


# ---------------------------------------------------------------------
# robots.txt (round 10 s2)
# ---------------------------------------------------------------------


def parse_robots_rules(txt: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Parse one robots.txt and resolve the rule group for
    ``agent``: consecutive ``User-agent`` lines open a shared group;
    directives are case-insensitive; ``#`` comments strip; empty
    ``Disallow:`` matches nothing (allow-all). Agent resolution
    follows RFC 9309: both the group value and the crawler's agent
    reduce to their PRODUCT TOKEN (version part after ``/``
    stripped, case-insensitive) and match by EXACT equality — so
    ``agent='trainer/1.0'`` resolves the ``User-agent: trainer``
    group, while an unrelated short token (``ai``) can never hijack
    ``trainer`` via substring accident. The rules of ALL matching
    groups concatenate (RFC 9309 §2.2.1: multiple groups matching
    the same UA MUST combine); ``*`` groups — likewise combined —
    are the fallback. Returns ``[(allow, path_prefix), ...]`` for the
    resolved group (prefix matching only — Google-extension
    wildcards are a documented non-goal). Runs driver/kernel-side
    over the hosts-sized robots table, never per URL."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_agents = False
    for raw_line in (txt or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                if agents:
                    groups.append((agents, rules))
                agents, rules = [], []
                in_agents = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_agents = False
            if key == "disallow" and val == "":
                continue  # empty Disallow = allow everything
            if val:
                rules.append((key == "allow", val))
        else:
            in_agents = False  # crawl-delay / sitemap etc.: ignored
    if agents:
        groups.append((agents, rules))
    def token(g: str) -> str:
        return g.split("/", 1)[0].strip()

    a_token = token(agent.lower())

    def best_match(ags: list[str]) -> int:
        # 1 = exact product-token match, 0 = star-only, -1 = no match
        score = -1
        for g in ags:
            t = token(g)
            if t == "*":
                score = max(score, 0)
            elif t and t == a_token:
                score = max(score, 1)
        return score

    scored = [(best_match(ags), rs) for ags, rs in groups]
    winner = max((s for s, _ in scored), default=-1)
    if winner < 0:
        return []
    return [rule for s, rs in scored if s == winner for rule in rs]


ROBOTS_RULES_SCHEMA = (
    "host string, rules array<struct<allow:boolean,path:string>>"
)


def robots_rules_table(
    robots_df: DataFrame,
    agent: str = "*",
    host_col: ColumnLike = "host",
    text_col: ColumnLike = "robots_txt",
) -> DataFrame:
    """``(host, rules)`` — one resolved rule group per host for
    ``agent``. The robots corpus is HOSTS-sized (a few million rows
    at web scale, KBs each), so the parse is a cheap mapInPandas and
    the result broadcasts into the per-URL decision join."""
    import pandas as pd

    def parse(batches):
        for b in batches:
            hosts, rules = [], []
            for h, t in zip(b[host_col], b[text_col]):
                hosts.append(h)
                rules.append(
                    [
                        {"allow": a, "path": p}
                        for a, p in parse_robots_rules(t, agent)
                    ]
                )
            yield pd.DataFrame({"host": hosts, "rules": rules})

    return robots_df.select(
        _col(host_col).alias(host_col), _col(text_col).alias(text_col)
    ).mapInPandas(parse, schema=ROBOTS_RULES_SCHEMA)


def robots_allowed(url: ColumnLike, rules: ColumnLike) -> Column:
    """Longest-match robots decision as a PURE Column over the
    broadcast rules array: rules whose path prefixes the URL path
    compete on length, ties go to Allow (the REP tiebreak), no match
    or no robots row (NULL rules) = allowed. Runs inside codegen on
    the corpus-sized URL table — no Python in the per-URL path."""
    raw_path = url_path(url)
    # a bare-host URL ('https://h', no path) crawls the root: it must
    # match '/'-rooted rules, so the empty path normalizes to '/'
    # (review finding: '' never prefix-matches, bypassing Disallow /)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    r = _col(rules)
    matching = F.filter(
        r, lambda x: path.startswith(x["path"])
    )
    # order by (path length, allow): longest wins, Allow wins ties
    best = F.array_max(
        F.transform(
            matching,
            lambda x: F.struct(
                F.length(x["path"]).alias("n"),
                x["allow"].alias("allow"),
            ),
        )
    )
    return F.coalesce(best["allow"], F.lit(True))


def robots_filter(
    urls: DataFrame,
    robots_df: DataFrame,
    agent: str = "*",
    url_col: ColumnLike = "url",
) -> DataFrame:
    """The RefinedWeb-style robots gate: join each URL's host to its
    resolved rule group (BROADCAST — the robots table is hosts-sized)
    and decide per URL with :func:`robots_allowed`. Adds ``host``,
    ``allowed``; hosts with no robots.txt default to allowed. At
    100 TB: one broadcast hash join + a codegen'd array expression;
    URLs never shuffle."""
    rules = robots_rules_table(robots_df, agent)
    u = urls.withColumn("host", url_host(_col(url_col)))
    return u.join(F.broadcast(rules), "host", "left").withColumn(
        "allowed", robots_allowed(_col(url_col), F.col("rules"))
    ).drop("rules")
