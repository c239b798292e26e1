"""URL canonicalization for web-crawl pipelines, fully native.

Common-Crawl-style processing needs URLs normalized BEFORE any url-keyed
dedup or grouping, otherwise `http://Example.com/a?utm_source=x#f` and
`https://example.com/a` count as different pages.  All transformations are
built from `pyspark.sql.functions` (regexp / split / filter / array_join),
stay inside whole-stage codegen, and have exact DuckDB twins — no UDF, so
canonicalization adds zero Python cost to a 10^12-row scan.

Canonical form applied by :func:`canonicalize_url`:

- scheme and host lowercased; ``www.`` prefix dropped from the host;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment removed;
- tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``), remaining parameters sorted for a stable order;
- trailing ``?`` dropped when no parameters survive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def url_host(col: Column) -> Column:
    """Lowercased host (no port, no ``www.`` prefix)."""
    host = F.lower(F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host, r":\d+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def canonicalize_url(col: Column) -> Column:
    scheme = F.lower(F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    raw_host = F.lower(F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    path = F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # strip the fragment BEFORE looking for the query: '?' inside a
    # fragment ('/p#a?b=1') is fragment text, not a query separator
    query = F.regexp_extract(F.regexp_replace(col, r"#.*", ""), r"\?(.*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda kv: (kv != "") & ~kv.rlike(_TRACKING_RE),
            )
        ),
        "&",
    )
    norm_host = F.when(scheme == "http", F.regexp_replace(raw_host, r":80$", "")) \
        .when(scheme == "https", F.regexp_replace(raw_host, r":443$", "")) \
        .otherwise(raw_host)
    norm_host = F.regexp_replace(norm_host, r"^www\.", "")
    norm_path = F.when(path == "", F.lit("/")).otherwise(path)
    # scheme-less input (relative hrefs: '/about', '#top', 'img.png') has
    # no canonical absolute form — pass it through verbatim rather than
    # fabricating ':///'-prefixed garbage that merges distinct targets
    return F.when(scheme == "", col).otherwise(
        F.concat(
            scheme, F.lit("://"), norm_host, norm_path,
            F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
        )
    )


def url_host_oracle_sql(url_expr: str) -> str:
    """DuckDB scalar expression equivalent to :func:`url_host`."""
    host = f"lower(coalesce(regexp_extract({url_expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1), ''))"
    return (
        f"regexp_replace(regexp_replace({host}, ':[0-9]+$', ''), '^www\\.', '')"
    )


def canonical_url_oracle_sql(url_expr: str) -> str:
    """DuckDB scalar expression equivalent to :func:`canonicalize_url`
    applied to ``url_expr`` (RE2-portable regexes, list_* functions)."""
    # DuckDB regexp_extract yields NULL on no-match where Spark yields '':
    # coalesce each extraction so the two engines agree byte-for-byte
    scheme = f"lower(coalesce(regexp_extract({url_expr}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1), ''))"
    raw_host = f"lower(coalesce(regexp_extract({url_expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1), ''))"
    host = (
        f"regexp_replace(CASE WHEN {scheme} = 'http' THEN regexp_replace({raw_host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({raw_host}, ':443$', '') "
        f"ELSE {raw_host} END, '^www\\.', '')"
    )
    path = f"coalesce(regexp_extract({url_expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')"
    # fragment stripped before the query search (mirrors the Spark side)
    query = (
        f"coalesce(regexp_extract(regexp_replace({url_expr}, '#.*', ''), "
        f"'\\?(.*)', 1), '')"
    )
    # array_to_string([]) is NULL in DuckDB (Spark's array_join gives '')
    kept = (
        f"coalesce(array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"kv -> kv <> '' AND NOT regexp_matches(kv, '{_TRACKING_RE}'))), '&'), '')"
    )
    return (
        f"(CASE WHEN {scheme} = '' THEN {url_expr} ELSE "
        f"{scheme} || '://' || {host} || "
        f"CASE WHEN {path} = '' THEN '/' ELSE {path} END || "
        f"CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END END)"
    )


def _collapse_dots(p: Column) -> Column:
    """Bounded dot-segment removal (RFC 3986 §5.2.4 "lite"): fixed global
    replace passes, so the sequence is reproducible verbatim in DuckDB.
    Two passes fold ``/./`` runs; four passes fold up to ~8 nested
    ``segment/../`` levels (deeper nesting — unseen in real crawls — is
    left partially collapsed rather than risking an unbounded loop)."""
    p = F.regexp_replace(p, r"/\./", "/")
    p = F.regexp_replace(p, r"/\./", "/")
    p = F.regexp_replace(p, r"/\.$", "/")
    seg = r"([^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)"  # any segment except '.'/'..'
    for _ in range(4):
        p = F.regexp_replace(p, seg + r"/\.\./", "")
    p = F.regexp_replace(p, seg + r"/\.\.$", "")
    # clamp leftover leading '..' at the root, as browsers do ('/../o'->'/o')
    p = F.regexp_replace(p, r"^(/\.\.)+(/|$)", "/")
    return p


def _collapse_dots_sql(p: str) -> str:
    """DuckDB twin of :func:`_collapse_dots` (same passes, 'g' where the
    Spark side's always-global replace matters)."""
    p = f"regexp_replace({p}, '/\\./', '/', 'g')"
    p = f"regexp_replace({p}, '/\\./', '/', 'g')"
    p = f"regexp_replace({p}, '/\\.$', '/')"
    seg = "([^/.][^/]*|\\.[^/.][^/]*|\\.\\.[^/]+)"
    for _ in range(4):
        p = f"regexp_replace({p}, '{seg}/\\.\\./', '', 'g')"
    p = f"regexp_replace({p}, '{seg}/\\.\\.$', '')"
    p = f"regexp_replace({p}, '^(/\\.\\.)+(/|$)', '/')"
    return p


_ABS_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"


def resolve_href(base: Column, href: Column) -> Column:
    """Resolve ``href`` against ``base`` (RFC 3986 §5 "lite"), fully
    native.  Per-site links — most links on the web — are relative; an
    unresolved ``/about`` fragments the link graph into per-page islands.

    - href with a scheme (``https://…``, ``mailto:…``) → unchanged;
    - scheme-relative ``//host/p`` → base scheme + ``:`` + href;
    - absolute path ``/p`` → base origin + path (dot-collapsed);
    - ``#frag`` → base with its own fragment replaced;
    - ``?q=…`` → base origin + base path + query;
    - relative path ``p``, ``../p`` → base directory + href, dot-collapsed.

    If ``base`` itself has no scheme the href passes through verbatim.
    Everything is `when`/`concat`/`regexp_*` — zero Python per row — and
    :func:`resolve_href_oracle_sql` is the exact DuckDB twin."""
    bscheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    bhost = F.regexp_extract(base, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    bpath = F.regexp_extract(
        base, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    bpath = F.when(bpath == "", F.lit("/")).otherwise(bpath)
    bdir = F.regexp_replace(bpath, r"[^/]*$", "")
    origin = F.concat(bscheme, F.lit("://"), bhost)
    return (
        F.when(bscheme == "", href)
        .when(href.rlike(_ABS_SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(bscheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, _collapse_dots(href)))
        .when(
            href.startswith("#"),
            F.concat(F.regexp_replace(base, r"#.*", ""), href),
        )
        .when(href.startswith("?"), F.concat(origin, bpath, href))
        .otherwise(F.concat(origin, _collapse_dots(F.concat(bdir, href))))
    )


def resolve_href_oracle_sql(base_expr: str, href_expr: str) -> str:
    """DuckDB scalar expression equivalent to
    ``resolve_href(base_expr, href_expr)``."""
    bscheme = (
        f"coalesce(regexp_extract({base_expr}, "
        f"'^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1), '')"
    )
    bhost = (
        f"coalesce(regexp_extract({base_expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1), '')"
    )
    bpath_raw = (
        f"coalesce(regexp_extract({base_expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')"
    )
    bpath = f"CASE WHEN {bpath_raw} = '' THEN '/' ELSE {bpath_raw} END"
    bdir = f"regexp_replace({bpath}, '[^/]*$', '')"
    origin = f"({bscheme} || '://' || {bhost})"
    return (
        f"(CASE "
        f"WHEN {bscheme} = '' THEN {href_expr} "
        f"WHEN regexp_matches({href_expr}, '{_ABS_SCHEME_RE}') THEN {href_expr} "
        f"WHEN {href_expr} LIKE '//%' THEN {bscheme} || ':' || {href_expr} "
        f"WHEN {href_expr} LIKE '/%' THEN {origin} || "
        f"{_collapse_dots_sql(href_expr)} "
        f"WHEN {href_expr} LIKE '#%' THEN "
        f"regexp_replace({base_expr}, '#.*', '') || {href_expr} "
        f"WHEN {href_expr} LIKE '?%' THEN {origin} || {bpath} || {href_expr} "
        f"ELSE {origin} || {_collapse_dots_sql(f'({bdir} || {href_expr})')} "
        f"END)"
    )


# one pattern per HTML quoting form, group 1 = the href value.  (?i)
# accepts HREF=/Href=; \s*=\s* accepts spaced attributes.  The forms are
# mutually exclusive at any match start (after '=' a quote char fails the
# unquoted class), so concatenating the three extractions never double-
# counts an anchor.  Unquoted values stop at whitespace/quotes/<>/backtick;
# '=' deliberately stays allowed — unquoted query-string hrefs are common
# in the wild even though HTML5 forbids them.
_HREF_RES = (
    r'(?i)href\s*=\s*"([^"]+)"',
    r"(?i)href\s*=\s*'([^']+)'",
    "(?i)href\\s*=\\s*([^\\s\"'<>`]+)",
)


def href_extract_sql(html_expr: str) -> str:
    """DuckDB twin of the href extraction inside :func:`extract_links`:
    the same three RE2-portable patterns, one ``regexp_extract_all`` per
    quoting form, list-concatenated in the same order."""
    parts = [
        f"regexp_extract_all({html_expr}, '" + p.replace("'", "''") + "', 1)"
        for p in _HREF_RES
    ]
    return f"list_concat(list_concat({parts[0]}, {parts[1]}), {parts[2]})"


def extract_links(
    df,
    html_col: str = "html",
    url_col: str = "url",
    canonical: bool = True,
    resolve: bool = True,
):
    """(src_url, dst_url) edge list from anchor hrefs — the hyperlink-graph
    extraction stage of a crawl pipeline, fully native.

    ``html_col`` may be string or binary (cast to string — pages tables
    store html as binary per the input schema).  Each href becomes one
    edge row; double-quoted, single-quoted and unquoted attribute forms
    are all parsed (``_HREF_RES``), case-insensitively and with optional
    spaces around ``=``.  ``resolve=True`` resolves relative hrefs (``/about``,
    ``../x``, ``//host/p``, ``#frag``, ``?q=…`` — most links on real
    pages) against the page's own URL via :func:`resolve_href`, so
    per-site links land on the same destination key as their absolute
    twins instead of fragmenting the graph.  ``canonical=True`` then
    normalizes destinations through :func:`canonicalize_url` so the
    downstream graph (indegree, PageRank over real links) keys on
    canonical pages, not tracking-param spam.

    Scale shape: regexp_extract_all + explode per page, zero shuffles
    until the caller aggregates; regex + resolution + canonicalization
    all run inside codegen so link extraction adds no Python to a
    10^12-page scan."""
    from pyspark.sql import functions as F

    html = F.col(html_col).cast("string")
    hrefs = F.concat(
        *[F.regexp_extract_all(html, F.lit(p), 1) for p in _HREF_RES]
    )
    edges = df.select(
        F.col(url_col).alias("src_url"), F.explode(hrefs).alias("dst_url")
    )
    if resolve:
        edges = edges.withColumn(
            "dst_url", resolve_href(F.col("src_url"), F.col("dst_url"))
        )
    if canonical:
        edges = edges.withColumn(
            "dst_url", canonicalize_url(F.col("dst_url"))
        )
    return edges


_ANCHOR_TAG_RE = r"(?i)(<a\s[^>]*>[^<]*</a>)"
_ANCHOR_TEXT_RE = r">([^<]*)<"


def extract_anchors(
    df,
    html_col: str = "html",
    url_col: str = "url",
    canonical: bool = True,
    resolve: bool = True,
):
    """(src_url, dst_url, anchor) rows from anchor tags — link extraction
    WITH the anchor text, the classic entity-naming evidence a KG
    pipeline aggregates per destination ("what does the web call this
    page?").

    A whole-tag regex (``<a\\s[^>]*>[^<]*</a>``) keeps each href aligned
    with ITS anchor text (extracting hrefs and texts separately would
    lose the pairing); per tag, the three href quoting forms are tried
    via ``coalesce(nullif(...))`` — both engines return '' for a
    non-matching ``regexp_extract``, so the chain is portable verbatim.
    Anchors containing nested markup (``<b>…``) are excluded by the
    ``[^<]*`` inner-text class — same documented-honesty tradeoff as the
    attribute grammar in ``_HREF_RES``.  Resolution/canonicalization of
    destinations follows :func:`extract_links`.

    Scale shape: regexp + explode + codegen expressions only — no
    Python, no shuffle until the caller aggregates."""
    from pyspark.sql import functions as F

    html = F.col(html_col).cast("string")
    tags = df.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(html, F.lit(_ANCHOR_TAG_RE), 1)
        ).alias("tag"),
    )
    href = F.coalesce(
        *[
            F.nullif(F.regexp_extract("tag", p, 1), F.lit(""))
            for p in _HREF_RES
        ]
    )
    out = tags.select(
        "src_url",
        href.alias("dst_url"),
        F.regexp_extract("tag", _ANCHOR_TEXT_RE, 1).alias("anchor"),
    ).filter(F.col("dst_url").isNotNull())
    if resolve:
        out = out.withColumn(
            "dst_url", resolve_href(F.col("src_url"), F.col("dst_url"))
        )
    if canonical:
        out = out.withColumn("dst_url", canonicalize_url(F.col("dst_url")))
    return out


def anchor_extract_sql(
    html_expr: str, url_expr: str, from_sql: str = "pages"
) -> str:
    """DuckDB twin of the tag-level part of :func:`extract_anchors`:
    returns a FROM-able subquery producing (src_url, dst_url, anchor)
    over ``from_sql``, with dst_url still unresolved (feed it through
    ``resolve_href_oracle_sql`` / ``canonical_url_oracle_sql`` exactly
    like the Spark path chains resolve/canonicalize)."""
    parts = [
        "NULLIF(regexp_extract(tag, '" + p.replace("'", "''") + "', 1), '')"
        for p in _HREF_RES
    ]
    href = "COALESCE(" + ", ".join(parts) + ")"
    return f"""
        SELECT src_url, {href} AS dst_url,
               regexp_extract(tag, '{_ANCHOR_TEXT_RE}', 1) AS anchor
        FROM (
            SELECT {url_expr} AS src_url,
                   unnest(regexp_extract_all({html_expr},
                          '{_ANCHOR_TAG_RE}', 1)) AS tag
            FROM {from_sql}
        )
        WHERE {href} IS NOT NULL
    """


_TITLE_RE = r"(?si)<title[^>]*>([^<]*)</title>"
# meta description: both attribute orders × both content quote types.
# Per-quote-type alternatives (the _HREF_RES discipline) keep an
# apostrophe inside a double-quoted value intact — a mixed class like
# [\"']([^\"']*)[\"'] would truncate "the world's best" at the
# apostrophe.  The quote type is anchored right after content= so the
# wrong-quote variant cannot partially match.
_NAME_DESC = r"name\s*=\s*[\"']description[\"']"
_META_DESC_RES = [
    rf"(?si)<meta\s+[^>]*{_NAME_DESC}[^>]*content\s*=\s*\"([^\"]*)\"",
    rf"(?si)<meta\s+[^>]*{_NAME_DESC}[^>]*content\s*=\s*'([^']*)'",
    rf"(?si)<meta\s+[^>]*content\s*=\s*\"([^\"]*)\"[^>]*{_NAME_DESC}",
    rf"(?si)<meta\s+[^>]*content\s*=\s*'([^']*)'[^>]*{_NAME_DESC}",
]
_H1_RE = r"(?si)<h1[^>]*>([^<]*)</h1>"
# explicit whitespace class: Java's \s includes \x0B, RE2's does not —
# \s+ here would silently diverge from the DuckDB twin on vertical tabs
_WS_RUN_RE = r"[ \t\n\r\f]+"


def extract_page_meta(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Extract ``(url, title, meta_description, h1)`` from page HTML —
    the page-level naming evidence that complements anchor text (a
    page's title names the THING the page is about; anchors name what
    OTHERS call it), feeding KG surface-form voting and snippet
    generation.

    First occurrence wins for each tag (the browser rule); whitespace
    runs collapse to one space (explicit ``[ \\t\\n\\r\\f]`` class —
    Java's ``\\s`` includes vertical tab where RE2's does not) and the
    result is trimmed; a missing tag yields NULL.  Meta descriptions
    match in BOTH attribute orders (name-then-content and
    content-then-name) and both quoting styles, with apostrophes inside
    double-quoted values (and vice versa) preserved.  Subset honesty
    (the href-grammar discipline): plain-text tag contents only
    (``[^<]*`` — a ``<title>`` holding nested markup is not a real
    page title), quoted meta content only.

    Scale shape: native regexp_extracts over the html column — zero
    Python, no shuffle."""
    html = F.col(html_col).cast("string")

    def collapse(col: Column) -> Column:
        return F.nullif(
            F.trim(F.regexp_replace(col, _WS_RUN_RE, " ")), F.lit("")
        )

    meta_raw = F.coalesce(
        *[
            F.nullif(F.regexp_extract(html, p, 1), F.lit(""))
            for p in _META_DESC_RES
        ]
    )
    return pages.select(
        F.col(url_col).alias("url"),
        collapse(F.regexp_extract(html, _TITLE_RE, 1)).alias("title"),
        collapse(meta_raw).alias("meta_description"),
        collapse(F.regexp_extract(html, _H1_RE, 1)).alias("h1"),
    )


def extract_page_meta_oracle_sql(
    pages_sql: str,
    html_expr: str = "html",
    url_expr: str = "url",
) -> str:
    """DuckDB twin of :func:`extract_page_meta` (same per-quote-type
    meta alternatives, same explicit whitespace class)."""

    def extract(rx: str) -> str:
        sql_rx = rx.replace("'", "''")
        return (
            f"NULLIF(coalesce(regexp_extract({html_expr}, '{sql_rx}', 1),"
            " ''), '')"
        )

    def collapse(expr: str) -> str:
        return (
            f"NULLIF(trim(regexp_replace(coalesce({expr}, ''), "
            f"'{_WS_RUN_RE}', ' ', 'g')), '')"
        )

    meta_raw = "COALESCE(" + ", ".join(
        extract(p) for p in _META_DESC_RES
    ) + ")"
    return f"""
        SELECT {url_expr} AS url,
               {collapse(extract(_TITLE_RE))} AS title,
               {collapse(meta_raw)} AS meta_description,
               {collapse(extract(_H1_RE))} AS h1
        FROM ({pages_sql})
    """


def frontier_waves(
    urls: DataFrame,
    per_host_cap: int,
    url_col: str = "url",
    n_buckets: int = 256,
) -> DataFrame:
    """Politeness-scheduled crawl-frontier assignment: (url, host, wave)
    with at most ``per_host_cap`` urls of any host per wave.

    A crawler must rate-limit per host, so the frontier is fetched in
    WAVES: wave w holds each host's urls ranked [w*cap, (w+1)*cap).  The
    rank is deterministic (a re-run or resumed scheduler reproduces the
    exact same waves — same discipline as the curation samplers).

    Scale shape: the naive rank is ``row_number() OVER (PARTITION BY
    host ORDER BY url)`` — ONE task per host, and a crawl frontier is
    exactly the workload where one host can hold 10^7+ urls (the skew
    this operator exists to manage).  Instead the exact_ntile /
    token_budget_mix two-phase form: a portable hash splits every host
    into ``n_buckets`` sub-groups, per-(host, bucket) counts (a tiny
    <= hosts x n_buckets table) turn into per-host running offsets with
    a window over n_buckets rows per host, and the global rank is
    offset + rank within the (host, bucket) sub-group — hot hosts fan
    out n_buckets-wide, no unbounded single-task window.  Rank order is
    (bucket, url) within each host; every quantity is a non-negative
    integer so Spark ``DIV`` and DuckDB ``//`` agree.
    """
    host = url_host(F.col(url_col)).alias("host")
    bucketed = urls.select(
        F.col(url_col).alias("url"),
        host,
        F.expr(
            f"CAST(conv(substr(md5({url_col}), 1, 8), 16, 10) AS BIGINT)"
            f" % {n_buckets}"
        ).alias("bucket"),
    )
    counts = bucketed.groupBy("host", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # running offset of each (host, bucket): rows of the SAME host in
    # strictly smaller buckets — window input is <= n_buckets rows/host
    w = (
        Window.partitionBy("host")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "host", "bucket",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("off"),
    )
    in_bucket = Window.partitionBy("host", "bucket").orderBy("url")
    return (
        bucketed.join(offsets, ["host", "bucket"])
        .select(
            "url", "host",
            (F.col("off") + F.row_number().over(in_bucket) - 1).alias("rk"),
        )
        .select(
            "url", "host",
            F.expr(f"rk DIV {per_host_cap}").cast("long").alias("wave"),
        )
    )


def recrawl_schedule(
    history: DataFrame,
    base_interval: int = 4000,
    min_interval: int = 1000,
    max_interval: int = 16000,
    url_col: str = "url",
    flags_col: str = "changed_flags",
) -> DataFrame:
    """Adaptive-revisit crawl scheduling (AIMD, the Heritrix
    wait-factor / Cho & Garcia-Molina revisit-policy shape): fold each
    url's fetch history (``changed_flags``: 1 = content changed at that
    fetch, 0 = unchanged) into the next revisit interval — halve on
    change (the page is hot), double on no-change (back off), clamped
    to [min_interval, max_interval].  Output:
    ``(url, n_fetches, n_changes, next_interval)``; an empty history
    keeps ``base_interval``.  The result is exactly what feeds
    :func:`frontier_waves`: urls due sooner land in earlier waves.

    Scale shape: a per-row integer fold via the ``aggregate``
    higher-order function — zero shuffle, zero Python, embarrassingly
    parallel over 10^12 urls.  All quantities are non-negative integers
    (Spark ``DIV`` == DuckDB ``//``), so the DuckDB ``list_reduce`` twin
    (:func:`recrawl_schedule_oracle_sql`) is exact."""
    fold = (
        f"aggregate({flags_col}, CAST({base_interval} AS BIGINT), "
        f"(acc, x) -> CASE WHEN x = 1 "
        f"THEN greatest(CAST({min_interval} AS BIGINT), acc DIV 2) "
        f"ELSE least(CAST({max_interval} AS BIGINT), acc * 2) END)"
    )
    return history.select(
        F.col(url_col).alias("url"),
        F.size(F.col(flags_col)).cast("long").alias("n_fetches"),
        F.expr(
            f"CAST(aggregate({flags_col}, 0, (a, x) -> a + x) AS BIGINT)"
        ).alias("n_changes"),
        F.expr(fold).alias("next_interval"),
    )


def recrawl_schedule_oracle_sql(
    history_sql: str,
    base_interval: int = 4000,
    min_interval: int = 1000,
    max_interval: int = 16000,
    url_col: str = "url",
    flags_col: str = "changed_flags",
) -> str:
    """DuckDB twin of :func:`recrawl_schedule`.  ``list_reduce`` seeds
    from the list's first element, so the fold prepends the base
    interval (the bpe.py list_reduce discipline); flags are cast to
    BIGINT so the lambda's CASE arms unify types."""
    fold = (
        f"list_reduce(list_prepend(CAST({base_interval} AS BIGINT), "
        f"list_transform({flags_col}, f -> CAST(f AS BIGINT))), "
        f"(acc, x) -> CASE WHEN x = 1 "
        f"THEN greatest(CAST({min_interval} AS BIGINT), acc // 2) "
        f"ELSE least(CAST({max_interval} AS BIGINT), acc * 2) END)"
    )
    return f"""
        SELECT {url_col} AS url,
               len({flags_col})::BIGINT AS n_fetches,
               COALESCE(list_sum({flags_col}), 0)::BIGINT AS n_changes,
               {fold}::BIGINT AS next_interval
        FROM ({history_sql})
    """


_SITEMAP_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_SITEMAP_LOC_RE = r"(?s)<loc>\s*([^<]+?)\s*</loc>"
_SITEMAP_LASTMOD_RE = r"(?s)<lastmod>\s*([^<]+?)\s*</lastmod>"


def parse_sitemap(
    sitemaps: DataFrame,
    host_col: str = "host",
    body_col: str = "sitemap_xml",
) -> DataFrame:
    """Parse sitemap XML bodies into ``(host, loc, lastmod)`` — the
    crawl DISCOVERY source that pairs with :func:`parse_robots`
    (policy) and :func:`crawl_delta` (change): new locs seed the
    frontier, lastmod seeds :func:`recrawl_schedule`.

    Extraction is block-level, the :func:`extract_anchors` discipline:
    each ``<url>…</url>`` block is exploded FIRST so a loc stays paired
    with ITS lastmod (extracting the two tag streams separately would
    mis-align them when lastmod is optional).  ``(?s)`` regexes span
    newlines in both engines; whitespace inside ``<loc>`` is trimmed
    per the sitemap spec; missing ``<lastmod>`` yields NULL.  Subset
    honesty: ``<urlset>`` entries only (no nested sitemapindex
    recursion — an index's ``<loc>`` list is a fetch worklist, not row
    data).

    Scale shape: regexp + explode, fully native, no shuffle."""
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(body_col), F.lit(_SITEMAP_URL_BLOCK_RE), 1
            )
        ).alias("block"),
    )
    return blocks.select(
        "host",
        F.nullif(
            F.regexp_extract("block", _SITEMAP_LOC_RE, 1), F.lit("")
        ).alias("loc"),
        F.nullif(
            F.regexp_extract("block", _SITEMAP_LASTMOD_RE, 1), F.lit("")
        ).alias("lastmod"),
    ).filter(F.col("loc").isNotNull())


def parse_sitemap_oracle_sql(
    sitemaps_sql: str,
    host_col: str = "host",
    body_col: str = "sitemap_xml",
) -> str:
    """DuckDB twin of :func:`parse_sitemap`."""
    return f"""
        SELECT host,
               NULLIF(regexp_extract(block, '{_SITEMAP_LOC_RE}', 1),
                      '') AS loc,
               NULLIF(regexp_extract(block, '{_SITEMAP_LASTMOD_RE}', 1),
                      '') AS lastmod
        FROM (
            SELECT {host_col} AS host,
                   unnest(regexp_extract_all({body_col},
                          '{_SITEMAP_URL_BLOCK_RE}', 1)) AS block
            FROM ({sitemaps_sql})
        )
        WHERE NULLIF(regexp_extract(block, '{_SITEMAP_LOC_RE}', 1), '')
              IS NOT NULL
    """


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Classify each url across two crawl snapshots:
    ``(url, status)`` with status in {added, deleted, changed,
    unchanged} — the per-snapshot change signal that FEEDS
    :func:`recrawl_schedule`'s changed_flags history and an incremental
    KG build's re-annotate worklist.

    Both inputs are ``(url, digest)`` where digest is any content
    fingerprint (md5 of extracted text in the driver query).  Exactly
    one full-outer shuffle join on url; at 10^12 urls both sides are
    url-keyed tables a real deployment would bucket by url, making the
    join co-located."""
    o = old.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("old_digest")
    )
    n = new.select(
        F.col(url_col).alias("url"), F.col(digest_col).alias("new_digest")
    )
    return o.join(n, "url", "full_outer").select(
        "url",
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("deleted"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def crawl_delta_oracle_sql(
    old_sql: str,
    new_sql: str,
    url_col: str = "url",
    digest_col: str = "digest",
) -> str:
    """DuckDB twin of :func:`crawl_delta`."""
    return f"""
        SELECT COALESCE(o.url, n.url) AS url,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN n.url IS NULL THEN 'deleted'
                    WHEN o.old_digest <> n.new_digest THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM (SELECT {url_col} AS url, {digest_col} AS old_digest
              FROM ({old_sql})) o
        FULL OUTER JOIN
             (SELECT {url_col} AS url, {digest_col} AS new_digest
              FROM ({new_sql})) n
          ON o.url = n.url
    """


def _robots_lines(
    robots: DataFrame, host_col: str, body_col: str
) -> DataFrame:
    """(host, fkey, ln, line): comment-stripped trimmed lines with a
    per-BODY key — shared scaffold of :func:`parse_robots` and
    :func:`crawl_delays`.  Keying on the body hash as well as the host
    makes duplicate host rows (a robots file refetched in two crawl
    waves and unioned) parse each body INDEPENDENTLY instead of
    interleaving their colliding line numbers nondeterministically."""
    line_no = (F.col("pos") + 1).alias("ln")
    return robots.select(
        F.col(host_col).alias("host"),
        F.xxhash64(F.col(body_col)).alias("fkey"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    ).select(
        "host",
        "fkey",
        line_no,
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )


def _group_window() -> "Window":
    """MOST-RECENT-preceding-User-agent assignment window (per body)."""
    return (
        Window.partitionBy("host", "fkey")
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into rule rows ``(host, agent, allow,
    prefix)`` — the crawl-side policy companion to
    :func:`frontier_waves` / :func:`recrawl_schedule`.

    RFC 9309 subset (documented-honesty, like the href grammar):
    ``User-agent`` / ``Allow`` / ``Disallow`` directives
    (case-insensitive), ``#`` comments stripped, each rule assigned to
    the MOST RECENT preceding User-agent line (multi-agent groups
    collapse to their last agent), empty-pattern rules dropped (the RFC
    says an empty pattern matches nothing), no ``*``/``$`` wildcards.

    Scale shape: split + posexplode + regexp — native end to end.  The
    group-assignment window is per (host, body) over one file's LINES;
    the RFC caps robots.txt at 500 KiB, so the window input is bounded
    by spec, not by data."""
    lines = _robots_lines(robots, host_col, body_col)
    low = F.lower(F.col("line"))
    tagged = lines.select(
        "host",
        "fkey",
        "ln",
        F.when(
            low.startswith("user-agent:"),
            F.lower(F.trim(F.expr("substr(line, 12)"))),
        ).alias("ua"),
        F.when(low.startswith("allow:"), F.lit(1))
        .when(low.startswith("disallow:"), F.lit(0))
        .cast("int")
        .alias("allow"),
        F.when(low.startswith("allow:"), F.trim(F.expr("substr(line, 7)")))
        .when(
            low.startswith("disallow:"), F.trim(F.expr("substr(line, 10)"))
        )
        .alias("prefix"),
    )
    w = _group_window()
    return (
        tagged.select(
            "host",
            F.last("ua", ignorenulls=True).over(w).alias("agent"),
            "allow",
            "prefix",
        )
        .filter(F.col("allow").isNotNull() & (F.col("prefix") != ""))
        .filter(F.col("agent").isNotNull())
    )


# Crawl-delay values: integer or decimal seconds with up to 3 fraction
# digits ("10", "0.5", "2.25"); anything else is dropped as malformed.
_DELAY_VAL_RE = r"^(\d+)(?:\.(\d{1,3}))?$"


def crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Parse the de-facto ``Crawl-delay`` directive into
    ``(host, agent, delay_ms)`` — the per-host pacing that scales
    :func:`frontier_waves` wave spacing (a host with Crawl-delay 10
    gets one fetch per 10 s, i.e. its wave interval stretches).

    Seconds parse as EXACT integers (integer part × 1000 + the
    right-padded fraction — no float anywhere, so "0.5" → 500 in both
    engines bit-for-bit); malformed values are dropped; multiple
    delays in one (host, agent) group keep the MAXIMUM (the
    politeness-conservative choice).  Group assignment and the
    duplicate-host-body discipline follow :func:`parse_robots`."""
    lines = _robots_lines(robots, host_col, body_col)
    low = F.lower(F.col("line"))
    val = F.trim(F.expr("substr(line, 13)"))
    tagged = lines.select(
        "host",
        "fkey",
        "ln",
        F.when(
            low.startswith("user-agent:"),
            F.lower(F.trim(F.expr("substr(line, 12)"))),
        ).alias("ua"),
        F.when(low.startswith("crawl-delay:"), val).alias("raw_delay"),
    )
    w = _group_window()
    delays = (
        tagged.select(
            "host",
            F.last("ua", ignorenulls=True).over(w).alias("agent"),
            "raw_delay",
        )
        .filter(F.col("raw_delay").isNotNull() & F.col("agent").isNotNull())
        .filter(F.col("raw_delay").rlike(_DELAY_VAL_RE))
        .select(
            "host",
            "agent",
            (
                F.regexp_extract("raw_delay", _DELAY_VAL_RE, 1)
                .cast("long") * 1000
                + F.rpad(
                    F.coalesce(
                        F.nullif(
                            F.regexp_extract(
                                "raw_delay", _DELAY_VAL_RE, 2
                            ),
                            F.lit(""),
                        ),
                        F.lit("0"),
                    ),
                    3,
                    "0",
                ).cast("long")
            ).alias("delay_ms"),
        )
    )
    return delays.groupBy("host", "agent").agg(
        F.max("delay_ms").alias("delay_ms")
    )


def crawl_delays_oracle_sql(
    robots_sql: str,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> str:
    """DuckDB twin of :func:`crawl_delays` (same exact-integer
    millisecond arithmetic, same max-per-group)."""
    return f"""
        SELECT host, agent, MAX(delay_ms)::BIGINT AS delay_ms
        FROM (
            SELECT host, agent,
                   CAST(regexp_extract(raw_delay,
                        '{_DELAY_VAL_RE}', 1) AS BIGINT) * 1000
                   + CAST(rpad(COALESCE(NULLIF(regexp_extract(raw_delay,
                        '{_DELAY_VAL_RE}', 2), ''), '0'), 3, '0')
                        AS BIGINT) AS delay_ms
            FROM (
                SELECT host,
                       LAST_VALUE(ua IGNORE NULLS) OVER (
                           PARTITION BY host, fkey ORDER BY ln
                           ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW
                       ) AS agent,
                       raw_delay
                FROM (
                    SELECT host, fkey, ln,
                           CASE WHEN lower(line) LIKE 'user-agent:%'
                                THEN lower(trim(substr(line, 12)))
                           END AS ua,
                           CASE WHEN lower(line) LIKE 'crawl-delay:%'
                                THEN trim(substr(line, 13)) END
                               AS raw_delay
                    FROM (
                        SELECT host, md5({body_col}) AS fkey,
                               pair[2]::BIGINT AS ln,
                               trim(regexp_replace(pair[1]::VARCHAR,
                                    '#.*$', '')) AS line
                        FROM (
                            SELECT {host_col} AS host, {body_col},
                                   unnest(list_zip(
                                       string_split({body_col}, chr(10)),
                                       generate_series(1,
                                           len(string_split({body_col},
                                               chr(10))))
                                   )) AS pair
                            FROM ({robots_sql})
                        )
                    )
                )
                QUALIFY raw_delay IS NOT NULL AND agent IS NOT NULL
            )
            WHERE regexp_matches(raw_delay, '{_DELAY_VAL_RE}')
        )
        GROUP BY host, agent
    """


# path+query of a url (everything between authority and fragment); the
# robots match target.  '' (no path) matches as '/'.
_URL_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Evaluate robots rules against urls: ``(url, host, allowed,
    rule_prefix)`` with RFC 9309 precedence — the LONGEST matching
    prefix wins; on a length tie ``Allow`` beats ``Disallow``; a url
    with no matching rule (or no rules for its host) is allowed.

    ``rules`` is :func:`parse_robots` output.  Group selection follows
    RFC 9309 §2.2.1: for each host, if a group for ``agent`` (exact
    match after lowercasing) exists it applies EXCLUSIVELY; otherwise
    the host's ``*`` group applies; a host with neither contributes no
    rules (default allow).  The two groups never combine — a crawler
    named in its own group must ignore the generic rules.

    Scale shape: one equi-join urls⋈rules on host with NO broadcast
    hint — per-host rule sets are spec-bounded tiny, so Catalyst
    broadcasts while small and degrades to a shuffled hash join if a
    rules corpus outgrows the threshold (the webgraph
    broadcast_tables discipline); group selection adds one left_anti
    on the (distinct-host-sized) named-group host list.  The winner is
    one map-combinable ``max(struct(prefix_len, allow, prefix))`` per
    url — struct ordering gives the RFC precedence for free, no
    window."""
    hosted = urls.select(
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(F.col(url_col), _URL_PATH_RE, 1), F.lit("")
            ),
            F.lit("/"),
        ).alias("path"),
    )
    named = rules.filter(F.col("agent") == agent.lower())
    if agent.lower() == "*":
        applicable = named.select(
            F.col("host").alias("r_host"), "allow", "prefix"
        )
    else:
        # RFC 9309 group selection: the named group replaces '*' on
        # hosts where it exists; hosts without it fall back to '*'
        fallback = rules.filter(F.col("agent") == "*").join(
            named.select("host").distinct(), "host", "left_anti"
        )
        applicable = named.unionByName(fallback).select(
            F.col("host").alias("r_host"), "allow", "prefix"
        )
    matched = hosted.join(
        applicable,
        (hosted["host"] == applicable["r_host"])
        & hosted["path"].startswith(applicable["prefix"]),
    )
    winner = matched.groupBy("url").agg(
        F.max(
            F.struct(
                F.length("prefix").alias("plen"),
                F.col("allow").alias("allow"),
                F.col("prefix").alias("prefix"),
            )
        ).alias("w")
    )
    return hosted.join(winner, "url", "left").select(
        "url",
        "host",
        F.coalesce(F.col("w.allow"), F.lit(1)).cast("int").alias("allowed"),
        F.coalesce(F.col("w.prefix"), F.lit("")).alias("rule_prefix"),
    )


def robots_allowed_oracle_sql(
    urls_sql: str,
    robots_sql: str,
    agent: str = "*",
    url_col: str = "url",
    host_sql: str | None = None,
) -> str:
    """DuckDB twin of ``robots_allowed(urls, parse_robots(robots))``.
    ``robots_sql`` must yield (host, robots_txt); ``host_sql`` the
    url_host twin over ``url_col`` (url_host_oracle_sql default)."""
    host = host_sql if host_sql is not None else url_host_oracle_sql(url_col)
    agent_lit = agent.lower().replace("'", "''")
    return f"""
        WITH lines AS (
            SELECT host, pair[2]::BIGINT AS ln,
                   trim(regexp_replace(pair[1]::VARCHAR, '#.*$', '')) AS line
            FROM (
                SELECT host,
                       unnest(list_zip(
                           string_split(robots_txt, chr(10)),
                           generate_series(
                               1, len(string_split(robots_txt, chr(10))))
                       )) AS pair
                FROM ({robots_sql})
            )
        ),
        tagged AS (
            SELECT host, ln,
                   CASE WHEN lower(line) LIKE 'user-agent:%'
                        THEN lower(trim(substr(line, 12))) END AS ua,
                   CASE WHEN lower(line) LIKE 'allow:%' THEN 1
                        WHEN lower(line) LIKE 'disallow:%' THEN 0
                   END AS allow,
                   CASE WHEN lower(line) LIKE 'allow:%'
                        THEN trim(substr(line, 7))
                        WHEN lower(line) LIKE 'disallow:%'
                        THEN trim(substr(line, 10)) END AS prefix
            FROM lines
        ),
        rules AS (
            SELECT host,
                   LAST_VALUE(ua IGNORE NULLS) OVER (
                       PARTITION BY host ORDER BY ln
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS agent,
                   allow, prefix
            FROM tagged
            QUALIFY allow IS NOT NULL AND prefix <> ''
                    AND agent IS NOT NULL
        ),
        applicable AS (
            -- RFC 9309 group selection: the named group replaces '*'
            -- on hosts where it exists; other hosts fall back to '*'
            SELECT host, allow, prefix FROM rules
            WHERE agent = '{agent_lit}'
            UNION ALL
            SELECT host, allow, prefix FROM rules
            WHERE agent = '*' AND '{agent_lit}' <> '*'
              AND host NOT IN (SELECT DISTINCT host FROM rules
                               WHERE agent = '{agent_lit}')
        ),
        hosted AS (
            SELECT {url_col} AS url, {host} AS host,
                   COALESCE(NULLIF(regexp_extract({url_col},
                       '{_URL_PATH_RE}', 1), ''), '/') AS path
            FROM ({urls_sql})
        ),
        winner AS (
            SELECT url,
                   max(struct_pack(
                       plen := length(prefix),
                       allow := allow,
                       prefix := prefix)) AS w
            FROM hosted u JOIN applicable r
              ON u.host = r.host AND starts_with(u.path, r.prefix)
            GROUP BY url
        )
        SELECT url, host, allowed, rule_prefix FROM (
            SELECT h.url AS url, h.host AS host,
                   COALESCE(w.w.allow, 1)::INT AS allowed,
                   COALESCE(w.w.prefix, '') AS rule_prefix
            FROM hosted h LEFT JOIN winner w ON h.url = w.url
        )
    """


def frontier_waves_oracle_sql(
    urls_sql: str,
    per_host_cap: int,
    url_col: str = "url",
    n_buckets: int = 256,
    host_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`frontier_waves` (the rank collapses to one
    window — the oracle states the SEMANTICS; the Spark form is the
    skew-safe physical strategy).  ``host_sql`` must be the DuckDB twin
    of weburl.url_host applied to ``url_col`` (url_host_oracle_sql)."""
    host = host_sql if host_sql is not None else url_host_oracle_sql(url_col)
    return f"""
        SELECT url, host,
               ((ROW_NUMBER() OVER (PARTITION BY host ORDER BY bucket, url)
                 - 1) // {per_host_cap})::BIGINT AS wave
        FROM (
            SELECT {url_col} AS url, {host} AS host,
                   ('0x' || substr(md5({url_col}), 1, 8))::BIGINT
                       % {n_buckets} AS bucket
            FROM ({urls_sql})
        )
    """
