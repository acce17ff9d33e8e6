"""URL canonicalization + registrable-domain curation tools — pure Catalyst.

Web-scale corpus curation treats the URL as a first-class quality
signal: domain blocklists/allowlists, per-domain document caps
(the FineWeb/Gopher-style rail against a single crawler-friendly site
flooding the mix), and host-level aggregation all key on a CANONICAL
registrable domain. Everything here compiles to Catalyst string
expressions (``regexp_extract`` / ``split`` / ``filter`` array lambdas)
— no Python UDF anywhere, no shuffle until the caller aggregates, so at
10^12 rows the whole normalize+extract pass rides the scan.

Scope contract (documented, tested): absolute ``http``/``https`` URLs.
Anything else (relative paths, mailto:, data:) yields NULL host/domain —
curation drops or routes those rows explicitly rather than guessing.
The registrable-domain rule is the last-two-labels heuristic plus a
small built-in multi-part-TLD table (``co.uk`` et al). That table is an
explicit approximation of the public-suffix list — the real PSL is a
data file a deployment injects via ``multi_tlds``; the operator logic
is identical either way.

No reference analogue (builder-brief LLM-pipeline scope; the reference
engine never sees URLs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Multi-part TLDs the last-two-labels rule would split wrongly. An
# intentionally small, documented approximation of the public-suffix
# list (inject the full PSL via the multi_tlds parameter at deploy).
DEFAULT_MULTI_TLDS: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

# Tracking-parameter prefixes stripped by canonical_url_expr.
DEFAULT_TRACKING_PREFIXES: tuple[str, ...] = ("utm_", "fbclid", "gclid")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _scheme(url: Column) -> Column:
    s = F.regexp_extract(url, _SCHEME_RE, 1)
    return F.when(F.lower(s).isin("http", "https"), F.lower(s))


def host_expr(url: Column) -> Column:
    """Lowercased host of an absolute http(s) URL; NULL for anything else
    (including a present-but-empty authority like ``http://``)."""
    rest = F.regexp_extract(url, _SCHEME_RE + r"([^/?#]+)", 2)
    host = F.lower(F.substring_index(rest, ":", 1))
    return F.when(_scheme(url).isNotNull() & (host != ""), host)


def registrable_domain_expr(
    host: Column, multi_tlds: tuple[str, ...] = DEFAULT_MULTI_TLDS
) -> Column:
    """Registrable domain from a lowercased host: the last two labels,
    or the last three when the last two form a known multi-part TLD.
    NULL host propagates; a bare single-label host returns itself."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n <= 1, host)
        .when((n >= 3) & last2.isin(*multi_tlds), last3)
        .otherwise(last2)
    )


def canonical_url_expr(
    url: Column,
    tracking_prefixes: tuple[str, ...] = DEFAULT_TRACKING_PREFIXES,
) -> Column:
    """Canonical form of an absolute http(s) URL, NULL otherwise:
    lowercased scheme and host, default port dropped (``:80`` http /
    ``:443`` https; explicit non-default ports kept), fragment removed,
    tracking query params (``utm_*``, click ids) filtered out, a
    now-empty query dropped entirely. Path, param order, and non-tracking
    params are preserved byte-for-byte — canonicalization only removes
    what can never distinguish two documents."""
    scheme = _scheme(url)
    rest = F.regexp_extract(url, _SCHEME_RE + r"(.*)$", 2)
    nofrag = F.substring_index(rest, "#", 1)
    hostport = F.regexp_extract(nofrag, r"^([^/?]*)", 1)
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    # path+query = everything after host[:port]
    pathq = F.substring(nofrag, F.length(hostport) + F.lit(1), F.lit(1 << 30))
    path = F.substring_index(pathq, "?", 1)
    query = F.when(
        pathq.contains("?"),
        F.substring(pathq, F.length(path) + F.lit(2), F.lit(1 << 30)),
    ).otherwise(F.lit(""))
    kept_params = F.filter(
        F.split(query, "&"),
        lambda prm: ~_any_prefix(prm, tracking_prefixes) & (prm != ""),
    )
    query_out = F.when(
        F.size(kept_params) > 0, F.concat(F.lit("?"), F.array_join(kept_params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        query_out,
    )
    return F.when(scheme.isNotNull() & (host != ""), canon)


def _any_prefix(prm: Column, prefixes: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for p in prefixes:
        out = out | prm.startswith(p)
    return out


def domain_caps(
    df: DataFrame,
    url_col: str = "url",
    quality_col: str = "quality",
    max_per_domain: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap: adds ``url_canon``, ``domain``,
    ``domain_rank`` (1 = best document of its domain by ``quality_col``
    desc, ``id_col`` asc — a total order, so deterministic), and
    ``kept`` (rank <= cap). Rows whose URL is not absolute http(s) get
    NULL domain and are never kept — route them explicitly.

    Scale shape: the canonical/domain columns ride the scan (pure
    Catalyst, no shuffle); the rank is ONE hash-partitioned window over
    ``domain``. A megadomain (a single domain holding a meaningful
    fraction of 10^12 rows) serializes its own partition's sort — the
    standard rail is pre-filtering with an approximate per-domain count
    (``hot_cell_map``-style) or AQE skew-join on the downstream join;
    at realistic web-domain cardinality (~10^8 domains) the window is
    well balanced."""
    canon = canonical_url_expr(F.col(url_col))
    dom = registrable_domain_expr(host_expr(F.col(url_col)))
    out = df.withColumn("url_canon", canon).withColumn("domain", dom)
    w = Window.partitionBy("domain").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    out = out.withColumn("domain_rank", F.row_number().over(w))
    return out.withColumn(
        "kept", F.col("domain").isNotNull() & (F.col("domain_rank") <= max_per_domain)
    )
