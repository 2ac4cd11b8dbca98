"""URL normalization and host/domain analysis for web corpora.

Common-Crawl-scale pipelines key almost everything on the URL: exact
re-crawl dedup wants a canonical form (tracking params and fragments
stripped, scheme/host case-folded, default ports dropped), and
blocklists / per-site quotas / domain mixing statistics all key on the
registered domain. The recipes here follow the public CCNet / C4
preprocessing shape.

Reference scope note: the reference importer takes file paths, not
URLs (see /root/reference/graphalytics_importer.py's local file-set
handling) — URL hygiene is part of this repo's web-pipeline surface.

Scale shape (100 TB):
* ``normalize_url`` / ``host_of`` / ``registered_domain`` are chains of
  ``regexp_replace`` / ``regexp_extract`` — JVM codegen expressions, no
  UDF, no shuffle. Canonical-URL dedup is then the same one-aggregate
  exact-dedup shape as ``dedup.exact_dup_groups``.
* Per-domain counts aggregate on the registered domain. Domain keys are
  Zipf-skewed at web scale (a handful of hosts dominate); counting is
  safe (map-side partials absorb the skew) but anything carrying
  payloads per domain should reach for ``skew.salted_topk`` /
  ``salted_collect_set``.
* Patterns avoid lookaround so Java regex (Spark) and RE2 (DuckDB
  oracle) execute the identical pattern text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://authority prefix (group 1) — everything up to the first
# /, ?, or # after the "//".
_PREFIX = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
# Tracking parameters stripped by the canonical form (the usual
# click-id set; extend per deployment).
TRACKING_PARAM = r"(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_eid)"
# Multi-label public suffixes we recognise for registered-domain
# extraction. A real deployment ships the full public-suffix list as a
# broadcast table; this inlined subset keeps the operator dependency-free
# and the oracle replayable, and the cut is documented, not silent.
_MULTI_SUFFIX = r"(co\.uk|com\.au|co\.jp|com\.br|co\.in|co\.nz|org\.uk|ac\.uk)"


def host_of(url: Column | str) -> Column:
    """Lower-cased authority host (port and userinfo stripped)."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(u, _PREFIX, 1)
    host = F.regexp_replace(host, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.regexp_replace(host, r"^[^@]*@", "")  # userinfo
    host = F.regexp_replace(host, r":[0-9]+$", "")  # port
    return F.lower(host)


def registered_domain(host: Column | str) -> Column:
    """Registrable domain of a host: last two labels, or last three
    when the suffix is a known multi-label public suffix (see
    ``_MULTI_SUFFIX`` for the documented subset)."""
    h = F.col(host) if isinstance(host, str) else host
    multi = F.regexp_extract(h, r"([^.]+\." + _MULTI_SUFFIX + r")$", 1)
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(multi != "", multi).otherwise(F.when(two != "", two).otherwise(h))


def normalize_url(url: Column | str) -> Column:
    """Canonical URL: userinfo and fragment dropped, tracking params
    stripped, scheme+host lower-cased, default ports (:80 http /
    :443 https) removed. Path, non-tracking params, and param order are preserved
    (reordering params changes semantics on some sites — a stronger
    canonicalizer is a policy choice layered on top)."""
    u = F.col(url) if isinstance(url, str) else url
    # 0. drop userinfo — it is case-sensitive (the case-fold below must
    # not touch it) and never part of a canonical identity
    u = F.regexp_replace(u, r"^([A-Za-z][A-Za-z0-9+.-]*://)[^/?#@]*@", r"$1")
    # 1. drop fragment
    u = F.regexp_replace(u, r"#.*", "")
    # 2. strip tracking params, keeping the delimiter of the match …
    u = F.regexp_replace(u, r"([?&])" + TRACKING_PARAM + r"=[^&]*", r"$1")
    # … then collapse the dangling delimiters the removal leaves behind:
    u = F.regexp_replace(u, r"\?[?&]+", "?")  # "?&real" -> "?real"
    u = F.regexp_replace(u, r"&&+", "&")      # "a=1&&b=2" -> "a=1&b=2"
    u = F.regexp_replace(u, r"[?&]+$", "")    # trailing "?" / "&"
    # 3. case-fold scheme://host, leave path+query untouched
    u = F.concat(
        F.lower(F.regexp_extract(u, _PREFIX, 1)),
        F.regexp_replace(u, _PREFIX, ""),
    )
    # 4. drop default ports
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80([/?]|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443([/?]|$)", r"$1$2")
    return u


def registered_domain_psl(
    df,
    host_col: str,
    psl,
    suffix_col: str = "suffix",
    out_col: str = "registered_domain",
):
    """Registrable domain via a caller-supplied public-suffix table —
    the full-PSL path next to the dependency-free ``registered_domain``
    regex subset (the documented cut at ``_MULTI_SUFFIX``).

    ``psl`` is a DataFrame with one public suffix per row ('com',
    'co.uk', 'pvt.k12.ma.us', ...).  Longest-match semantics, per the
    public-suffix algorithm: each host generates its proper label
    suffixes (a handful of rows — hosts have ~2-6 labels), those join
    the broadcast suffix table, and the match with the most labels
    wins; the registered domain is that suffix plus one label.  Hosts
    matching no listed suffix fall back to the PSL's implicit '*' rule
    (last label is the suffix -> registered domain = last two labels).

    Scale shape: the PSL is ~10k rows — a classic broadcast dim; the
    corpus side explodes ~4x on label suffixes and reduces back to one
    row per distinct host with an algebraic max_by (map-side partials),
    so the corpus is never shuffled by anything hotter than the host
    key itself.  Returns ``df`` plus ``out_col``.
    """
    labels = F.split(F.col("__host"), r"\.")
    n = F.size(labels)
    cands = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hosts = df.select(F.col(host_col).alias("__host")).distinct()
    ex = hosts.select("__host", F.explode(cands).alias("__cand"))
    hit = (
        ex.join(
            F.broadcast(psl.select(F.col(suffix_col).alias("__cand")).distinct()),
            "__cand",
        )
        .groupBy("__host")
        .agg(F.expr("max_by(__cand, length(__cand))").alias("__suffix"))
    )
    joined = df.join(hit, df[host_col] == hit["__host"], "left").drop("__host")
    h_labels = F.split(F.col(host_col), r"\.")
    h_n = F.size(h_labels)
    k = F.size(F.split(F.col("__suffix"), r"\."))
    reg = F.array_join(F.slice(h_labels, h_n - k, k + 1), ".")
    fallback = F.when(
        F.regexp_extract(F.col(host_col), r"([^.]+\.[^.]+)$", 1) != "",
        F.regexp_extract(F.col(host_col), r"([^.]+\.[^.]+)$", 1),
    ).otherwise(F.col(host_col))
    return joined.withColumn(
        out_col, F.when(F.col("__suffix").isNotNull(), reg).otherwise(fallback)
    ).drop("__suffix")


def blocklist_filter(
    df,
    url_col: str,
    blocklist,
    domain_col: str = "domain",
    category_col: str = "category",
):
    """UT1-style URL filtering: mark pages whose REGISTERED DOMAIN is on
    a blocklist (the corpus-hygiene step every public web-text pipeline
    runs — C4 / RefinedWeb drop whole domains from curated category
    lists; the list itself is caller-supplied policy, not code).

    ``blocklist`` is a DataFrame of (domain, category).  Returns ``df``
    plus ``domain`` (registered domain of the url), ``blocked`` boolean,
    and ``block_category`` (null when allowed).  Matching is on the
    registered domain, so "ads.example.com" is blocked by an
    "example.com" entry — the standard domain-level semantics.

    Scale shape (100 TB): blocklists are 10^4-10^6 rows — a broadcast
    dim; the corpus side is one regex projection plus a broadcast left
    join, zero shuffle on the fact side (the reference's analogous
    existence gating is the per-row server probe at edge_list.py:47-58).
    """
    with_domain = df.withColumn("domain", registered_domain(host_of(url_col)))
    dim = blocklist.select(
        F.col(domain_col).alias("domain"),
        F.col(category_col).alias("block_category"),
    )
    return (
        with_domain.join(F.broadcast(dim), "domain", "left")
        .withColumn("blocked", F.col("block_category").isNotNull())
    )


def extract_links(
    df,
    html_col: str = "html",
    url_col: str = "url",
    absolute_only: bool = True,
):
    """Hyperlink extraction: one row per ``href`` in each page's HTML ->
    ``(url, link)``.

    The web link graph is the other graph hiding in a Common-Crawl
    corpus (the reference imports explicit edge lists,
    edge_list.py:30-44; a crawl carries its edges inside the payload).
    Pure ``regexp_extract_all`` over the decoded html + one explode —
    JVM codegen, no UDF, no shuffle; the pattern is lookaround-free so
    the DuckDB oracle executes the identical text.

    ``absolute_only=True`` keeps http(s) targets and drops
    relative/mailto/javascript hrefs — a documented cut: resolving
    relative hrefs needs the base-url join of a full crawler, and
    host-graph analytics (the consumer here) only sees absolute
    cross-site edges anyway.
    """
    links = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"), F.lit('href="([^"]*)"'), F.lit(1)
    )
    out = df.select(F.col(url_col).alias("url"), F.explode(links).alias("link"))
    if absolute_only:
        out = out.filter(F.col("link").rlike("^https?://"))
    return out


def host_link_graph(links, src_url: str = "url", dst_url: str = "link"):
    """Aggregate page-level links into the host graph:
    ``(src_host, dst_host, n_links)``, self-loops dropped.

    One hash aggregate on the (src_host, dst_host) pair; host keys are
    Zipf-skewed at web scale but counting is partial-agg-safe (the same
    argument as the per-domain rollup above).  The result feeds the
    graph analytics catalog directly (pagerank/cc/kcore over hosts).
    """
    e = links.select(
        host_of(F.col(src_url)).alias("src_host"),
        host_of(F.col(dst_url)).alias("dst_host"),
    ).filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


# one full <a ...>text</a> element: group 1 = href, group 2 = anchor
# text (innermost text only — nested markup ends the capture at the
# first '<', the standard cheap-parse cut).  Lookaround-free so Spark
# (Java regex) and the DuckDB oracle (RE2) run the identical pattern.
ANCHOR_PATTERN = '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchors(
    df,
    html_col: str = "html",
    url_col: str = "url",
    absolute_only: bool = True,
):
    """Anchor extraction: one row per ``<a href=...>text</a>`` element
    -> ``(url, link, anchor)``.

    The anchor-text sibling of ``extract_links``: where that feeds the
    host GRAPH, this feeds the alias DICTIONARY — anchor text is how
    the web names entities, and mining it is the published recipe for
    building the broadcast alias tables the entity-linking stage
    consumes (Spitkovsky & Chang 2012's Crosswikis dictionary is built
    exactly this way from hyperlink anchors).

    Same execution shape as ``extract_links``: two
    ``regexp_extract_all`` passes over the decoded html (group 1 =
    href, group 2 = text) zipped positionally, one explode — JVM
    codegen, no UDF, no shuffle.  Rows with empty anchor text are
    dropped (an image link names nothing).
    """
    h = F.decode(F.col(html_col), "UTF-8")
    pairs = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), F.lit(1)).alias("link"),
        F.regexp_extract_all(h, F.lit(ANCHOR_PATTERN), F.lit(2)).alias(
            "anchor"
        ),
    )
    out = (
        df.select(F.col(url_col).alias("url"), F.explode(pairs).alias("a"))
        .select("url", F.col("a.link").alias("link"), F.col("a.anchor").alias("anchor"))
        .filter(F.col("anchor") != "")
    )
    if absolute_only:
        out = out.filter(F.col("link").rlike("^https?://"))
    return out


def anchor_alias_candidates(
    anchors,
    min_count: int = 2,
    min_prob: float = 0.0,
    by_host: bool = True,
    normalize: bool = True,
):
    """Anchor-text alias dictionary: ``(alias, dst, n, prob)`` where
    ``alias`` is the normalized anchor string (lower-cased, whitespace
    collapsed, trimmed), ``dst`` is the link target (host by default,
    canonical URL with ``by_host=False``), ``n`` the number of anchor
    occurrences naming that target, and ``prob = n / total(alias)`` the
    link probability P(dst | alias) — the Crosswikis statistic the
    linking stage scores candidates with.

    Scale shape: two hash aggregates and one alias-keyed equi-join.
    Counting (alias, dst) pairs is partial-agg-safe under the Zipf skew
    of generic anchors ("here", "read more"): map-side combine
    collapses each partition to distinct pairs before the exchange.
    The per-alias total is a second aggregate OVER THE PAIR COUNTS
    (already tiny vs the corpus), joined back on alias — hot aliases
    are exactly the generic ones, which ``min_prob`` then discards
    (a "here" pointing at 10^6 hosts has prob ~0 for each), so the
    skewed join keys never survive to the consumer; AQE's skew-join
    split covers the join itself.  The result is the ≤dictionary-size
    table the pipeline BROADCASTS to the linking stage.

    ``normalize=True`` folds case and whitespace (the dedup normal
    form) — right for recall statistics; ``normalize=False`` keeps the
    exact surface string (trimmed only) — right when the dictionary
    feeds a case-sensitive surface matcher like
    ``mentions.detect_mentions``.
    """
    from graph_importer_spark.operators.textstats import normalize_text

    dst = host_of(F.col("link")) if by_host else normalize_url(F.col("link"))
    alias_expr = (
        normalize_text(F.col("anchor"))
        if normalize
        else F.trim(F.col("anchor"))
    )
    pairs = (
        anchors.select(alias_expr.alias("alias"), dst.alias("dst"))
        .filter(F.col("alias") != "")
        .groupBy("alias", "dst")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("alias").agg(F.sum("n").alias("_total"))
    out = pairs.join(totals, "alias").select(
        "alias",
        "dst",
        "n",
        F.round(F.col("n") / F.col("_total"), 6).alias("prob"),
    )
    return out.filter((F.col("n") >= min_count) & (F.col("prob") >= min_prob))


def alias_table(candidates, entity: Column | None = None):
    """Adapt ``anchor_alias_candidates`` output to the
    ``(alias, entity, prior)`` gazetteer schema the mention-detection
    and linking stages consume (pipeline.py's ``aliases`` input): the
    link target IS the entity by default — the canonical-page
    convention of anchor dictionaries — and the link probability
    becomes the prior.  Pass ``entity`` to map the target to your
    entity-id scheme (e.g. extract an id from the host)."""
    ent = entity if entity is not None else F.col("dst")
    return candidates.select(
        "alias", ent.alias("entity"), F.col("prob").alias("prior")
    )


def extract_meta(df, html_col: str = "html", url_col: str = "url"):
    """Page-metadata extraction: ``(url, title, meta_description,
    canonical_url, noindex)`` from the raw HTML.

    The head metadata drives three standard corpus decisions the text
    body cannot: canonical-URL dedup (``<link rel="canonical">`` is the
    site's own statement of page identity — join it into the exact-dup
    keyer ahead of ``normalize_url``), robots exclusion (``noindex``
    pages are removed by polite corpora), and title-bearing quality /
    alias signals (titles are alias candidates exactly like anchor
    text).

    Same execution contract as the extractors above: lookaround-free
    ``regexp_extract`` chains over the decoded html — codegen, no UDF,
    no shuffle, oracle-replayable.  Missing fields come back as empty
    strings (''), not NULL, so downstream predicates stay null-free;
    attribute matching tolerates any attribute order for the
    name/content pair via two alternative patterns.
    """
    h = F.decode(F.col(html_col), "UTF-8")
    title = F.regexp_extract(h, "<title[^>]*>([^<]*)</title>", 1)
    # <meta name="description" content="..."> in either attribute order
    d1 = F.regexp_extract(
        h, '<meta name="description" content="([^"]*)"', 1
    )
    d2 = F.regexp_extract(
        h, '<meta content="([^"]*)" name="description"', 1
    )
    canon = F.regexp_extract(
        h, '<link rel="canonical" href="([^"]*)"', 1
    )
    robots = F.regexp_extract(h, '<meta name="robots" content="([^"]*)"', 1)
    return df.select(
        F.col(url_col).alias("url"),
        title.alias("title"),
        F.when(d1 != "", d1).otherwise(d2).alias("meta_description"),
        canon.alias("canonical_url"),
        robots.contains("noindex").alias("noindex"),
    )


def url_dedup(
    df,
    url_col: str,
    id_col: str,
    quality_col: str,
):
    """Canonical-URL exact dedup: normalize each row's URL
    (:func:`normalize_url` — scheme/case/default-port/fragment/
    tracking-param stripping) and keep ONE document per canonical
    form — the highest ``quality_col``, ties broken by SMALLEST id (a
    total order; dedup must be deterministic to be resumable).  The
    standard crawl-level pass that runs BEFORE text dedup: the same
    page fetched via http/https/utm-tagged variants collapses here
    for free, no shingling needed.

    -> (canonical_url, n_dups, <id_col>, <quality_col>) of the kept
    document per canonical URL.

    Scale shape: ONE aggregate keyed on the canonical URL — max_by
    over a (quality, -id)-ordered struct, partial-agg absorbed (the
    hot key IS the duplicated page, exactly what combines map-side);
    no window, no self-join.
    """
    canon = normalize_url(F.col(url_col))
    row = F.struct(F.col(id_col).alias("id"), F.col(quality_col).alias("q"))
    # requires a NUMERIC id: the smallest-id tiebreak rides max_by's
    # ordering struct as (quality, -id)
    order = F.struct(
        F.col(quality_col).alias("q"), (-F.col(id_col)).alias("nid")
    )
    return (
        df.select(canon.alias("canonical_url"), row.alias("_r"), order.alias("_o"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_dups"),
            F.max_by("_r", "_o").alias("_keep"),
        )
        .select(
            "canonical_url",
            "n_dups",
            F.col("_keep.id").alias(id_col),
            F.col("_keep.q").alias(quality_col),
        )
    )


def url_templates(
    pages: DataFrame,
    url_col: str,
    min_count: int = 2,
    k: int = 3,
) -> DataFrame:
    """Crawl path-template mining: generalize each URL's path by
    replacing digit runs with ``{n}`` and long hex runs with ``{h}``,
    then roll up per (host, template) — the sitemap-shape report a
    crawler uses to spot calendar traps, pagination families, and
    session-id URL spam (cf. the URL-frontier dedup rules in Olston &
    Najork, "Web Crawling", 2010).

    -> (host, template, n_urls, sample) with n_urls >= ``min_count``;
    ``sample`` = first ``k`` distinct raw paths (sorted).

    Scale shape: template is pure regexp codegen on the scan; ONE
    (host, template)-keyed aggregate with partial counts; the sample
    collect_set is k-sliced and bounded by the family size being
    reported.  No joins.
    """
    path = F.regexp_replace(
        F.regexp_extract(normalize_url(F.col(url_col)), r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1),
        r"^$", "/",
    )
    tpl = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{h}"),
        r"[0-9]+", "{n}",
    )
    return (
        pages.select(
            host_of(F.col(url_col)).alias("host"),
            tpl.alias("template"),
            path.alias("_path"),
        )
        .groupBy("host", "template")
        .agg(
            F.count("*").alias("n_urls"),
            F.array_join(
                F.slice(F.array_sort(F.collect_set("_path")), 1, k), ","
            ).alias("sample"),
        )
        .filter(F.col("n_urls") >= min_count)
    )


def crawl_frontier(
    df,
    url_col: str = "url",
    priority_col: str = "priority",
    max_per_host: int = 100,
    seed: int = 42,
):
    """Polite crawl-frontier scheduling: at most ONE fetch per host per
    wave (the politeness invariant), higher ``priority_col`` first
    within a host (ties to the lexicographically smaller URL), capped
    at ``max_per_host`` queued URLs per host per scheduling round.
    ``slot`` spreads each wave's fetches across workers as a pure
    md5 function of (host, wave) — no coordination, stable across
    partitionings.

    -> (url, host, priority, wave, slot), wave 0-based.

    Scale shape: the per-host queue rank is a host-partitioned window
    — per-host state is bounded by ``max_per_host`` x nothing: the
    window itself ranks the host's full queue, so a Zipf-hot host
    (crawl frontiers are exactly that) should be pre-capped with
    ``sampling.domain_quota_sample`` / the two-phase ``salted_topk``
    when its queue dwarfs ``max_per_host``; the cap filter here keeps
    the OUTPUT bounded either way.  Slot assignment is zero-shuffle
    codegen.
    """
    from pyspark.sql import Window

    u = F.col(url_col)
    host = host_of(u).alias("host")
    w = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    q = (
        df.select(u.alias("url"), host, F.col(priority_col).alias("priority"))
        .withColumn("wave", F.row_number().over(w) - 1)
        .filter(F.col("wave") < max_per_host)
    )
    slot = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws(
                        "@",
                        "host",
                        F.col("wave").cast("string"),
                        F.lit(str(seed)),
                    ),
                    "UTF-8",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return q.select("url", "host", "priority", "wave", slot.alias("slot"))
