"""URL canonicalization — step zero of every web-corpus pipeline.

Common-Crawl-style inputs key everything on ``url`` (the reference
keys its hash rows by document id the same way —
/root/reference/apollo/hasher.py:179 zips ``bow.documents`` ids with
their hashes), and raw crawl URLs are noisy: the same page appears as ``HTTP://Site.com/a/``,
``http://site.com:80/a`` and ``http://site.com/a?utm_source=x``.
Canonicalizing before url-keyed dedup / latest-version election
collapses those spellings so downstream exact/near dedup sees one key
per page.

Rules (documented, deterministic, reversible-free):

1. strip the ``#fragment``;
2. lowercase scheme and authority (host);
3. drop the scheme's default port (``:80`` http, ``:443`` https);
4. collapse trailing ``/`` runs on the path (root stays ``/``; an
   empty path becomes ``/``);
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref_src``) and empty params;
6. sort surviving query params bytewise (``a=1&b=2`` == ``b=2&a=1``).

Strings without a ``scheme://`` authority pass through with only the
fragment strip — the conservative choice for junk rows.

Scale shape: pure map — no shuffle, no state.  Steps 1–4 run as Arrow
compute kernels over the whole batch; only rows that actually carry a
``?query`` (a minority of crawl URLs) take the per-row param
normalization, and host extraction is a vectorized byproduct, so
host-level grouping downstream needs no re-parse.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# authority-form urls: scheme://auth(rest)
_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
           r"(?P<auth>[^/?#]*)(?P<rest>.*)$")
_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src)="


def _norm_query(q: str) -> str:
    """Drop tracking/empty params, sort the rest bytewise."""
    import re
    keep = sorted(p for p in q.split("&")
                  if p and not re.match(_TRACKING_RE, p))
    return "&".join(keep)


def canonicalize_url_array(urls: pa.Array) -> tuple[pa.Array, pa.Array]:
    """(canonical_url, host) for a string array.

    Vectorized Arrow regex kernels for fragment/scheme/host/port/path;
    a compiled-regex Python pass only over the rows that carry a query
    string.  Null inputs stay null.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    u = pc.replace_substring_regex(urls, r"#.*$", "")
    parts = pc.extract_regex(u, _URL_RE)
    matched = parts.is_valid()
    if not pc.any(matched).as_py():
        empty = pa.array([""] * len(u), type=pa.string())
        return u, pc.if_else(u.is_valid(), empty, pa.scalar(
            None, type=pa.string()))
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    auth = pc.utf8_lower(pc.struct_field(parts, "auth"))
    rest = pc.struct_field(parts, "rest")
    # default ports are scheme-conditional
    auth = pc.if_else(pc.equal(scheme, "http"),
                      pc.replace_substring_regex(auth, r":80$", ""), auth)
    auth = pc.if_else(pc.equal(scheme, "https"),
                      pc.replace_substring_regex(auth, r":443$", ""), auth)
    rp = pc.extract_regex(rest, r"^(?P<path>[^?]*)(?P<qm>\??)(?P<q>.*)$")
    path = pc.struct_field(rp, "path")
    has_q = pc.equal(pc.struct_field(rp, "qm"), "?")
    q = pc.struct_field(rp, "q")
    # trailing-slash collapse; empty path -> "/"
    path = pc.replace_substring_regex(path, r"/+$", "")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    # per-row param normalization only where a query exists
    qi = np.flatnonzero(
        pc.and_(matched, has_q).fill_null(False).to_numpy(
            zero_copy_only=False))
    if len(qi):
        qpy = q.take(pa.array(qi)).to_pylist()
        normed = [_norm_query(x or "") for x in qpy]
        qnp = np.asarray(q.to_pylist(), dtype=object)
        qnp[qi] = normed
        q = pa.array([x if x is not None else None for x in qnp],
                     type=pa.string())
    qsuffix = pc.if_else(
        pc.and_(has_q, pc.not_equal(q, "")).fill_null(False),
        pc.binary_join_element_wise(pa.array(["?"] * len(u)), q, ""),
        pa.scalar(""))
    canon = pc.binary_join_element_wise(
        scheme, pa.array(["://"] * len(u)), auth, path, qsuffix, "")
    out = pc.if_else(matched, canon, u)
    host = pc.if_else(matched,
                      pc.replace_substring_regex(auth, r"^[^@]*@", ""),
                      pa.scalar("", type=pa.string()))
    host = pc.if_else(u.is_valid(), host, pa.scalar(None, type=pa.string()))
    return out, host


def canonical_urls(pages: "ray.data.Dataset", url_col: str = "url",
                   id_col: str = "doc_id") -> "ray.data.Dataset":
    """(id, url_canon, host) map pass over a url-keyed table."""
    def xform(batch: pa.Table) -> pa.Table:
        canon, host = canonicalize_url_array(batch.column(url_col))
        return pa.table({id_col: batch.column(id_col),
                         "url_canon": canon, "host": host})
    return pages.map_batches(xform, batch_format="pyarrow")


def url_host_stats(pages: "ray.data.Dataset", url_col: str = "url",
                   id_col: str = "doc_id", num_partitions: int = 64
                   ) -> "ray.data.Dataset":
    """(host, n_urls, n_canonical) — per-host crawl-dup report: how
    many raw URLs each host contributed and how many DISTINCT pages
    remain after canonicalization.  One pkey shuffle of
    (host, url_canon) metadata rows — 2 short strings per input row,
    never the payload; each host lands in exactly one partition so the
    distinct count is exact without a second exchange."""
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    def meta(batch: pa.Table) -> pa.Table:
        canon, host = canonicalize_url_array(batch.column(url_col))
        hs = host.to_pylist()
        h = np.fromiter((hash_utf8(x or "") for x in hs), dtype=np.int64,
                        count=len(hs))
        return pa.table({
            "host": host, "url_canon": canon,
            "pkey": pa.array(mix_to_partition(h, num_partitions),
                             type=pa.int32())})

    def per_host(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"host": pa.array([], type=pa.string()),
                             "n_urls": pa.array([], type=pa.int64()),
                             "n_canonical": pa.array([], type=pa.int64())})
        tg = group.group_by("host").aggregate(
            [("url_canon", "count"), ("url_canon", "count_distinct")])
        return pa.table({
            "host": tg.column("host"),
            "n_urls": tg.column("url_canon_count").cast(pa.int64()),
            "n_canonical": tg.column("url_canon_count_distinct").cast(
                pa.int64())})

    return pages.map_batches(meta, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_host, batch_format="pyarrow")


def _topk_per_host(group: pa.Table, k: int) -> pa.Table:
    """Vectorized per-host top-k of (host, doc_id, score) rows.

    Sort by (host, -score, doc_id), mark each row's position inside
    its host run, keep positions < k.  Deterministic: doc_id is the
    unique tiebreak.  Returns host, doc_id, score, host_rank (1-based).
    """
    if group.num_rows == 0:
        return pa.table({"host": pa.array([], type=pa.string()),
                         "doc_id": pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.int64()),
                         "host_rank": pa.array([], type=pa.int64())})
    host = group.column("host")
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    codes = pc.dictionary_encode(host).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    ids = np.asarray(group.column("doc_id"), dtype=np.int64)
    score = np.asarray(group.column("score"), dtype=np.int64)
    order = np.lexsort((ids, -score, codes))
    c_s, i_s, s_s = codes[order], ids[order], score[order]
    # position of each row within its host run
    new_run = np.empty(len(c_s), dtype=bool)
    new_run[0] = True
    new_run[1:] = c_s[1:] != c_s[:-1]
    run_start = np.flatnonzero(new_run)
    pos = np.arange(len(c_s)) - np.repeat(
        run_start, np.diff(np.append(run_start, len(c_s))))
    keep = pos < k
    sel = pa.array(order[keep])
    return pa.table({
        "host": host.take(sel),
        "doc_id": pa.array(i_s[keep], type=pa.int64()),
        "score": pa.array(s_s[keep], type=pa.int64()),
        "host_rank": pa.array(pos[keep] + 1, type=pa.int64())})


def per_host_topk(pages: "ray.data.Dataset", k: int = 10,
                  url_col: str = "url", id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 64
                  ) -> "ray.data.Dataset":
    """Per-host quality quota: keep the top-``k`` docs of every host by
    score (descending; ``doc_id`` breaks ties), score = character
    length of ``text_col`` — the domain-cap step of web-corpus
    curation (a handful of boilerplate-heavy hosts otherwise dominate
    a crawl; cf. the per-repo grouping the reference's bags stage
    keys on, /root/reference/apollo/bags.py:36-37).

    Scale shape: the map side extracts (host, doc_id, score) — the
    payload never moves — and pre-filters each BATCH to its own
    per-host top-k, so the host-keyed exchange carries at most
    k rows per (host, input block): the final top-k of a host is a
    subset of the union of per-batch top-ks.  One pkey shuffle;
    each host lands in exactly one partition, where the final rank
    is assigned.  Output: (host, doc_id, score, host_rank).
    """
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    def meta(batch: pa.Table) -> pa.Table:
        _, host = canonicalize_url_array(batch.column(url_col))
        host = host.fill_null("")
        score = pc.utf8_length(batch.column(text_col)).cast(
            pa.int64()).fill_null(0)
        t = pa.table({"host": host,
                      "doc_id": batch.column(id_col).cast(pa.int64()),
                      "score": score})
        t = _topk_per_host(t, k).drop_columns(["host_rank"])
        hs = t.column("host").to_pylist()
        h = np.fromiter((hash_utf8(x or "") for x in hs), dtype=np.int64,
                        count=len(hs))
        return t.append_column(
            "pkey", pa.array(mix_to_partition(h, num_partitions),
                             type=pa.int32()))

    def per_host(group: pa.Table) -> pa.Table:
        return _topk_per_host(group, k)

    return pages.map_batches(meta, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_host, batch_format="pyarrow")


def per_host_topk_sql(k: int = 10, table: str = "documents") -> str:
    """DuckDB oracle for :func:`per_host_topk` over the synthetic url
    construction (host from the same canonicalization CTE; score =
    character length of text; row_number for the rank)."""
    return (f"WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url "
            f"FROM {table}),"
            + _CANON_SQL
            + f""",
    scored AS (
      SELECT c.host, d.doc_id,
             CAST(length(d.text) AS BIGINT) AS score
      FROM canon c JOIN {table} d USING (doc_id))
    SELECT host, doc_id, score,
           CAST(row_number() OVER (
             PARTITION BY host ORDER BY score DESC, doc_id
           ) AS BIGINT) AS host_rank
    FROM scored
    QUALIFY host_rank <= {k}""")


def synthetic_crawl_urls(doc_id: np.ndarray) -> list[str]:
    """Deterministic messy-URL test vectors keyed by doc id (the
    driver's tables carry no url column, so oracle queries derive one
    identically on both sides).  Exercises every canonicalization
    rule — default port, non-default port kept, tracking params,
    param order, trailing slashes, fragment — and plants real
    cross-spelling collisions: ids i and i+350 with i % 4 == 0 spell
    the SAME canonical page two different ways."""
    out = []
    for i in np.asarray(doc_id, dtype=np.int64).tolist():
        h, p, c = i % 7, i % 50, i % 4
        base = "HTTPS://Site%d.Example.COM" % h
        if c == 0:
            out.append(base + ":443/p/%d/?utm_source=x&b=2&a=1#frag" % p)
        elif c == 1:
            out.append(base + ":8080/p/%d" % p)
        elif c == 2:
            out.append(base + "/p/%d?b=2&utm_campaign=c&a=1&" % p)
        else:
            out.append(base + "/p/%d//" % p)
    return out


_SYNTH_URL_SQL = """
      'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' ||
      CASE CAST(doc_id % 4 AS INTEGER)
        WHEN 0 THEN ':443/p/' || CAST(doc_id % 50 AS VARCHAR)
                    || '/?utm_source=x&b=2&a=1#frag'
        WHEN 1 THEN ':8080/p/' || CAST(doc_id % 50 AS VARCHAR)
        WHEN 2 THEN '/p/' || CAST(doc_id % 50 AS VARCHAR)
                    || '?b=2&utm_campaign=c&a=1&'
        ELSE '/p/' || CAST(doc_id % 50 AS VARCHAR) || '//'
      END
"""

# SQL twin of canonicalize_url_array for authority-form urls
_CANON_SQL = r"""
    s AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u0 FROM u),
    p AS (SELECT doc_id, u0,
           lower(regexp_extract(u0,
                 '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
           lower(regexp_extract(u0,
                 '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS auth0,
           regexp_extract(u0,
                 '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?]*)', 1) AS path0,
           CASE WHEN strpos(u0, '?') > 0
                THEN substr(u0, strpos(u0, '?') + 1) ELSE NULL END AS q0
          FROM s),
    n AS (SELECT doc_id, u0, scheme,
           CASE WHEN scheme = 'http'
                THEN regexp_replace(auth0, ':80$', '')
                WHEN scheme = 'https'
                THEN regexp_replace(auth0, ':443$', '')
                ELSE auth0 END AS auth,
           CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
                ELSE regexp_replace(path0, '/+$', '') END AS path,
           CASE WHEN q0 IS NULL THEN NULL
                ELSE array_to_string(list_sort(list_filter(
                       string_split(q0, '&'),
                       x -> length(x) > 0 AND NOT regexp_matches(x,
                         '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src)='
                       ))), '&') END AS q
          FROM p),
    canon AS (
      SELECT doc_id,
             CASE WHEN scheme = '' OR scheme IS NULL THEN u0
                  ELSE scheme || '://' || auth || path ||
                       CASE WHEN q IS NOT NULL AND q <> ''
                            THEN '?' || q ELSE '' END
             END AS url_canon,
             CASE WHEN scheme = '' OR scheme IS NULL THEN ''
                  ELSE regexp_replace(auth, '^[^@]*@', '') END AS host
      FROM n)
"""


def canonical_urls_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`canonical_urls` over the synthetic
    url construction — every rule replicated with RE2 + list
    lambdas."""
    return (f"WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url "
            f"FROM {table}),"
            + _CANON_SQL
            + " SELECT doc_id, url_canon, host FROM canon")


def url_host_stats_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`url_host_stats` (same construction)."""
    return (f"WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url "
            f"FROM {table}),"
            + _CANON_SQL
            + """ SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
                   CAST(count(DISTINCT url_canon) AS BIGINT) AS n_canonical
            FROM canon GROUP BY host""")


# ---------------------------------------------------------------------------
# hostlist_filter: domain blocklist/allowlist matching (the UT1-style
# domain-filter step of web-corpus curation)

def _suffix_masks(hostname: pa.Array, by_labels: dict[int, list[str]]
                  ) -> np.ndarray:
    """Blocked mask: hostname's last-k-label suffix is in the k-label
    entry set, for each label count k present in the list.  One RE2
    extract + one ``is_in`` per k — fully vectorized; the leftmost
    RE2 match of ``(?:[^.]+\\.){k-1}[^.]+$`` is the maximal (hence
    label-aligned) k-label suffix."""
    blocked = np.zeros(len(hostname), dtype=bool)
    for k, entries in by_labels.items():
        if k == 1:
            sfx = pc.extract_regex(hostname, r"(?P<s>[^.]+)$")
        else:
            sfx = pc.extract_regex(
                hostname, r"(?P<s>(?:[^.]+\.){%d}[^.]+)$" % (k - 1))
        s = pc.struct_field(sfx, "s")
        hit = pc.is_in(s, value_set=pa.array(entries, type=pa.string()))
        blocked |= hit.fill_null(False).to_numpy(zero_copy_only=False)
    return blocked


def hostlist_filter(pages: "ray.data.Dataset", domains: list[str],
                    url_col: str = "url", id_col: str = "doc_id",
                    ) -> "ray.data.Dataset":
    """(id, host, blocked) — canonical-host blocklist matching: a page
    is blocked iff its port-stripped canonical hostname equals a
    blocklist domain or is a subdomain of one (hostname ends with
    ``'.' + domain``).

    Scale shape: pure map, no shuffle.  The domain list (UT1-class
    lists are ~1M short strings) is grouped by label count on the
    driver and broadcast ONCE via ``ray.put``; every batch does
    ``<= max_label_count`` vectorized regex-suffix + ``is_in`` passes.
    Matching semantics are exactly SQL's
    ``hostname = d OR ends_with(hostname, '.' || d)``
    (:func:`hostlist_filter_sql`), because the extracted suffix is
    label-aligned.
    """
    import ray

    by_labels: dict[int, list[str]] = {}
    for d in sorted({d.lower().strip(".") for d in domains if d.strip(".")}):
        by_labels.setdefault(d.count(".") + 1, []).append(d)
    bl_ref = ray.put(by_labels)

    def f(batch: pa.Table) -> pa.Table:
        bl = ray.get(bl_ref)
        _, host = canonicalize_url_array(batch.column(url_col))
        hostname = pc.replace_substring_regex(host, r":[0-9]+$", "")
        blocked = _suffix_masks(hostname, bl)
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "host": host,
            "blocked": pa.array(blocked, type=pa.bool_()),
        })

    return pages.map_batches(f, batch_format="pyarrow")


def hostlist_filter_sql(domains: list[str], table: str = "documents"
                        ) -> str:
    """DuckDB oracle for :func:`hostlist_filter` over the synthetic
    url construction: same canonicalization CTE, blocklist matching
    via exact-or-dotted-suffix on the port-stripped hostname."""
    norm = sorted({d.lower().strip(".") for d in domains if d.strip(".")})
    values = ", ".join("('%s')" % d.replace("'", "''") for d in norm)
    return (f"WITH u AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url "
            f"FROM {table}),"
            + _CANON_SQL
            + f""",
    hn AS (SELECT doc_id, host,
                  regexp_replace(host, ':[0-9]+$', '') AS hostname
           FROM canon),
    bl(d) AS (VALUES {values})
    SELECT doc_id, host,
           EXISTS (SELECT 1 FROM bl
                   WHERE hn.hostname = bl.d
                      OR ends_with(hn.hostname, '.' || bl.d)) AS blocked
    FROM hn""")


# ---------------------------------------------------------------------------
# outlink extraction — the web-graph side of a crawl corpus
# ---------------------------------------------------------------------------

_HREF_SEP = 'href="'


def extract_links(pages: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    """(doc_id, link_no, url): every ``href="..."`` value in document
    order — the outlink list a web-graph / anchor-text pipeline starts
    from (the reference's pipeline starts at already-extracted text,
    /root/reference/apollo/bags.py:26; link extraction is the step
    upstream of it).

    Semantics match RE2 ``href="([^"]*)"`` (leftmost, non-overlapping)
    on the documented parity domain: href VALUES do not themselves
    contain the literal ``href="`` substring (true of any real URL —
    ``"`` is not a URL codepoint).  Unterminated trailing hrefs are
    dropped, as the regex drops them.

    Scale shape: pure flat map, no shuffle, no state.  The whole batch
    goes through three vectorized Arrow kernels (split on ``href="``,
    split-once on ``"``, list flatten); there is no per-row Python.
    Output rows == total match count.
    """
    def f(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        parts = pc.split_pattern(t, _HREF_SEP)
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        # fragment 0 precedes the first separator; fragments >= 1 each
        # start right after one `href="` occurrence, in order
        pos = np.arange(len(flat), dtype=np.int64) - offsets[parent]
        closed = pc.count_substring(flat, '"').to_numpy(
            zero_copy_only=False) > 0
        keep = (pos >= 1) & closed
        kept = flat.filter(pa.array(keep))
        kparent = parent[keep]
        url = pc.list_element(
            pc.split_pattern(kept, '"', max_splits=1), 0)
        # 1-based ordinal among kept matches per document
        if len(kparent):
            starts = np.zeros(len(kparent), dtype=bool)
            starts[0] = True
            starts[1:] = kparent[1:] != kparent[:-1]
            start_idx = np.maximum.accumulate(
                np.where(starts, np.arange(len(kparent)), 0))
            link_no = np.arange(len(kparent)) - start_idx + 1
        else:
            link_no = np.zeros(0, dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids[kparent], type=pa.int64()),
            "link_no": pa.array(link_no, type=pa.int64()),
            "url": url})

    return pages.map_batches(f, batch_format="pyarrow")


_ABS_HOST_RE = r"^(?P<h>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<a>[^/?#]*)"


def link_host_counts(pages: "ray.data.Dataset", text_col: str = "text",
                     id_col: str = "doc_id", num_partitions: int = 32
                     ) -> "ray.data.Dataset":
    """(host, n_links) — inbound-link mass per target host over the
    corpus's extracted outlinks; the raw signal behind link-based
    quality weighting.  Relative hrefs (no ``scheme://``) are skipped;
    the host is the lowercased authority with any ``:port`` stripped.

    Scale shape: extract_links' flat map, then a per-batch host
    value_counts partial so only (host, partial_count) rows — bounded
    by distinct hosts per batch — reach the single count exchange.
    """
    links = extract_links(pages, text_col=text_col, id_col=id_col)

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("url")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        ex = pc.extract_regex(u, _ABS_HOST_RE)
        auth = pc.if_else(ex.is_valid(),
                          pc.struct_field(ex, "a"),
                          pa.scalar(None, type=pa.string()))
        host = pc.replace_substring_regex(
            pc.utf8_lower(auth), r":[0-9]+$", "")
        host = host.drop_null()
        if len(host) == 0:
            return pa.table({"host": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        vc = host.value_counts()
        return pa.table({"host": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    partials = links.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("host").sum("n")
    return agg.map_batches(
        lambda b: pa.table({"host": b.column("host"),
                            "n_links": b.column("sum(n)").cast(pa.int64())}),
        batch_format="pyarrow")


def extract_links_sql(table: str = "documents",
                      text_expr: str = "text") -> str:
    """DuckDB oracle for :func:`extract_links`: the RE2 pattern the
    engine's split kernels reproduce, unnested with an ordinality index
    via the generate_series CTE (DuckDB has no lateral
    generate_series(col))."""
    return f"""
WITH ls AS (SELECT doc_id,
                   regexp_extract_all({text_expr}, 'href="([^"]*)"', 1) AS l
            FROM {table}),
mx AS (SELECT coalesce(max(len(l)), 1) AS m FROM ls),
i AS (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS link_no)
SELECT doc_id, link_no, list_extract(l, link_no) AS url
FROM ls, i WHERE link_no <= len(l)"""


def link_host_counts_sql(table: str = "documents",
                         text_expr: str = "text") -> str:
    """DuckDB oracle for :func:`link_host_counts` (same RE2 authority
    pattern, lowercase + port strip, GROUP BY)."""
    return f"""
WITH ls AS (SELECT regexp_extract_all({text_expr}, 'href="([^"]*)"', 1) AS l
            FROM {table}),
u AS (SELECT unnest(l) AS url FROM ls),
h AS (SELECT regexp_replace(
        lower(regexp_extract(url,
              '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)),
        ':[0-9]+$', '') AS host
      FROM u
      WHERE regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://'))
SELECT host, count(*) AS n_links FROM h GROUP BY host"""


_ANCHOR_FRAG_RE = r'^(?P<u>[^"]*)"[^>]*>(?P<t>[^<]*)<'


def anchor_texts(pages: "ray.data.Dataset", text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """(doc_id, pair_no, url, anchor) — every ``<a href="URL" ...>
    ANCHOR<`` pair in document order: the anchor-text harvest that
    feeds web-graph features and weak labels for quality classifiers
    (anchor text describes the TARGET page).

    Semantics match RE2 ``href="([^"]*)"[^>]*>([^<]*)<`` (leftmost,
    non-overlapping) on extract_links' parity domain: every match
    starts at the literal ``href="``, so splitting on that separator
    and anchoring the remainder pattern per fragment enumerates
    exactly the same matches.  Fragments where the attribute list is
    unterminated or the element has no text node are dropped, as the
    regex drops them.

    Scale shape: pure flat map, no shuffle — one split plus one
    vectorized ``extract_regex`` per batch; no per-row Python.
    """
    def f(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        parts = pc.split_pattern(t, _HREF_SEP)
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        pos = np.arange(len(flat), dtype=np.int64) - offsets[parent]
        ex = pc.extract_regex(flat, _ANCHOR_FRAG_RE)
        valid = pc.and_(ex.is_valid(), pa.array(pos >= 1)).to_numpy(
            zero_copy_only=False)
        kept = ex.filter(pa.array(valid))
        kparent = parent[valid]
        if len(kparent):
            starts = np.zeros(len(kparent), dtype=bool)
            starts[0] = True
            starts[1:] = kparent[1:] != kparent[:-1]
            start_idx = np.maximum.accumulate(
                np.where(starts, np.arange(len(kparent)), 0))
            pair_no = np.arange(len(kparent)) - start_idx + 1
        else:
            pair_no = np.zeros(0, dtype=np.int64)
        return pa.table({
            id_col: pa.array(ids[kparent], type=pa.int64()),
            "pair_no": pa.array(pair_no, type=pa.int64()),
            "url": pc.struct_field(kept, "u"),
            "anchor": pc.struct_field(kept, "t")})

    return pages.map_batches(f, batch_format="pyarrow")


def anchor_texts_sql(table: str = "documents",
                     text_expr: str = "text") -> str:
    """DuckDB oracle for :func:`anchor_texts` (same RE2 pattern,
    groups 1 and 2 extracted in two passes and zipped by ordinal)."""
    pat = r'href="([^"]*)"[^>]*>([^<]*)<'
    return f"""
WITH ls AS (SELECT doc_id,
                   regexp_extract_all({text_expr}, '{pat}', 1) AS us,
                   regexp_extract_all({text_expr}, '{pat}', 2) AS ts
            FROM {table}),
mx AS (SELECT coalesce(max(len(us)), 1) AS m FROM ls),
i AS (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS pair_no)
SELECT doc_id, pair_no, list_extract(us, pair_no) AS url,
       list_extract(ts, pair_no) AS anchor
FROM ls, i WHERE pair_no <= len(us)"""


def _host_of(u: pa.Array) -> pa.Array:
    """Lowercased authority of absolute urls with any ``:port``
    stripped; null for relative urls (no ``scheme://``).  The single
    host rule shared by :func:`link_host_counts`,
    :func:`host_pagerank` and their SQL twins."""
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    ex = pc.extract_regex(u, _ABS_HOST_RE)
    auth = pc.if_else(ex.is_valid(), pc.struct_field(ex, "a"),
                      pa.scalar(None, type=pa.string()))
    return pc.replace_substring_regex(pc.utf8_lower(auth),
                                      r":[0-9]+$", "")


_HOST_SQL = ("regexp_replace(lower(regexp_extract({u}, "
             "'^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)), "
             "':[0-9]+$', '')")
_ABS_MATCH_SQL = "regexp_matches({u}, '^[A-Za-z][A-Za-z0-9+.\\-]*://')"


def host_pagerank(pages: "ray.data.Dataset", text_col: str = "text",
                  url_col: str = "url", id_col: str = "doc_id",
                  damping_ppm: int = 850_000, iters: int = 3,
                  num_partitions: int = 32,
                  driver_max_edges: int = 5_000_000,
                  method: str = "auto") -> "ray.data.Dataset":
    """(host, rank_ppm) — integer-exact PageRank over the distinct
    host->host outlink graph (the Common-Crawl-style domain-quality
    signal: rank hosts by where the crawl's links point).

    Graph: src = host of the page's own url, dst = host of each
    absolute extracted ``href`` (same RE2/authority rule as
    :func:`link_host_counts`); relative links and self-edges
    (src == dst, i.e. intra-site navigation) are dropped; edges are
    DISTINCT pairs.  Same href parity domain as :func:`extract_links`:
    the engine's split-on-``href="`` scan and the SQL twin's RE2
    ``href="([^"]*)"`` agree whenever href VALUES do not themselves
    contain the literal ``href="`` substring.  KNOWN DIVERGENCE
    outside that domain (e.g. the malformed ``href="a href="b"``):
    RE2's non-overlapping scan captures ``a href=`` and consumes the
    second opener, while the engine drops the unclosed chunk and
    extracts ``b`` — on messy crawl HTML the engine's reading is the
    useful one, so the gap is documented rather than papered over
    (mirrored note on :func:`host_pagerank_sql`).  Iteration is the unnormalized integer recurrence

        r'(v) = (1e6 - d) + (d * sum over in-edges(u,v) of
                              floor(r(u) / outdeg(u))) // 1e6

    with ``r0 = 1e6`` per host — every operation is int64 floor
    arithmetic, so ``iters`` unrolled rounds are value-exact in SQL
    (:func:`host_pagerank_sql` casts the one product that can exceed
    int64 through HUGEINT; the engine asserts the same bound).

    Scale shape: one flat map emits per-batch-DISTINCT (src, dst)
    pairs; a pkey exchange makes them globally distinct — the edge
    table is bounded by distinct host pairs (crawl-graph edges, not
    page links).  Below ``driver_max_edges`` the iteration runs as
    vectorized numpy on the driver (the host graph of even a large
    crawl is ~1e8 hosts — the same driver-vs-distributed rule as
    ``cc_stage``); above it (``method="distributed"`` forces the
    path) each round is one hash join (attach floor(r/deg) to edges)
    + one sum exchange keyed by dst + one left join back onto the
    host universe.
    """
    import ray.data

    from apollo_ray.hashing import mix_to_partition

    _EDGES_EMPTY = pa.table({"src": pa.array([], type=pa.string()),
                             "dst": pa.array([], type=pa.string()),
                             "pkey": pa.array([], type=pa.int32())})

    def emit_edges(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        src_host = _host_of(batch.column(url_col))
        if isinstance(src_host, pa.ChunkedArray):
            src_host = src_host.combine_chunks()
        parts = pc.split_pattern(t, _HREF_SEP)
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts).to_numpy(
            zero_copy_only=False)
        offsets = parts.offsets.to_numpy(zero_copy_only=False)
        pos = np.arange(len(flat), dtype=np.int64) - offsets[parent]
        closed = pc.count_substring(flat, '"').to_numpy(
            zero_copy_only=False) > 0
        keep = (pos >= 1) & closed
        kept = flat.filter(pa.array(keep))
        kparent = parent[keep]
        url = pc.list_element(pc.split_pattern(kept, '"', max_splits=1), 0)
        dst = _host_of(url)
        src = src_host.take(pa.array(kparent))
        valid = pc.fill_null(
            pc.and_(pc.and_(pc.is_valid(src), pc.is_valid(dst)),
                    pc.invert(pc.equal(src, dst))), False)
        src = src.filter(valid)
        dst = dst.filter(valid)
        if len(src) == 0:
            return _EDGES_EMPTY
        # per-batch distinct pairs: exact cython drop_duplicates on
        # the string columns (the driver loop this replaces built a
        # Python set per batch); pkey only routes, so a vectorized
        # deterministic hash of the joined pair serves it
        import pandas as pd
        df = pd.DataFrame({
            "src": src.to_numpy(zero_copy_only=False),
            "dst": dst.to_numpy(zero_copy_only=False),
        }).drop_duplicates(ignore_index=True)
        comb = df["src"] + "\x00" + df["dst"]
        h = pd.util.hash_array(comb.to_numpy()).view(np.int64)
        return pa.table({"src": pa.array(df["src"], type=pa.string()),
                         "dst": pa.array(df["dst"], type=pa.string()),
                         "pkey": pa.array(
                             mix_to_partition(h, num_partitions),
                             type=pa.int32())})

    def distinct_pairs(group: pa.Table) -> pa.Table:
        import pandas as pd
        df = group.select(["src", "dst"]).to_pandas() \
            .drop_duplicates(ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = pages.map_batches(emit_edges, batch_format="pyarrow") \
        .groupby("pkey").map_groups(distinct_pairs,
                                    batch_format="pyarrow") \
        .materialize()
    n_edges = edges.count()
    d = int(damping_ppm)
    base = 1_000_000 - d
    empty = pa.table({"host": pa.array([], type=pa.string()),
                      "rank_ppm": pa.array([], type=pa.int64())})
    if n_edges == 0:
        return ray.data.from_arrow(empty)

    if method == "driver" or (method == "auto"
                              and n_edges <= driver_max_edges):
        if n_edges > driver_max_edges:
            raise ValueError(
                "edge table (%d rows) exceeds driver_max_edges=%d; "
                "use method='distributed'" % (n_edges, driver_max_edges))
        df = edges.to_pandas()
        hosts, inv = np.unique(
            np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()]),
            return_inverse=True)
        si, di = inv[:n_edges], inv[n_edges:]
        deg = np.bincount(si, minlength=len(hosts)).astype(np.int64)
        r = np.full(len(hosts), 1_000_000, dtype=np.int64)
        for _ in range(iters):
            c = r[si] // deg[si]
            s = np.zeros(len(hosts), dtype=np.int64)
            np.add.at(s, di, c)
            if len(s) and int(s.max()) > (2**63 - 1) // max(d, 1):
                raise OverflowError("rank mass exceeds int64 bound")
            r = base + (d * s) // 1_000_000
        return ray.data.from_arrow(pa.table({
            "host": pa.array(hosts.tolist(), type=pa.string()),
            "rank_ppm": pa.array(r, type=pa.int64())}))

    # distributed path: host universe + outdegree once, then per
    # round: join ranks onto edges (src), sum floor(r/deg) by dst,
    # left-join back onto the universe
    from apollo_ray.util import hash_join

    def halves(batch: pa.Table) -> pa.Table:
        return pa.table({"host": pa.concat_arrays(
            [batch.column("src").combine_chunks().cast(pa.string()),
             batch.column("dst").combine_chunks().cast(pa.string())])})

    nodes = edges.map_batches(halves, batch_format="pyarrow") \
        .groupby("host").count() \
        .map_batches(lambda b: b.select(["host"]),
                     batch_format="pyarrow").materialize()

    def src_partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("src").combine_chunks().value_counts()
        return pa.table({"src": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    deg = edges.map_batches(src_partial, batch_format="pyarrow") \
        .groupby("src").sum("n")
    edeg = hash_join(edges, deg, on=("src",),
                     num_partitions=num_partitions).materialize()

    ranks = nodes.map_batches(
        lambda b: b.append_column(
            "r", pa.array(np.full(b.num_rows, 1_000_000,
                                  dtype=np.int64), type=pa.int64())),
        batch_format="pyarrow")
    for _ in range(iters):
        contrib = hash_join(edeg, ranks, on=("src",), right_on=("host",),
                            num_partitions=num_partitions)

        def to_c(batch: pa.Table) -> pa.Table:
            r = batch.column("r").to_numpy(zero_copy_only=False)
            n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
            return pa.table({"dst": batch.column("dst"),
                             "c": pa.array(r // n, type=pa.int64())})

        sums = contrib.map_batches(to_c, batch_format="pyarrow") \
            .groupby("dst").sum("c")
        joined = hash_join(nodes, sums, on=("host",), right_on=("dst",),
                           join_type="left_outer",
                           num_partitions=num_partitions)

        def step(batch: pa.Table) -> pa.Table:
            s = pc.fill_null(batch.column("sum(c)"), 0) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            if len(s) and int(s.max()) > (2**63 - 1) // max(d, 1):
                raise OverflowError("rank mass exceeds int64 bound")
            return pa.table({"host": batch.column("host"),
                             "r": pa.array(base + (d * s) // 1_000_000,
                                           type=pa.int64())})

        ranks = joined.map_batches(step,
                                   batch_format="pyarrow").materialize()
    return ranks.map_batches(
        lambda b: pa.table({"host": b.column("host"),
                            "rank_ppm": b.column("r").cast(pa.int64())}),
        batch_format="pyarrow")


def host_pagerank_sql(table: str = "documents",
                      url_expr: str = "url", text_expr: str = "text",
                      damping_ppm: int = 850_000, iters: int = 3) -> str:
    """DuckDB oracle for :func:`host_pagerank`: same RE2 link/host
    rules, same distinct-edge + self-loop-drop graph, and ``iters``
    unrolled rounds of the identical integer recurrence (the
    ``d * s`` product runs through HUGEINT, then back to BIGINT —
    value-equal to the engine's asserted-in-range int64).

    Parity domain caveat: ``regexp_extract_all('href="([^"]*)"')``
    and the engine's split scan diverge when an href VALUE contains
    the literal ``href="`` (unclosed attribute) — see the KNOWN
    DIVERGENCE note on :func:`host_pagerank`."""
    d = int(damping_ppm)
    base = 1_000_000 - d
    hu = _HOST_SQL.format(u="l.url")
    hsrc = _HOST_SQL.format(u=url_expr)
    absm = _ABS_MATCH_SQL.format(u="l.url")
    ctes = [f"""ls AS (
      SELECT doc_id, {hsrc} AS shost,
             regexp_extract_all({text_expr}, 'href="([^"]*)"', 1) AS urls
      FROM {table}
      WHERE {_ABS_MATCH_SQL.format(u=url_expr)}),
    l AS (SELECT doc_id, shost, unnest(urls) AS url FROM ls),
    e AS MATERIALIZED (
      SELECT DISTINCT shost AS src, {hu} AS dst
      FROM l l WHERE {absm} AND {hu} <> shost),
    n AS MATERIALIZED (
      SELECT src AS host FROM e UNION SELECT dst FROM e),
    o AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),
    r0 AS (SELECT host, 1000000::BIGINT AS r FROM n)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""
    r{i} AS (
      SELECT n.host,
             CAST({base} + ({d}::HUGEINT *
                   coalesce(s.c, 0::HUGEINT)) // 1000000 AS BIGINT) AS r
      FROM n LEFT JOIN (
        SELECT e.dst AS host, sum(r.r // o.deg) AS c
        FROM e JOIN r{i-1} r ON r.host = e.src
               JOIN o ON o.src = e.src
        GROUP BY e.dst) s ON s.host = n.host)""")
    return ("WITH " + ",".join(ctes)
            + f" SELECT host, r AS rank_ppm FROM r{iters}")


def mirror_hosts(pages: "ray.data.Dataset", url_col: str = "url",
                 text_col: str = "text", min_shared: int = 2,
                 max_hosts_per_text: int = 64,
                 num_partitions: int = 32) -> "ray.data.Dataset":
    """(host_a, host_b, n_shared) — pairs of hosts that serve
    ``>= min_shared`` IDENTICAL documents (mirror / aggregator / CDN
    alias detection, the host-level routing signal next to
    ``canonical_urls``' url-level one).

    A document's identity is ``md5_number_lower(text)`` (the repo's
    SQL-exact content-hash bridge), so the whole operator is
    value-reproducible in DuckDB.  Texts served by more than
    ``max_hosts_per_text`` distinct hosts are dropped on BOTH sides
    (HAVING cap in SQL): a snippet shared by hundreds of hosts is
    boilerplate, not mirroring, and would otherwise emit a quadratic
    pair blowup (the same skew rule as ``max_posting`` in
    ``ngram_jaccard_pairs``).

    Scale shape: per-batch DISTINCT (content-hash, host) 16+len rows;
    one hash-keyed exchange co-locates all copies of a text, each
    partition emits capped host pairs; one pair-keyed count exchange.
    Payload text never moves.
    """
    from apollo_ray.hashing import mix_to_partition
    from apollo_ray.kernels.text import _md5_u64

    def emit(batch: pa.Table) -> pa.Table:
        host = _host_of(batch.column(url_col)).to_pylist()
        txt = batch.column(text_col).to_pylist()
        pairs = {(int(_md5_u64(t)), h)
                 for t, h in zip(txt, host) if h is not None}
        if not pairs:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "host": pa.array([], type=pa.string()),
                             "pkey": pa.array([], type=pa.int32())})
        ks = np.fromiter((p[0] for p in pairs), dtype=np.uint64,
                         count=len(pairs)).view(np.int64)
        hs = [p[1] for p in pairs]
        return pa.table({"k": pa.array(ks, type=pa.int64()),
                         "host": pa.array(hs, type=pa.string()),
                         "pkey": pa.array(
                             mix_to_partition(ks, num_partitions),
                             type=pa.int32())})

    _PAIRS_EMPTY = pa.table({"host_a": pa.array([], type=pa.string()),
                             "host_b": pa.array([], type=pa.string()),
                             "qkey": pa.array([], type=pa.int32())})

    def emit_pairs(group: pa.Table) -> pa.Table:
        # ragged upper-triangle cross product per content key, fully
        # vectorized (the segment/repeat/div-mod kernel of
        # ``jaccard_join.emit_cross``): sort (k, host), cut segments
        # on k, emit each surviving segment's n*n index grid and keep
        # i < j — the cap bounds a segment's grid at 64*64 rows.
        import pandas as pd
        df = group.select(["k", "host"]).to_pandas().drop_duplicates() \
            .sort_values(["k", "host"], kind="mergesort",
                         ignore_index=True)
        k = df["k"].to_numpy(dtype=np.int64)
        if len(k) == 0:
            return _PAIRS_EMPTY
        hosts = df["host"].to_numpy()
        new_seg = np.empty(len(k), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new_seg)
        n = np.diff(np.append(starts, len(k)))
        from apollo_ray.kernels.segments import ragged_triangle_pairs
        ai, bi = ragged_triangle_pairs(
            starts, n, (n >= 2) & (n <= max_hosts_per_text))
        if len(ai) == 0:
            return _PAIRS_EMPTY
        out_a = hosts[ai]
        out_b = hosts[bi]
        # qkey only routes; exact (host_a, host_b) grouping happens in
        # count_pairs, so any deterministic vectorized hash works
        comb = pd.Series(out_a, dtype=object) + "\x00" \
            + pd.Series(out_b, dtype=object)
        h = pd.util.hash_array(comb.to_numpy()).view(np.int64)
        return pa.table({"host_a": pa.array(out_a, type=pa.string()),
                         "host_b": pa.array(out_b, type=pa.string()),
                         "qkey": pa.array(
                             mix_to_partition(h, num_partitions),
                             type=pa.int32())})

    def count_pairs(group: pa.Table) -> pa.Table:
        import pandas as pd
        df = group.select(["host_a", "host_b"]).to_pandas()
        g = df.groupby(["host_a", "host_b"], sort=False).size() \
            .reset_index(name="n_shared")
        g = g[g["n_shared"] >= min_shared]
        return pa.table({
            "host_a": pa.array(g["host_a"].tolist(), type=pa.string()),
            "host_b": pa.array(g["host_b"].tolist(), type=pa.string()),
            "n_shared": pa.array(g["n_shared"].to_numpy(dtype=np.int64),
                                 type=pa.int64())})

    return pages.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(emit_pairs, batch_format="pyarrow") \
        .groupby("qkey").map_groups(count_pairs, batch_format="pyarrow")


def mirror_hosts_sql(table: str = "documents", url_expr: str = "url",
                     text_expr: str = "text", min_shared: int = 2,
                     max_hosts_per_text: int = 64) -> str:
    """DuckDB oracle for :func:`mirror_hosts` (same md5 content key,
    same host rule, same [2, cap] distinct-host band)."""
    h = _HOST_SQL.format(u=url_expr)
    absm = _ABS_MATCH_SQL.format(u=url_expr)
    return f"""
WITH dh AS MATERIALIZED (
  SELECT DISTINCT md5_number_lower({text_expr}) AS k, {h} AS host
  FROM {table} WHERE {absm}),
ok AS MATERIALIZED (
  SELECT k FROM dh GROUP BY k
  HAVING count(*) >= 2 AND count(*) <= {max_hosts_per_text})
SELECT a.host AS host_a, b.host AS host_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM dh a JOIN dh b ON a.k = b.k AND a.host < b.host
JOIN ok ON ok.k = a.k
GROUP BY a.host, b.host
HAVING count(*) >= {min_shared}"""
