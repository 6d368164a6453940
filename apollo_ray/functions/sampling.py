"""Deterministic corpus-mixing samplers (training-data extras).

Multi-source LLM corpora are mixed by re-weighting groups — languages,
domains, crawl snapshots — before training (GPT-3 / Gopher / LLaMA all
document per-source sampling weights; temperature-flattening over
groups is the multilingual-corpus standard from the mBERT/XLM-R
line).  Both operators here are map-only streaming filters built on
the same md5 row-hash rule as ``decontam.hash_sample``: a row is kept
iff ``md5_number_lower(CAST(key AS VARCHAR)) % 1000 < rate_permille``
of its group, so the sample is machine-independent, re-runnable, and
bit-for-bit reproducible in the DuckDB oracle.  No reference
counterpart (apollo has no sampling operators); scale shape: one tiny
group-count aggregate (group cardinality is small by construction),
rates broadcast in the closure, then a single streaming pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from apollo_ray.kernels.text import _md5_u64


def _keep_mask(keys: list, rates: np.ndarray) -> np.ndarray:
    h = np.fromiter((_md5_u64(str(v)) for v in keys),
                    dtype=np.uint64, count=len(keys))
    return (h % np.uint64(1000)) < rates.astype(np.uint64)


def stratified_sample(docs: "ray.data.Dataset",
                      rates_permille: dict[str, int],
                      group_col: str = "lang", key: str = "doc_id",
                      default_permille: int = 0) -> "ray.data.Dataset":
    """Per-group quota sample: keep a row iff its md5 row hash mod 1000
    is below its group's rate (groups absent from the dict use
    ``default_permille``).  Map-only; streams; exactly SQL-expressible
    as a CASE over ``md5_number_lower``."""
    for g, r in rates_permille.items():
        if not 0 <= int(r) <= 1000:
            raise ValueError("rate for %r out of [0, 1000]: %r" % (g, r))
    if not 0 <= int(default_permille) <= 1000:
        raise ValueError("default_permille out of [0, 1000]")

    def f(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        rates = np.fromiter(
            (rates_permille.get(g, default_permille) for g in groups),
            dtype=np.int64, count=len(groups))
        keys = batch.column(key).cast(pa.int64()).to_pylist()
        return batch.filter(pa.array(_keep_mask(keys, rates)))

    return docs.map_batches(f, batch_format="pyarrow")


def temperature_rates(counts: dict[str, int], alpha: float,
                      base_permille: int = 1000) -> dict[str, int]:
    """Per-group keep rates for temperature-flattened resampling:
    kept count of group g targets ``n_g ** alpha`` (normalized so the
    LARGEST group keeps ``base_permille``/1000 of itself) — alpha=1
    keeps natural proportions, alpha=0 equalizes every group's kept
    count to the capped quota.

    alpha=0 uses pure integer arithmetic (``base * n_max // n_g``) so
    the DuckDB oracle reproduces the rates exactly; fractional alpha
    goes through float ``pow`` (fine operationally, but floor at an
    exact integer boundary is not cross-engine-stable, so the contract
    query pins alpha=0)."""
    if not counts:
        return {}
    n_max = max(counts.values())
    out: dict[str, int] = {}
    for g, n in counts.items():
        if n <= 0:
            out[g] = 0
        elif alpha == 0.0:
            out[g] = min(1000, (base_permille * n_max) // n)
        else:
            out[g] = min(1000, int(base_permille
                                   * (n_max / n) ** (1.0 - alpha)))
    return out


def group_counts(docs: "ray.data.Dataset", group_col: str) -> dict[str, int]:
    """Tiny group-count aggregate collected to the driver (group
    cardinality — languages/sources — is small by construction)."""
    from ray.data.aggregate import Count
    rows = docs.groupby(group_col).aggregate(
        Count(alias_name="n")).take_all()
    return {r[group_col]: int(r["n"]) for r in rows}


def temperature_sample(docs: "ray.data.Dataset", alpha: float = 0.0,
                       base_permille: int = 1000,
                       group_col: str = "lang", key: str = "doc_id"
                       ) -> "ray.data.Dataset":
    """Temperature-flattened group resampling: one count aggregate,
    rates from :func:`temperature_rates`, then the stratified md5
    filter.  The classic multilingual rebalancing (small groups kept
    whole, the dominant group down-sampled toward equal quota as
    alpha -> 0)."""
    counts = group_counts(docs, group_col)
    rates = temperature_rates(counts, alpha, base_permille)
    return stratified_sample(docs, rates, group_col=group_col, key=key)


def stratified_sample_sql(rates_permille: dict[str, int],
                          group_col: str = "lang",
                          default_permille: int = 0,
                          table: str = "documents",
                          key: str = "doc_id",
                          columns: str = "*") -> str:
    """DuckDB twin of :func:`stratified_sample` (explicit rates)."""
    cases = " ".join("WHEN '%s' THEN %d" % (g, int(r))
                     for g, r in sorted(rates_permille.items()))
    return ("SELECT %s FROM %s WHERE "
            "md5_number_lower(CAST(%s AS VARCHAR)) %% 1000 < "
            "(CASE %s %s ELSE %d END)"
            % (columns, table, key, group_col, cases,
               int(default_permille)))


def temperature_sample_sql(base_permille: int = 1000,
                           group_col: str = "lang",
                           table: str = "documents",
                           key: str = "doc_id",
                           columns: str = "t.*") -> str:
    """DuckDB twin of :func:`temperature_sample` at alpha=0 — the
    rates are computed IN SQL from the same integer quota rule, so the
    oracle is self-contained (no injected counts)."""
    return ("""
        WITH gc AS (SELECT %(g)s AS g, count(*) AS n FROM %(t)s GROUP BY 1),
        r AS (SELECT g, LEAST(1000, %(b)d * (SELECT max(n) FROM gc) // n)
                     AS rate FROM gc)
        SELECT %(cols)s FROM %(t)s t JOIN r ON t.%(g)s = r.g
        WHERE md5_number_lower(CAST(t.%(k)s AS VARCHAR)) %% 1000 < r.rate
    """ % {"g": group_col, "t": table, "b": int(base_permille),
           "k": key, "cols": columns})


def leakage_safe_splits(docs: "ray.data.Dataset",
                        cuts_permille: tuple[int, int] = (800, 900),
                        num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, rep_id, split) — duplicate-cluster-aware
    train/val/test assignment: every exact duplicate of a text shares
    ``rep_id = min(doc_id)`` over its content group, and the split is
    decided by ``md5(rep_id) % 1000`` against the cumulative
    ``cuts_permille`` thresholds.  Because the hash is of the GROUP
    representative, duplicated content can never straddle splits —
    the eval-set leakage that row-level random splitting causes on
    undeduplicated corpora (the held-out-contamination failure mode
    measured by Lee et al. 2021).

    Scale shape: one pkey shuffle of (text_hash, doc_id) pairs — the
    exact-dedup metadata pattern, text never moves — then the split
    tag is computed inside the same reduce.  For NEAR-dup-safe splits
    feed ``run_dedup``'s cluster assignment in as (doc_id, cc_id) and
    hash cc_id instead; this operator covers the exact tier where the
    whole decision is SQL-oracle-able."""
    lo, hi = int(cuts_permille[0]), int(cuts_permille[1])
    if not 0 <= lo <= hi <= 1000:
        raise ValueError("cuts_permille must satisfy 0 <= lo <= hi <= 1000")
    from apollo_ray.functions.dedup_extras import add_text_hash
    from apollo_ray.hashing import mix_to_partition

    hashed = add_text_hash(docs.select_columns(["doc_id", "text"]))

    def add_pkey(batch: pa.Table) -> pa.Table:
        th = np.asarray(batch.column("text_hash"), dtype=np.int64)
        return batch.select(["doc_id", "text_hash"]).append_column(
            "pkey", pa.array(mix_to_partition(th, num_partitions),
                             type=pa.int32()))

    def reduce_part(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "rep_id": pa.array([], type=pa.int64()),
                          "split": pa.array([], type=pa.string())})
        if group.num_rows == 0:
            return empty
        th = np.asarray(group.column("text_hash"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        order = np.lexsort((d, th))
        th_s, d_s = th[order], d[order]
        first = np.empty(len(th_s), dtype=bool)
        first[0] = True
        first[1:] = th_s[1:] != th_s[:-1]
        seg = np.cumsum(first) - 1
        rep = d_s[np.flatnonzero(first)][seg]
        u_rep, inv = np.unique(rep, return_inverse=True)
        bucket = np.fromiter((_md5_u64(str(int(r))) % 1000 for r in u_rep),
                             dtype=np.int64, count=len(u_rep))[inv]
        split = np.where(bucket < lo, "train",
                         np.where(bucket < hi, "val", "test"))
        return pa.table({
            "doc_id": pa.array(d_s, type=pa.int64()),
            "rep_id": pa.array(rep, type=pa.int64()),
            "split": pa.array(split.tolist(), type=pa.string()),
        })

    return hashed.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(reduce_part, batch_format="pyarrow")


def leakage_safe_splits_sql(cuts_permille: tuple[int, int] = (800, 900)
                            ) -> str:
    """DuckDB oracle for :func:`leakage_safe_splits` (group by text,
    min doc_id representative, same md5 threshold rule)."""
    lo, hi = int(cuts_permille[0]), int(cuts_permille[1])
    return f"""
    WITH g AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep_id
      FROM documents)
    SELECT doc_id, rep_id,
           CASE WHEN md5_number_lower(CAST(rep_id AS VARCHAR))
                     % 1000 < {lo} THEN 'train'
                WHEN md5_number_lower(CAST(rep_id AS VARCHAR))
                     % 1000 < {hi} THEN 'val'
                ELSE 'test' END AS split
    FROM g
"""


def soft_dedup_weights(docs: "ray.data.Dataset", num_partitions: int = 64
                       ) -> "ray.data.Dataset":
    """Duplication-aware per-doc sampling weight (soft dedup): instead
    of DELETING duplicates, downweight every copy so each distinct
    text contributes unit total mass to the training mixture —
    ``weight_ppm = round_half_up(1e6 / n_copies)`` where ``n_copies``
    counts the docs sharing this doc's exact text.  The
    frequency-downweighting alternative to hard dedup discussed in the
    data-curation line (e.g. SlimPajama/DataComp-LM ablations); unlike
    ``exact_dedup_groups`` it returns one row PER DOC, ready to join
    onto a sampler.

    Scale shape: one 16-byte/row metadata shuffle on the 63-bit
    content hash (text never moves), per-partition group sizes via one
    ``np.unique`` — exact because all rows of a hash land in one
    partition.  Integer-ppm arithmetic keeps the result bit-equal to
    the SQL oracle.
    """
    from apollo_ray.functions.dedup_extras import add_text_hash
    from apollo_ray.hashing import mix_to_partition

    hashed = add_text_hash(docs)

    def add_pkey(batch: pa.Table) -> pa.Table:
        th = np.asarray(batch.column("text_hash"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(th, num_partitions),
                             type=pa.int32()))

    def weigh(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_copies": pa.array([], type=pa.int64()),
                             "weight_ppm": pa.array([], type=pa.int64())})
        th = np.asarray(group.column("text_hash"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        order = np.argsort(th, kind="stable")
        th_s = th[order]
        first = np.empty(len(th_s), dtype=bool)
        first[0] = True
        first[1:] = th_s[1:] != th_s[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(th_s)))
        n = np.repeat(counts, counts)          # group size per member
        w = (2_000_000 + n) // (2 * n)         # round-half-up 1e6 / n
        return pa.table({
            "doc_id": pa.array(d[order], type=pa.int64()),
            "n_copies": pa.array(n, type=pa.int64()),
            "weight_ppm": pa.array(w, type=pa.int64()),
        })

    return hashed.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(weigh, batch_format="pyarrow")


def soft_dedup_weights_sql(table: str = "documents") -> str:
    """DuckDB oracle for :func:`soft_dedup_weights` (group by text —
    the engine groups by the 63-bit content hash; same integer
    round-half-up ppm arithmetic)."""
    return f"""
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_copies,
           CAST((2000000 + n) // (2 * n) AS BIGINT) AS weight_ppm
    FROM (SELECT doc_id, count(*) OVER (PARTITION BY text) AS n
          FROM {table})
"""


def cluster_soft_weights(clusters: "ray.data.Dataset",
                         num_partitions: int = 64) -> "ray.data.Dataset":
    """Soft NEAR-dedup: per-doc sampling weight from the MinHash-LSH
    cluster labels (the ``(doc_id, cc_id)`` output of the flagship
    pipeline) — ``weight_ppm = round_half_up(1e6 / cc_size)``, so each
    near-dup cluster contributes unit total mass to the training
    mixture instead of being cut to one representative.  The LSH-tier
    counterpart of :func:`soft_dedup_weights` (which downweights exact
    copies only); together with ``tiered_dedup`` this gives the soft
    alternative at every tier.

    Scale shape: pure metadata — one 16-byte/row shuffle on
    ``hash(cc_id)`` (every member of a cluster lands in one
    partition, so sizes are exact), one segment-count pass per
    partition, integer-ppm weights.  Returns
    ``(doc_id, cc_id, n_members, weight_ppm)``, one row per input row.
    """
    from apollo_ray.hashing import mix_to_partition

    def add_pkey(batch: pa.Table) -> pa.Table:
        cc = np.asarray(batch.column("cc_id"), dtype=np.int64)
        return batch.append_column(
            "pkey", pa.array(mix_to_partition(cc, num_partitions),
                             type=pa.int32()))

    def weigh(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "cc_id": pa.array([], type=pa.int64()),
                          "n_members": pa.array([], type=pa.int64()),
                          "weight_ppm": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        cc = np.asarray(group.column("cc_id"), dtype=np.int64)
        d = np.asarray(group.column("doc_id"), dtype=np.int64)
        order = np.argsort(cc, kind="stable")
        cc_s = cc[order]
        first = np.empty(len(cc_s), dtype=bool)
        first[0] = True
        first[1:] = cc_s[1:] != cc_s[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(cc_s)))
        n = np.repeat(counts, counts)
        w = (2_000_000 + n) // (2 * n)        # round-half-up 1e6 / n
        return pa.table({
            "doc_id": pa.array(d[order], type=pa.int64()),
            "cc_id": pa.array(cc_s, type=pa.int64()),
            "n_members": pa.array(n, type=pa.int64()),
            "weight_ppm": pa.array(w, type=pa.int64()),
        })

    return clusters.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(weigh, batch_format="pyarrow")


def token_budget_sample(docs: "ray.data.Dataset", budget_tokens: int,
                        group_col: str = "source",
                        num_partitions: int = 64) -> "ray.data.Dataset":
    """(doc_id, group, n_tokens, cum_tokens, keep) — token-budget
    corpus mixing: per group, take documents in md5-rank order until
    the group's cumulative whitespace-token count reaches
    ``budget_tokens`` (``keep`` iff the doc's own cumulative total
    still fits).  The md5 order makes the selection a uniform random
    sample that is machine-independent and extends monotonically when
    the budget grows — the deterministic analog of "sample X tokens
    per source".

    Scale shape: one metadata shuffle of (doc_id, group, n_tokens,
    rank) rows — 3 ints + the group key per doc, never the payload.
    ``pkey = hash(group)`` co-locates each group so the ordered
    prefix-sum completes in ONE vectorized pass per partition (sort +
    segmented cumsum); groups are sources/languages (thousands at
    most), far fewer than partitions at web scale, and no group's
    metadata exceeds worker memory (16 B/row ~ 16 GB per 10^9-doc
    source; shard the group key by rank-range if one ever does).
    """
    import pyarrow.compute as pc

    from apollo_ray.functions.textstats import _split_tokens
    from apollo_ray.hashing import hash_utf8, mix_to_partition

    mask = (1 << 63) - 1

    def meta(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = pc.list_value_length(_split_tokens(text)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        rank = np.fromiter(
            ((_md5_u64(str(int(i))) & mask) for i in ids),
            dtype=np.int64, count=len(ids))
        groups = batch.column(group_col)
        gh = np.fromiter(
            (hash_utf8(g or "") for g in groups.to_pylist()),
            dtype=np.int64, count=len(ids))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "grp": groups,
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "rank": pa.array(rank, type=pa.int64()),
            "pkey": pa.array(mix_to_partition(gh, num_partitions),
                             type=pa.int32()),
        })

    def prefix(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "grp": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
                "cum_tokens": pa.array([], type=pa.int64()),
                "keep": pa.array([], type=pa.bool_())})
        t = group.sort_by([("grp", "ascending"), ("rank", "ascending"),
                           ("doc_id", "ascending")])
        g = t.column("grp").combine_chunks()
        n = np.asarray(t.column("n_tokens"), dtype=np.int64)
        cum = np.cumsum(n)
        # segmented: subtract each group's running total at its start
        first = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            import pyarrow.compute as _pc
            first[1:] = np.asarray(_pc.invert(
                _pc.equal(g.slice(1), g.slice(0, len(g) - 1))))
        starts = np.flatnonzero(first)
        base = np.zeros(len(g), dtype=np.int64)
        base[starts] = cum[starts] - n[starts]
        np.maximum.accumulate(base, out=base)
        cum -= base
        return pa.table({
            "doc_id": t.column("doc_id"),
            "grp": g,
            "n_tokens": pa.array(n, type=pa.int64()),
            "cum_tokens": pa.array(cum, type=pa.int64()),
            "keep": pa.array(cum <= budget_tokens, type=pa.bool_()),
        })

    return docs.map_batches(meta, batch_format="pyarrow") \
        .groupby("pkey").map_groups(prefix, batch_format="pyarrow") \
        .select_columns(["doc_id", "grp", "n_tokens", "cum_tokens",
                         "keep"])


def token_budget_sample_sql(budget_tokens: int,
                            group_col: str = "source",
                            table: str = "documents") -> str:
    """DuckDB oracle for :func:`token_budget_sample` — the same md5
    rank, window prefix-sum per group."""
    return rf"""
        WITH t AS (
          SELECT doc_id, {group_col} AS grp,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(regexp_split_to_array(trim(text), '\s+'))
                 END AS n_tokens,
                 md5_number_lower(CAST(doc_id AS VARCHAR))
                   & 9223372036854775807::UBIGINT AS rank
          FROM {table})
        SELECT doc_id, grp, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(sum(n_tokens) OVER (
                      PARTITION BY grp
                      ORDER BY rank, doc_id) AS BIGINT) AS cum_tokens,
               CAST(sum(n_tokens) OVER (
                      PARTITION BY grp
                      ORDER BY rank, doc_id) AS BIGINT)
                 <= {budget_tokens} AS keep
        FROM t
    """


def lang_budget_sample(docs: "ray.data.Dataset", budget: int,
                       group_col: str = "lang", key: str = "doc_id",
                       ) -> "ray.data.Dataset":
    """(key, group) — UniMax-style hard per-group document budget
    (Chung et al. 2023: cap each language's contribution instead of
    temperature-mixing): per group, keep exactly the ``budget``
    documents with the smallest md5 row hash — a deterministic,
    order-free, machine-independent uniform draw, bit-reproducible in
    SQL (``row_number() OVER (PARTITION BY g ORDER BY
    md5_number_lower(key), key) <= budget``).  Ties (md5 collisions)
    break by key ascending on both sides.

    Scale shape: per-batch partial top-k per group — at most
    ``budget`` rows per (group, block) of 16-byte (hash, key)
    metadata reach the single group-keyed exchange; the final exact
    selection sorts ≤ budget × blocks rows per group.  Group
    cardinality is small by construction (languages / sources), so
    the exchange is tiny regardless of corpus size; document payloads
    never move.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    from apollo_ray.kernels.text import _md5_u64

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                group_col: pa.array([], type=pa.string()),
                key: pa.array([], type=pa.int64()),
                "h": pa.array([], type=pa.uint64())})
        groups = np.asarray(batch.column(group_col).to_pylist())
        keys = batch.column(key).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        h = np.fromiter((_md5_u64(str(v)) for v in keys.tolist()),
                        dtype=np.uint64, count=len(keys))
        order = np.lexsort((keys, h, groups))
        g_s, k_s, h_s = groups[order], keys[order], h[order]
        starts = np.zeros(len(g_s), dtype=bool)
        if len(g_s):
            starts[0] = True
            starts[1:] = g_s[1:] != g_s[:-1]
        start_idx = np.maximum.accumulate(
            np.where(starts, np.arange(len(g_s)), 0))
        rank = np.arange(len(g_s)) - start_idx
        m = rank < budget
        return pa.table({group_col: pa.array(g_s[m], type=pa.string()),
                         key: pa.array(k_s[m], type=pa.int64()),
                         "h": pa.array(h_s[m], type=pa.uint64())})

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({key: pa.array([], type=pa.int64()),
                             group_col: pa.array([], type=pa.string())})
        h = np.asarray(group.column("h"), dtype=np.uint64)
        k = np.asarray(group.column(key), dtype=np.int64)
        order = np.lexsort((k, h))[:budget]
        return pa.table({key: pa.array(k[order], type=pa.int64()),
                         group_col: pa.array(
                             np.asarray(group.column(group_col)
                                        .to_pylist())[order],
                             type=pa.string())})

    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(final, batch_format="pyarrow")


def lang_budget_sample_sql(budget: int, group_col: str = "lang",
                           key: str = "doc_id",
                           table: str = "documents") -> str:
    """DuckDB oracle for :func:`lang_budget_sample`."""
    return f"""
        SELECT {key}, {group_col} FROM (
          SELECT {key}, {group_col},
                 row_number() OVER (
                   PARTITION BY {group_col}
                   ORDER BY md5_number_lower(CAST({key} AS VARCHAR)),
                            {key}) AS rn
          FROM {table})
        WHERE rn <= {budget}
    """
