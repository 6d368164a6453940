"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-dedup pipeline on sf0.001;
``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 plus the training-data extras; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible entry (the rest get
the driver's rows-only check).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_STOPWORD_SQL_LIST = ("'the','a','an','and','or','of','to','in','is','are',"
                      "'was','were','be','been','it','this','that','for',"
                      "'on','with','as','at','by'")

# normalize_text driver query: the messy splice injected for ' the '
# on both sides (decomposed e-acute, CRLF, tab, BEL) — the SQL string
# builds the identical characters with chr()
_MESSY_SPLICE = " é \r\n\tX\x07 "
_MESSY_SPLICE_SQL = ("' e' || chr(769) || ' ' || chr(13) || chr(10) || "
                     "chr(9) || 'X' || chr(7) || ' '")

# hostlist_filter driver query: exact 3-label hosts from the synthetic
# crawl construction (site{0..6}.example.com) plus a never-matching
# domain; the :8080 urls exercise the port-strip path
_BLOCKLIST_DOMAINS = ["site2.example.com", "site5.example.com",
                      "example.org"]

# encoding_quality driver query: messy splice appended to every 7th
# doc (U+FFFD, mojibake 'Ã©' and 'â€™', a BEL control char, an nbsp
# splash) — the SQL builds the identical string with chr()
_ENC_SPLICE = ("�Ã© â€™"
               "\x07Â ")
_ENC_SPLICE_SQL = ("chr(65533) || chr(195) || chr(169) || ' ' || "
                   "chr(226) || chr(8364) || chr(8482) || chr(7) || "
                   "chr(194) || chr(160)")

def _marker_score_sql(markers: tuple) -> str:
    """Non-overlapping substring counts — same greedy left-to-right
    semantics as Python ``str.count`` / ``str.replace``."""
    return " + ".join(
        "(length(p) - length(replace(p, '%s', ''))) // %d" % (m, len(m))
        for m in markers)


def _lang_id_sql() -> str:
    """lang_id_fingerprint oracle, generated from the kernel's own
    marker table (single source of truth): per-language marker-count
    scores, first-max-in-dict-order tie-break (mirrors detect_lang's
    strict-greater iteration), md5-min-shingle fingerprint."""
    from apollo_ray.kernels.text import _LANG_MARKERS
    langs = list(_LANG_MARKERS)
    score_cols = ",\n                     ".join(
        "%s AS s_%s" % (_marker_score_sql(_LANG_MARKERS[l]), l)
        for l in langs)
    greatest = "greatest(%s)" % ", ".join("s_%s" % l for l in langs)
    whens = []
    for i, l in enumerate(langs):
        rest = langs[i + 1:]
        cond = " AND ".join("s_%s >= s_%s" % (l, r) for r in rest) or "TRUE"
        whens.append("WHEN %s THEN '%s'" % (cond, l))
    case = ("CASE WHEN %s = 0 THEN 'und'\n                        %s\n"
            "                   END" % (greatest,
                                        "\n                        ".join(whens)))
    return r"""
            WITH p AS (
              SELECT doc_id, ' ' || lower(text) || ' ' AS p,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\s+')
                     END AS toks
              FROM documents),
            sc AS (
              SELECT doc_id, toks,
                     %s
              FROM p),
            sh AS (
              SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS s
              FROM sc, LATERAL (SELECT unnest(range(1, len(toks) - 7 + 1)) AS i)
              WHERE len(toks) >= 8
              UNION ALL
              SELECT doc_id, array_to_string(toks, ' ') AS s
              FROM sc WHERE len(toks) BETWEEN 1 AND 7),
            fp AS (
              SELECT doc_id,
                     min(md5_number_lower(s)
                         & 9223372036854775807::UBIGINT) AS fp
              FROM sh GROUP BY doc_id)
            SELECT sc.doc_id,
                   %s AS lang_pred,
                   CAST(coalesce(fp.fp, 0) AS BIGINT) AS fingerprint
            FROM sc LEFT JOIN fp ON fp.doc_id = sc.doc_id
        """ % (score_cols, case)


def _pii_stats_sql() -> str:
    """pii_stats oracle generated from the operator's own pattern
    table (single source of truth; both sides are RE2)."""
    from apollo_ray.functions.pii import PII_PATTERNS
    cols = ",\n                   ".join(
        "CAST(len(regexp_extract_all(text, '%s')) AS BIGINT) AS n_%s"
        % (pat, name) for name, pat, _ in PII_PATTERNS)
    return "SELECT doc_id,\n                   %s\n            FROM documents" % cols


def _redact_pii_sql() -> str:
    """redact_pii oracle: sequential regexp_replace chain, each
    pattern counted on the text as it sees it (mirrors the engine's
    loop)."""
    from apollo_ray.functions.pii import PII_PATTERNS
    sql = ("WITH s0 AS (SELECT doc_id, text AS t0,"
           " CAST(0 AS BIGINT) AS c0 FROM documents)")
    for i, (name, pat, repl) in enumerate(PII_PATTERNS, start=1):
        sql += (
            ",\n            s%d AS (SELECT doc_id,"
            " regexp_replace(t%d, '%s', '%s', 'g') AS t%d,"
            " c%d + CAST(len(regexp_extract_all(t%d, '%s')) AS BIGINT)"
            " AS c%d FROM s%d)"
            % (i, i - 1, pat, repl, i, i - 1, i - 1, pat, i, i - 1))
    n = len(PII_PATTERNS)
    sql += ("\n            SELECT doc_id, t%d AS clean_text,"
            " c%d AS n_redacted FROM s%d" % (n, n, n))
    return sql


def _normalize_text_sql_entry() -> str:
    from apollo_ray.functions.clean import normalize_text_sql
    return normalize_text_sql(
        text_sql="replace(text, ' the ', %s)" % _MESSY_SPLICE_SQL)


def _hostlist_filter_sql_entry() -> str:
    from apollo_ray.functions.urls import hostlist_filter_sql
    return hostlist_filter_sql(_BLOCKLIST_DOMAINS)


def _nb_classify_sql_entry(cap: int | None) -> str:
    from apollo_ray.functions.classify import nb_classify_sql
    return nb_classify_sql("source", cap)


def _char_entropy_sql_entry() -> str:
    from apollo_ray.functions.textstats import char_entropy_sql
    return char_entropy_sql()


def _token_budget_sql_entry() -> str:
    from apollo_ray.functions.sampling import token_budget_sample_sql
    return token_budget_sample_sql(600)


def _encoding_quality_sql_entry() -> str:
    from apollo_ray.functions.textstats import encoding_quality_sql
    return encoding_quality_sql(
        table="(SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || "
              + _ENC_SPLICE_SQL + " ELSE text END AS text "
              "FROM documents)")


def _readability_sql_entry() -> str:
    from apollo_ray.functions.textstats import readability_sql
    return readability_sql()


def _chunk_documents_sql_entry() -> str:
    from apollo_ray.functions.clean import chunk_documents_sql
    return chunk_documents_sql(size=120, overlap=24)


def _word_pmi_sql_entry() -> str:
    from apollo_ray.functions.lm import word_pmi_pairs_sql
    return word_pmi_pairs_sql(min_count=5, topn=40)


def _embedding_quantize_sql_entry() -> str:
    from apollo_ray.functions.ann import embedding_quantize_sql
    return embedding_quantize_sql()


def _source_overlap_sql_entry() -> str:
    from apollo_ray.functions.dedup_extras import source_overlap_sql
    return source_overlap_sql()


def _linked_text_sql() -> str:
    """SQL twin of the _linked_docs splice (same anchors, same
    every-3rd relative link, same every-11th unterminated tail)."""
    from apollo_ray.functions.urls import _SYNTH_URL_SQL
    return (
        "text || ' <a href=\"' || (" + _SYNTH_URL_SQL + ") || '\">x</a>'"
        " || CASE WHEN doc_id % 3 = 0 THEN ' <a href=\"/rel/' ||"
        " CAST(doc_id % 10 AS VARCHAR) || '\">y</a>' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' <a href=\"http://tail'"
        " ELSE '' END")


_HTML_SPLICE = (" <div class=x><p>Hello</p><script src=s.js></script>"
                "<a href=u>y</a></div>")

_CODE_SPLICE = ("\ndef f(x):\n    return x + 1;\nvar y = {a: 1};\n"
                "#include <stdio.h>\n")
_CODE_SPLICE_SQL = ("chr(10) || 'def f(x):' || chr(10) || "
                    "'    return x + 1;' || chr(10) || "
                    "'var y = {a: 1};' || chr(10) || "
                    "'#include <stdio.h>' || chr(10)")


def _embedding_stats_sql_entry() -> str:
    from apollo_ray.functions.ann import embedding_stats_sql
    return embedding_stats_sql()


def _kmeans_assign_sql_entry() -> str:
    from apollo_ray.functions.ann import kmeans_assign_sql
    return kmeans_assign_sql(8)


def _pq_codes_sql_entry() -> str:
    from apollo_ray.functions.ann import pq_encode_sql
    return pq_encode_sql(m=4, k=8, iters=2, dim=64)


def _feature_hash_embed_sql_entry() -> str:
    from apollo_ray.functions.ann import feature_hash_embed_sql
    return feature_hash_embed_sql(16)


def _snapshot_diff_sql_entry() -> str:
    from apollo_ray.functions.snapshots import snapshot_diff_sql
    return snapshot_diff_sql(old_where="doc_id % 2 = 0",
                             new_where="doc_id % 2 = 1",
                             key_expr="doc_id % 249")


def _term_blocklist_sql_entry() -> str:
    from apollo_ray.functions.classify import term_blocklist_filter_sql
    return term_blocklist_filter_sql(["slow", "spark", "leak"])


def _quantile_filter_sql_entry() -> str:
    from apollo_ray.functions.textstats import quantile_filter_sql
    return quantile_filter_sql("p25")


def _html_tag_stats_sql_entry() -> str:
    from apollo_ray.functions.textstats import html_tag_stats_sql
    return html_tag_stats_sql(text_expr=(
        "text || CASE WHEN doc_id %% 4 = 0 THEN '%s' ELSE '' END"
        % _HTML_SPLICE))


def _lang_budget_sample_sql_entry() -> str:
    from apollo_ray.functions.sampling import lang_budget_sample_sql
    return lang_budget_sample_sql(40)


def _code_detect_sql_entry() -> str:
    from apollo_ray.functions.classify import code_detect_sql
    return code_detect_sql(text_expr=(
        "text || CASE WHEN doc_id %% 5 = 0 THEN %s ELSE '' END"
        % _CODE_SPLICE_SQL))


def _extract_links_sql_entry() -> str:
    from apollo_ray.functions.urls import extract_links_sql
    return extract_links_sql(text_expr="(" + _linked_text_sql() + ")")


def _link_host_counts_sql_entry() -> str:
    from apollo_ray.functions.urls import link_host_counts_sql
    return link_host_counts_sql(text_expr="(" + _linked_text_sql() + ")")


def _anchor_texts_sql_entry() -> str:
    from apollo_ray.functions.urls import anchor_texts_sql
    return anchor_texts_sql(text_expr="(" + _linked_text_sql() + ")")


def _bpe_train_sql_entry() -> str:
    from apollo_ray.functions.bpe import bpe_train_sql
    return bpe_train_sql(num_merges=6)


def _bpe_encode_sql_entry() -> str:
    from apollo_ray.functions.bpe import bpe_encode_sql
    return bpe_encode_sql(num_merges=6)


def _minhash_signatures_sql_entry() -> str:
    from apollo_ray.functions.dedup_extras import minhash_signatures_sql
    return minhash_signatures_sql()


def _minhash_lsh_clusters_sql_entry() -> str:
    from apollo_ray.functions.dedup_extras import minhash_lsh_clusters_sql
    return minhash_lsh_clusters_sql()


def _host_pagerank_sql_entry() -> str:
    """SQL twin of q_host_pagerank's derived corpus (same 97-host
    link arithmetic) spliced as a leading CTE into the generated
    unrolled-iteration oracle."""
    from apollo_ray.functions.urls import host_pagerank_sql
    derived = (
        "documents_pr AS (SELECT doc_id, "
        "'http://h' || CAST(doc_id % 97 AS VARCHAR) || '.test/' || "
        "CAST(doc_id AS VARCHAR) AS url, "
        "text || ' <a href=\"http://h' || "
        "CAST((doc_id * 31 + 7) % 97 AS VARCHAR) || '.test/x\">a</a>' || "
        "CASE WHEN doc_id % 3 = 0 THEN ' <a href=\"HTTP://H' || "
        "CAST((doc_id * 17 + 3) % 97 AS VARCHAR) || "
        "'.Test:80/y\">b</a>' ELSE '' END || "
        "CASE WHEN doc_id % 5 = 0 THEN ' <a href=\"/rel/z\">c</a>' "
        "ELSE '' END AS text FROM documents), ")
    sql = host_pagerank_sql(table="documents_pr")
    assert sql.startswith("WITH ")
    return "WITH " + derived + sql[len("WITH "):]


def _kmv_sql_entry() -> str:
    from apollo_ray.functions.sketch import distinct_count_kmv_sql
    return distinct_count_kmv_sql(k=256)


def _hll_sql_entry() -> str:
    from apollo_ray.functions.sketch import distinct_count_hll_sql
    return distinct_count_hll_sql(log2_m=8)


def _sliding_sql_entry() -> str:
    from apollo_ray.functions.asof import sliding_window_stats_sql
    return sliding_window_stats_sql()


def _leakage_sql_entry() -> str:
    from apollo_ray.functions.sampling import leakage_safe_splits_sql
    return leakage_safe_splits_sql()


def _cms_sql_entry() -> str:
    from apollo_ray.functions.sketch import cms_token_counts_sql
    return cms_token_counts_sql(depth=4, log2_w=12, n_probe=20)


def _heavy_hitters_sql_entry() -> str:
    from apollo_ray.functions.sketch import heavy_hitters_sql
    return heavy_hitters_sql(phi_ppm=5000)


def _canonical_urls_sql_entry() -> str:
    from apollo_ray.functions.urls import canonical_urls_sql
    return canonical_urls_sql()


def _url_host_stats_sql_entry() -> str:
    from apollo_ray.functions.urls import url_host_stats_sql
    return url_host_stats_sql()


def _mirror_hosts_sql_entry() -> str:
    """SQL twin of q_mirror_hosts' derived corpus: synthetic crawl
    url + every-5th-doc shared-page text, then the generated
    mirror-pair oracle."""
    from apollo_ray.functions.urls import _SYNTH_URL_SQL, mirror_hosts_sql
    return mirror_hosts_sql(
        url_expr="(" + _SYNTH_URL_SQL + ")",
        text_expr=("CASE WHEN doc_id % 5 = 0 THEN 'shared page ' || "
                   "CAST(doc_id % 20 AS VARCHAR) ELSE text END"))


def _per_host_topk_sql_entry() -> str:
    from apollo_ray.functions.urls import per_host_topk_sql
    return per_host_topk_sql(k=10)


def _shingle_novelty_sql_entry() -> str:
    from apollo_ray.functions.dedup_extras import shingle_novelty_sql
    return shingle_novelty_sql(k=3)


def _tiered_sql_entry(semantic: bool = False) -> str:
    from apollo_ray.functions.tiers import tiered_dedup_sql
    return tiered_dedup_sql(semantic=semantic)


def _dsir_sql_entry() -> str:
    from apollo_ray.functions.dsir import dsir_logweights_sql
    return dsir_logweights_sql(n_buckets=16384, target_mod=97)


def _semdedup_sql_entry() -> str:
    from apollo_ray.functions.semdedup import semdedup_sql
    return semdedup_sql(k=8, iters=2, dim=64, threshold=0.3)


_STRAT_RATES = {"en": 250, "de": 600, "es": 800, "fr": 900, "zh": 1000}


def _stratified_sql_entry() -> str:
    from apollo_ray.functions.sampling import stratified_sample_sql
    return stratified_sample_sql(_STRAT_RATES, group_col="lang")


def _temperature_sql_entry() -> str:
    from apollo_ray.functions.sampling import temperature_sample_sql
    return temperature_sample_sql(base_permille=300, group_col="lang")


def _unigram_score_sql_entry(vocab_cap=None) -> str:
    from apollo_ray.functions.lm import unigram_score_sql
    return unigram_score_sql(vocab_cap)


def _line_dedup_sql_entry() -> str:
    from apollo_ray.functions.clean import line_dedup_sql
    return line_dedup_sql(min_len=1)


def _paragraph_dedup_sql_entry() -> str:
    """line_dedup_sql at paragraph granularity over the derived
    multi-paragraph corpus — a ``documents`` CTE shadows the view so
    both the unnest and the final left join see the derived text."""
    from apollo_ray.functions.clean import line_dedup_sql
    sql = line_dedup_sql(min_len=1, sep_sql="chr(10)||chr(10)")
    sql = sql.replace("FROM documents", "FROM docs_p")
    return sql.replace(
        "WITH l AS",
        "WITH docs_p AS (SELECT doc_id, replace(text, ' a ', "
        "chr(10)||chr(10)) AS text FROM documents), l AS", 1)


def _strip_boilerplate_sql_entry() -> str:
    from apollo_ray.functions.clean import strip_boilerplate_sql
    return strip_boilerplate_sql(
        min_df=2, scope_sql="source",
        table="(SELECT doc_id, source, "
              "replace(text, ' a ', chr(10)) AS text FROM documents)")


def _soft_dedup_sql_entry() -> str:
    from apollo_ray.functions.sampling import soft_dedup_weights_sql
    return soft_dedup_weights_sql()


def _tfidf_sql_entry() -> str:
    from apollo_ray.functions.lm import tfidf_top_terms_sql
    return tfidf_top_terms_sql(k=5)


def _bigram_sql_entry() -> str:
    from apollo_ray.functions.lm import bigram_score_sql
    return bigram_score_sql()


def _ppl_buckets_sql_entry() -> str:
    from apollo_ray.functions.ranking import ppl_buckets_sql
    return ppl_buckets_sql(n=3)


def _token_ntile_sql_entry() -> str:
    from apollo_ray.functions.ranking import token_ntile_buckets_sql
    return token_ntile_buckets_sql(n=10)


def _pricing_sql_entry() -> str:
    from apollo_ray.functions.analytics import PRICING_SUMMARY_SQL
    return PRICING_SUMMARY_SQL


def _forecast_sql_entry() -> str:
    from apollo_ray.functions.analytics import FORECAST_REVENUE_SQL
    return FORECAST_REVENUE_SQL


def _customer_order_dist_sql_entry() -> str:
    from apollo_ray.functions.analytics import CUSTOMER_ORDER_DIST_SQL
    return CUSTOMER_ORDER_DIST_SQL


def _order_priority_sql_entry() -> str:
    from apollo_ray.functions.analytics import order_priority_counts_sql
    return order_priority_counts_sql()


def _top_revenue_sql_entry() -> str:
    from apollo_ray.functions.analytics import top_revenue_orders_sql
    return top_revenue_orders_sql()


def _regional_revenue_sql_entry() -> str:
    from apollo_ray.functions.analytics import regional_revenue_sql
    return regional_revenue_sql()


def _promo_revenue_sql_entry() -> str:
    from apollo_ray.functions.analytics import promo_revenue_sql
    return promo_revenue_sql()


def _priority_dedup_sql_entry() -> str:
    from apollo_ray.functions.merge import priority_dedup_sql
    return priority_dedup_sql(priority=("src7", "src3"))


def _normalized_exact_dedup_sql_entry() -> str:
    from apollo_ray.functions.merge import normalized_exact_dedup_sql
    return normalized_exact_dedup_sql()


def _bbit_minhash_pairs_sql_entry() -> str:
    from apollo_ray.functions.dedup_extras import bbit_minhash_pairs_sql
    return bbit_minhash_pairs_sql()


def _oph_signatures_sql_entry() -> str:
    from apollo_ray.functions.dedup_extras import oph_signatures_sql
    return oph_signatures_sql()


def _ivfpq_topk_sql_entry() -> str:
    from apollo_ray.functions.ann import ivfpq_topk_sql
    return ivfpq_topk_sql(query_ids=list(range(8)), k_out=5, n_coarse=8,
                          m=4, k_pq=8, iters=1, nprobe=2, dim=64)


def _docs(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _embeddings(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _lineitem(sf_dir: str, columns: list[str]):
    import ray.data
    return ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                                 columns=columns)


def entry() -> Any:
    """Flagship: documents -> pages view -> full MinHash-LSH dedup
    pipeline -> (doc_id, cc_id) clusters at sf0.001."""
    import pyarrow.parquet as pq
    import ray.data
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import pages_from_documents
    from apollo_ray.pipelines.dedup import run_dedup

    docs_t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = ray.data.from_arrow(pages_from_documents(docs_t))
    cfg = DedupConfig(feature_dim_log2=14)
    out = run_dedup(pages, cfg, num_partitions=16)
    return out["clusters"]


def queries() -> dict[str, Callable[[str], Any]]:
    from apollo_ray.functions import ann, dedup_extras, textstats

    def q_exact_dedup(sf_dir):
        return dedup_extras.exact_dedup_groups(_docs(sf_dir))

    def q_lang_stats(sf_dir):
        return textstats.lang_stats(_docs(sf_dir))

    def q_token_counts(sf_dir):
        return textstats.token_counts(_docs(sf_dir))

    def q_quality(sf_dir):
        return textstats.quality_stats_table(_docs(sf_dir))

    def q_docfreq(sf_dir):
        return textstats.docfreq(_docs(sf_dir))

    def q_docfreq_min5(sf_dir):
        return textstats.docfreq(_docs(sf_dir), min_df=5)

    def q_shingles(sf_dir):
        return dedup_extras.shingle_counts(_docs(sf_dir), k=3)

    def q_shingle_novelty(sf_dir):
        """Per-doc fingerprint novelty: fraction of the doc's distinct
        3-shingles with corpus document-frequency 1, integer ppm."""
        return dedup_extras.shingle_novelty(_docs(sf_dir), k=3,
                                            num_partitions=16)

    def q_ngram_pairs(sf_dir):
        return dedup_extras.ngram_jaccard_pairs(_docs(sf_dir), k=3,
                                                threshold=0.5)

    def q_user_last_event(sf_dir):
        return textstats.user_last_event(_events(sf_dir))

    def q_events_hourly(sf_dir):
        return textstats.events_hourly(_events(sf_dir))

    def q_user_sessions(sf_dir):
        return textstats.user_sessions(_events(sf_dir))

    def q_emb_label_counts(sf_dir):
        from ray.data.aggregate import Count
        return _embeddings(sf_dir).groupby("label").aggregate(
            Count(alias_name="n"))

    def q_ann_close(sf_dir):
        return ann.cosine_close_pairs(_embeddings(sf_dir),
                                      query_ids=[0, 1, 2, 3, 4],
                                      threshold=0.3)

    def q_emb_dup_pairs(sf_dir):
        return ann.embedding_dup_pairs(_embeddings(sf_dir), threshold=0.3)

    def q_simhash_pairs(sf_dir):
        return dedup_extras.simhash_pairs(_docs(sf_dir))

    def q_minhash_signatures(sf_dir):
        return dedup_extras.minhash_signatures(_docs(sf_dir))

    def q_minhash_lsh_clusters(sf_dir):
        """The full unweighted MinHash-LSH dedup chain (signatures ->
        bands -> buckets -> star edges -> connected components),
        value-exact against the unrolled label-propagation SQL — the
        oracle-exact sibling of the flagship WMH pipeline's rows-only
        ``minhash_dedup_clusters``."""
        return dedup_extras.minhash_lsh_clusters(_docs(sf_dir))

    def q_lang_id(sf_dir):
        return textstats.lang_id(_docs(sf_dir))

    def q_ann_topk(sf_dir):
        return ann.cosine_topk(_embeddings(sf_dir),
                               query_ids=list(range(10)), k=5)

    def _clusters(sf_dir):
        import pyarrow.parquet as pq
        import ray.data
        from apollo_ray.config import DedupConfig
        from apollo_ray.fixtures import pages_from_documents
        from apollo_ray.pipelines.dedup import run_dedup
        docs_t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        pages = ray.data.from_arrow(pages_from_documents(docs_t))
        out = run_dedup(pages, DedupConfig(feature_dim_log2=14),
                        num_partitions=16)
        return out["clusters"]

    def q_minhash_cluster_stats(sf_dir):
        """Second flagship invariant bundle (cluster COUNT + SIZE
        histogram level, complementing the per-group CC check of
        minhash_dedup_invariants): the cluster-size histogram's mass
        must equal the corpus row count (every doc labeled exactly
        once), the cluster count can never exceed the distinct-text
        count (exact dups always merge), and the largest cluster is at
        least as large as the largest exact-duplicate group."""
        import pyarrow as pa
        from apollo_ray.functions.dedup_extras import cc_size_hist
        ch = cc_size_hist(_clusters(sf_dir)).to_pandas()
        eh = dedup_extras.dup_size_hist(_docs(sf_dir)).to_pandas()
        n_docs = int((ch["n_members"] * ch["n_clusters"]).sum())
        n_clusters = int(ch["n_clusters"].sum())
        n_distinct = int(eh["n_groups"].sum())
        return pa.table({
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "clusters_le_distinct_texts": pa.array(
                [int(n_clusters <= n_distinct)], type=pa.int64()),
            "max_cc_ge_max_exact": pa.array(
                [int(int(ch["n_members"].max())
                     >= int(eh["n_members"].max()))], type=pa.int64()),
        })

    def q_communities_invariants(sf_dir):
        """Invariant bundle for the communities tier (the flagship
        pipeline with ``with_communities=True``): the community labels
        themselves are not SQL-expressible (Walktrap over the
        doc<->bucket bipartite graph), but the partition CONTRACT the
        reference guarantees (``apollo/graph.py:195-269``) is — each
        flag below is an int64 the oracle pins to 1:

        - ``docs_unique``: every doc appears in exactly one community
          row (communities partition their CC's docs);
        - ``cc_match``: the (doc_id -> cc_id) carried on community
          rows agrees with the clusters table;
        - ``coverage``: the community tier covers exactly the docs of
          size>=2 components (size-1 CCs are skipped,
          ``apollo/graph.py:214-215``);
        - ``pair_rule``: every size-2 CC passes through as ONE
          community labeled min(doc_id)
          (``apollo/graph.py:216-218``);
        - ``community_within_cc``: no community spans two CCs.

        Flags are computed driver-side over the (doc_id, cc_id,
        community_id) label table — 24 B/row metadata at validation
        scale, never the payload."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data
        from apollo_ray.config import DedupConfig
        from apollo_ray.fixtures import pages_from_documents
        from apollo_ray.pipelines.dedup import run_dedup
        docs_t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        pages = ray.data.from_arrow(pages_from_documents(docs_t))
        out = run_dedup(pages, DedupConfig(feature_dim_log2=14),
                        num_partitions=16, with_communities=True)
        comm = out["communities"].to_pandas()
        clus = out["clusters"].to_pandas()
        cc_sizes = clus.groupby("cc_id")["doc_id"].count()
        fat_docs = clus[clus["cc_id"].map(cc_sizes) >= 2]
        docs_unique = int(comm["doc_id"].is_unique)
        merged = comm.merge(clus, on="doc_id", suffixes=("_comm", "_cl"))
        cc_match = int(len(merged) == len(comm)
                       and (merged["cc_id_comm"]
                            == merged["cc_id_cl"]).all())
        coverage = int(set(comm["doc_id"]) == set(fat_docs["doc_id"]))
        pairs = comm[comm["cc_id"].map(cc_sizes) == 2]
        pg = pairs.groupby("cc_id")
        pair_rule = int(
            ((pg["community_id"].nunique() == 1).all()
             and (pg["community_id"].min()
                  == pg["doc_id"].min()).all())
            if len(pairs) else 1)
        within = int((comm.groupby("community_id")["cc_id"]
                      .nunique() == 1).all())
        return pa.table({
            "docs_unique": pa.array([docs_unique], type=pa.int64()),
            "cc_match": pa.array([cc_match], type=pa.int64()),
            "coverage": pa.array([coverage], type=pa.int64()),
            "pair_rule": pa.array([pair_rule], type=pa.int64()),
            "community_within_cc": pa.array([within], type=pa.int64()),
        })

    def q_soft_near_dedup_invariants(sf_dir):
        """Invariant bundle for the soft near-dedup weights (the LSH
        cluster labels are not SQL-expressible; the SQL-checkable
        facts are): exactly one weight row per corpus doc, every
        cluster's total mass n*w within the round-half-up bound of
        1e6 (2*|n*w - 1e6| <= n), and weights in [1, 1e6]."""
        import numpy as np
        import pyarrow as pa
        from apollo_ray.functions.sampling import cluster_soft_weights
        w = cluster_soft_weights(_clusters(sf_dir), num_partitions=16)
        n_docs, mass_ok, bounds_ok = 0, 1, 1
        for b in w.iter_batches(batch_format="numpy"):
            n = b["n_members"].astype(np.int64)
            wt = b["weight_ppm"].astype(np.int64)
            n_docs += len(wt)
            if not (2 * np.abs(n * wt - 1_000_000) <= n).all():
                mass_ok = 0
            if not ((wt >= 1) & (wt <= 1_000_000)).all():
                bounds_ok = 0
        return pa.table({
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "mass_ok": pa.array([mass_ok], type=pa.int64()),
            "bounds_ok": pa.array([bounds_ok], type=pa.int64()),
        })

    def q_minhash_invariants(sf_dir):
        """End-to-end pipeline invariant, SQL-checkable: every member
        of an exact-duplicate text group must land in the SAME
        connected component (identical texts -> identical signatures
        -> identical buckets).  Returns per text group
        (rep_id, n_members, n_distinct_cc); the oracle asserts
        n_distinct_cc = 1 for every group."""
        import numpy as np
        import pyarrow as pa
        from apollo_ray.hashing import hash_utf8, mix_to_partition
        from apollo_ray.util import hash_join
        clusters = _clusters(sf_dir)

        # the pipeline keys docs by hash(url) (extract stage); map the
        # original documents ids through the same url derivation
        def th_map(batch: pa.Table) -> pa.Table:
            orig = batch.column("doc_id").cast(pa.int64()).to_pylist()
            texts = batch.column("text").to_pylist()
            pipe = [hash_utf8("https://docs.example/%d" % d) for d in orig]
            return pa.table({
                "doc_id": pa.array(pipe, type=pa.int64()),
                "orig_id": pa.array(orig, type=pa.int64()),
                "text_hash": pa.array([hash_utf8(t) for t in texts],
                                      type=pa.int64()),
            })

        th = _docs(sf_dir).map_batches(th_map, batch_format="pyarrow")
        joined = hash_join(clusters, th, on=("doc_id",), num_partitions=8)

        def add_pkey(batch: pa.Table) -> pa.Table:
            h = np.asarray(batch.column("text_hash"), dtype=np.int64)
            return batch.append_column(
                "pkey", pa.array(mix_to_partition(h, 16), type=pa.int32()))

        def per_group(group: pa.Table) -> pa.Table:
            h = np.asarray(group.column("text_hash"), dtype=np.int64)
            d = np.asarray(group.column("orig_id"), dtype=np.int64)
            cc = np.asarray(group.column("cc_id"), dtype=np.int64)
            if len(h) == 0:
                return pa.table({"rep_id": pa.array([], type=pa.int64()),
                                 "n_members": pa.array([], type=pa.int64()),
                                 "n_distinct_cc": pa.array([], type=pa.int64())})
            order = np.lexsort((d, h))
            h_s, d_s, c_s = h[order], d[order], cc[order]
            first = np.empty(len(h_s), dtype=bool)
            first[0] = True
            first[1:] = h_s[1:] != h_s[:-1]
            seg = np.cumsum(first) - 1
            n_seg = seg[-1] + 1
            counts = np.bincount(seg, minlength=n_seg)
            # distinct cc per segment: sort (h, cc), count cc changes
            o2 = np.lexsort((c_s, h_s))
            c2, s2 = c_s[o2], seg[o2]
            new_cc = np.empty(len(c2), dtype=np.int64)
            new_cc[0] = 1
            new_cc[1:] = ((s2[1:] != s2[:-1]) |
                          (c2[1:] != c2[:-1])).astype(np.int64)
            ncc = np.bincount(s2, weights=new_cc,
                              minlength=n_seg).astype(np.int64)
            return pa.table({
                "rep_id": pa.array(d_s[first], type=pa.int64()),
                "n_members": pa.array(counts, type=pa.int64()),
                "n_distinct_cc": pa.array(ncc, type=pa.int64()),
            })

        return joined.map_batches(add_pkey, batch_format="pyarrow") \
            .groupby("pkey").map_groups(per_group, batch_format="pyarrow")

    # --- non-SQL-expressible (rows-only driver check) ---

    def q_minhash_clusters(sf_dir):
        return _clusters(sf_dir)

    def q_repetition_stats(sf_dir):
        return textstats.repetition_stats(_docs(sf_dir))

    def q_c4_clean(sf_dir):
        from apollo_ray.functions.clean import c4_clean
        return c4_clean(_docs(sf_dir))

    def q_line_dedup(sf_dir):
        from apollo_ray.functions.clean import line_dedup
        return line_dedup(_docs(sf_dir)) \
            .select_columns(["doc_id", "text", "n_dup_lines"])

    def q_paragraph_dedup(sf_dir):
        """RefinedWeb-style paragraph-granularity exact dedup: the
        same line_dedup machinery with sep="\\n\\n" over a corpus
        derived multi-paragraph on BOTH sides (' a ' -> blank line;
        non-overlapping left-to-right replace on each)."""
        import pyarrow as pa
        import pyarrow.compute as _pc
        from apollo_ray.functions.clean import line_dedup

        def add_para(batch):
            t = batch.column("text")
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            return batch.set_column(
                batch.schema.get_field_index("text"), "text",
                _pc.replace_substring(t, " a ", "\n\n"))

        mdocs = _docs(sf_dir).map_batches(add_para, batch_format="pyarrow")
        return line_dedup(mdocs, sep="\n\n", num_partitions=16) \
            .select_columns(["doc_id", "text", "n_dup_lines"])

    def q_strip_boilerplate(sf_dir):
        """Per-source frequent-line (boilerplate) removal.  The fixture
        docs are single-line, so a multi-line corpus is derived
        deterministically on BOTH sides: ' a ' -> newline (DuckDB
        replace() and pc.replace_substring share the non-overlapping
        left-to-right rule)."""
        import pyarrow as pa
        import pyarrow.compute as _pc
        from apollo_ray.functions.clean import strip_boilerplate

        def add_nl(batch):
            t = batch.column("text")
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            return batch.set_column(
                batch.schema.get_field_index("text"), "text",
                _pc.replace_substring(t, " a ", "\n"))

        mdocs = _docs(sf_dir).map_batches(add_nl, batch_format="pyarrow")
        return strip_boilerplate(mdocs, min_df=2, scope_col="source",
                                 num_partitions=16) \
            .select_columns(["doc_id", "text", "n_boiler_lines"])

    def q_lang_budget_sample(sf_dir):
        """UniMax-style per-language hard budget: 40 docs per lang by
        smallest md5 row hash (deterministic uniform draw)."""
        from apollo_ray.functions.sampling import lang_budget_sample
        return lang_budget_sample(_docs(sf_dir), budget=40)

    def q_soft_dedup_weights(sf_dir):
        from apollo_ray.functions.sampling import soft_dedup_weights
        return soft_dedup_weights(_docs(sf_dir), num_partitions=16)

    def q_bpe_token_counts(sf_dir):
        return textstats.token_counts(_docs(sf_dir), mode="bpe_ish")

    def q_asof_purchase(sf_dir):
        from apollo_ray.functions.asof import asof_latest_event
        return asof_latest_event(_events(sf_dir), right_type="purchase",
                                 num_partitions=16)

    def q_purchase_window(sf_dir):
        from apollo_ray.functions.asof import range_window_stats
        return range_window_stats(_events(sf_dir), anchor_type="purchase",
                                  window_us=600_000_000,
                                  num_partitions=16)

    def q_substring_spans(sf_dir):
        from apollo_ray.functions.substring import substring_dup_spans
        return substring_dup_spans(_docs(sf_dir), min_len=40,
                                   num_partitions=16)

    def q_decontam(sf_dir):
        import pyarrow as pa
        from apollo_ray.functions.decontam import decontaminate

        def bench_rows(batch: pa.Table) -> pa.Table:
            import numpy as np
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return batch.filter(pa.array(ids % 97 == 0))

        bench = _docs(sf_dir).map_batches(bench_rows, batch_format="pyarrow")
        return decontaminate(_docs(sf_dir), bench, k=3)

    def q_hash_sample(sf_dir):
        from apollo_ray.functions.decontam import hash_sample
        return hash_sample(_docs(sf_dir), rate_permille=200)

    def q_bloom_dedup(sf_dir):
        from apollo_ray.functions.bloom import bloom_dedup
        return bloom_dedup(_docs(sf_dir), k=4, log2_m=20)

    def q_dsir(sf_dir):
        from apollo_ray.functions.dsir import dsir_logweights
        return dsir_logweights(_docs(sf_dir), n_buckets=16384,
                               target_mod=97)

    def q_kmv_distinct(sf_dir):
        from apollo_ray.functions.sketch import distinct_count_kmv
        return distinct_count_kmv(_docs(sf_dir), key="text", k=256)

    def q_hll_distinct(sf_dir):
        from apollo_ray.functions.sketch import distinct_count_hll
        return distinct_count_hll(_docs(sf_dir), key="text", log2_m=8)

    def q_cms_counts(sf_dir):
        from apollo_ray.functions.sketch import cms_token_counts
        return cms_token_counts(_docs(sf_dir), depth=4, log2_w=12,
                                n_probe=20)

    def q_heavy_hitters(sf_dir):
        from apollo_ray.functions.sketch import heavy_hitters
        return heavy_hitters(_docs(sf_dir), phi_ppm=5000)

    def _synthetic_pages(sf_dir):
        import numpy as np
        import pyarrow as pa

        from apollo_ray.functions.urls import synthetic_crawl_urls

        def add_url(batch):
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "url": pa.array(synthetic_crawl_urls(ids),
                                type=pa.string())})
        return _docs(sf_dir).map_batches(add_url, batch_format="pyarrow")

    def q_canonical_urls(sf_dir):
        from apollo_ray.functions.urls import canonical_urls
        return canonical_urls(_synthetic_pages(sf_dir))

    def q_mirror_hosts(sf_dir):
        """Mirror/aggregator detection: host pairs serving >= 2
        identical documents over the synthetic 7-host crawl.  The
        fixture has no exact-dup texts, so every 5th doc's text is
        replaced by one of four shared pages (keyed doc_id % 20) on
        BOTH sides — the shared pages land on different hosts
        (doc_id % 7), planting real cross-host mirrored content."""
        import numpy as np
        import pyarrow as pa
        from apollo_ray.functions.urls import (mirror_hosts,
                                               synthetic_crawl_urls)

        def derive(batch):
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            txt = batch.column("text").to_pylist()
            out = ["shared page %d" % (i % 20) if i % 5 == 0 else t
                   for i, t in zip(ids.tolist(), txt)]
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "url": pa.array(synthetic_crawl_urls(ids),
                                type=pa.string()),
                "text": pa.array(out, type=pa.string())})

        pages = _docs(sf_dir).map_batches(derive, batch_format="pyarrow")
        return mirror_hosts(pages, num_partitions=8)

    def q_url_host_stats(sf_dir):
        from apollo_ray.functions.urls import url_host_stats
        return url_host_stats(_synthetic_pages(sf_dir))

    def _linked_docs(sf_dir):
        """Fixture docs with anchor markup spliced into the text on
        BOTH sides identically (fixture text carries no quotes or
        'href', verified): every doc gets one absolute link (the
        synthetic crawl url), every 3rd doc a relative link, every
        11th a trailing UNTERMINATED href both sides must drop."""
        import numpy as np
        import pyarrow as pa

        from apollo_ray.functions.urls import synthetic_crawl_urls

        def splice(batch):
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            urls = synthetic_crawl_urls(ids)
            txt = batch.column("text").to_pylist()
            out = []
            for i, t, u in zip(ids.tolist(), txt, urls):
                t = t + ' <a href="' + u + '">x</a>'
                if i % 3 == 0:
                    t += ' <a href="/rel/%d">y</a>' % (i % 10)
                if i % 11 == 0:
                    t += ' <a href="http://tail'
                out.append(t)
            return pa.table({"doc_id": batch.column("doc_id"),
                             "text": pa.array(out, type=pa.string())})

        return _docs(sf_dir).map_batches(splice, batch_format="pyarrow")

    def q_term_blocklist(sf_dir):
        """C4-style wordlist gate over the fixture vocabulary: two
        terms that occur ('slow', 'spark') plus one that never does
        ('leak') — whole-word, case-insensitive on both sides."""
        from apollo_ray.functions.classify import term_blocklist_filter
        return term_blocklist_filter(_docs(sf_dir),
                                     ["slow", "spark", "leak"])

    def q_quantile_filter(sf_dir):
        """Adaptive per-language length cut at the language's own
        p25 token-count quantile."""
        from apollo_ray.functions.textstats import quantile_filter
        return quantile_filter(_docs(sf_dir), pct="p25")

    def q_html_tag_stats(sf_dir):
        """Markup-density report.  Every 4th doc gets _HTML_SPLICE
        appended on BOTH sides (8 tags incl. a script and an anchor)."""
        import pyarrow as pa
        import pyarrow.compute as _pc
        from apollo_ray.functions.textstats import html_tag_stats

        def mess(batch):
            t = batch.column("text")
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            joined = _pc.binary_join_element_wise(
                t, pa.array([_HTML_SPLICE] * len(t)), "")
            spliced = _pc.if_else(pa.array(ids % 4 == 0), joined, t)
            return batch.set_column(
                batch.schema.get_field_index("text"), "text", spliced)

        return html_tag_stats(
            _docs(sf_dir).map_batches(mess, batch_format="pyarrow"))

    def q_code_detect(sf_dir):
        """Code-likeness flags.  The fixture text is prose-ish, so
        every 5th doc gets _CODE_SPLICE appended on BOTH sides (a
        def/return/var/#include snippet with braces, semicolons and
        an indented line)."""
        import pyarrow as pa
        import pyarrow.compute as _pc
        from apollo_ray.functions.classify import code_detect

        def mess(batch):
            t = batch.column("text")
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            joined = _pc.binary_join_element_wise(
                t, pa.array([_CODE_SPLICE] * len(t)), "")
            spliced = _pc.if_else(pa.array(ids % 5 == 0), joined, t)
            return batch.set_column(
                batch.schema.get_field_index("text"), "text", spliced)

        return code_detect(
            _docs(sf_dir).map_batches(mess, batch_format="pyarrow"))

    def q_extract_links(sf_dir):
        from apollo_ray.functions.urls import extract_links
        return extract_links(_linked_docs(sf_dir))

    def q_link_host_counts(sf_dir):
        from apollo_ray.functions.urls import link_host_counts
        return link_host_counts(_linked_docs(sf_dir), num_partitions=8)

    def q_anchor_texts(sf_dir):
        from apollo_ray.functions.urls import anchor_texts
        return anchor_texts(_linked_docs(sf_dir))

    def q_host_pagerank(sf_dir):
        """Integer-exact PageRank over the host link graph derived
        deterministically from doc_id on BOTH sides (97 hosts; every
        doc links to host (31*i+7)%97, every 3rd also to
        (17*i+3)%97 with messy case/port, every 5th adds a relative
        link both sides drop; i%97==3 produces a self-loop both
        sides drop)."""
        import numpy as np
        import pyarrow as pa
        from apollo_ray.functions.urls import host_pagerank

        def derive(batch):
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            txt = batch.column("text").to_pylist()
            urls, out = [], []
            for i, t in zip(ids.tolist(), txt):
                urls.append("http://h%d.test/%d" % (i % 97, i))
                t = t + ' <a href="http://h%d.test/x">a</a>' % (
                    (i * 31 + 7) % 97)
                if i % 3 == 0:
                    t += ' <a href="HTTP://H%d.Test:80/y">b</a>' % (
                        (i * 17 + 3) % 97)
                if i % 5 == 0:
                    t += ' <a href="/rel/z">c</a>'
                out.append(t)
            return pa.table({"doc_id": batch.column("doc_id"),
                             "url": pa.array(urls, type=pa.string()),
                             "text": pa.array(out, type=pa.string())})

        return host_pagerank(
            _docs(sf_dir).map_batches(derive, batch_format="pyarrow"),
            num_partitions=8)

    def q_per_host_topk(sf_dir):
        """Domain quota: top-10 docs per host by text length (the
        per-host cap step of web-corpus curation)."""
        import numpy as np
        import pyarrow as pa
        from apollo_ray.functions.urls import (per_host_topk,
                                               synthetic_crawl_urls)

        def add_url(batch):
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return batch.append_column(
                "url", pa.array(synthetic_crawl_urls(ids),
                                type=pa.string()))

        pages = _docs(sf_dir).map_batches(add_url, batch_format="pyarrow")
        return per_host_topk(pages, k=10, num_partitions=16)

    def q_dedup_tier_rollup(sf_dir):
        """Cost-ordered dedup cascade (the production tier ordering:
        cheap exact tiers before signature hashing) — per-tier
        in/removed/out counts; exact SQL for the exact + canonical-url
        tiers, -1 sentinels + engine-computed invariant flag for the
        minhash tier (its strong per-cluster checks live in
        minhash_dedup_invariants / minhash_cluster_stats)."""
        import numpy as np
        import pyarrow as pa
        from apollo_ray.config import DedupConfig
        from apollo_ray.functions.tiers import tiered_dedup
        from apollo_ray.functions.urls import synthetic_crawl_urls

        def add_url(batch):
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return batch.append_column(
                "url", pa.array(synthetic_crawl_urls(ids),
                                type=pa.string()))

        docs = _docs(sf_dir).map_batches(add_url, batch_format="pyarrow")
        out = tiered_dedup(docs, DedupConfig(feature_dim_log2=14),
                           num_partitions=16)
        return out["stats"]

    def q_dedup_tier_rollup_sem(sf_dir):
        """Four-tier cascade: exact -> url -> minhash -> semantic
        (SemDeDup over the survivors' embeddings).  Same sentinel
        discipline as the 3-tier rollup; the semantic tier's strong
        value checks live in the oracled `semdedup` query."""
        import numpy as np
        import pyarrow as pa
        from apollo_ray.config import DedupConfig
        from apollo_ray.functions.tiers import tiered_dedup
        from apollo_ray.functions.urls import synthetic_crawl_urls

        def add_url(batch):
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return batch.append_column(
                "url", pa.array(synthetic_crawl_urls(ids),
                                type=pa.string()))

        docs = _docs(sf_dir).map_batches(add_url, batch_format="pyarrow")
        out = tiered_dedup(docs, DedupConfig(feature_dim_log2=14),
                           num_partitions=16,
                           embeddings=_embeddings(sf_dir),
                           semantic_k=8, semantic_threshold=0.3)
        return out["stats"]

    def q_sliding_window(sf_dir):
        from apollo_ray.functions.asof import sliding_window_stats
        return sliding_window_stats(_events(sf_dir))

    def q_leakage_splits(sf_dir):
        from apollo_ray.functions.sampling import leakage_safe_splits
        return leakage_safe_splits(_docs(sf_dir))

    def q_pii_stats(sf_dir):
        from apollo_ray.functions.pii import pii_stats
        return pii_stats(_docs(sf_dir))

    def q_semdedup(sf_dir):
        from apollo_ray.functions.semdedup import semdedup
        return semdedup(_embeddings(sf_dir), k=8, threshold=0.3, iters=2)

    def q_corpus_stats(sf_dir):
        return textstats.corpus_stats(_docs(sf_dir))

    def q_top_terms(sf_dir):
        return textstats.top_terms(_docs(sf_dir), k=5)

    def q_length_quantiles(sf_dir):
        return textstats.length_quantiles(_docs(sf_dir))

    def q_pricing_summary(sf_dir):
        from apollo_ray.functions.analytics import pricing_summary
        return pricing_summary(_lineitem(sf_dir, [
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate"]))

    def q_forecast_revenue(sf_dir):
        from apollo_ray.functions.analytics import forecast_revenue
        return forecast_revenue(_lineitem(sf_dir, [
            "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]))

    def q_customer_order_dist(sf_dir):
        import ray.data
        from apollo_ray.functions.analytics import customer_order_dist
        customer = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey"])
        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey"])
        return customer_order_dist(customer, orders)

    def q_order_priority_counts(sf_dir):
        import ray.data
        from apollo_ray.functions.analytics import order_priority_counts
        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        return order_priority_counts(
            orders, _lineitem(sf_dir, ["l_orderkey", "l_returnflag"]))

    def q_top_revenue_orders(sf_dir):
        import ray.data
        from apollo_ray.functions.analytics import top_revenue_orders
        orders = ray.data.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"])
        customer = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"])
        return top_revenue_orders(
            _lineitem(sf_dir, ["l_orderkey", "l_extendedprice",
                               "l_discount", "l_shipdate"]),
            orders, customer)

    def q_regional_revenue(sf_dir):
        import ray.data
        from apollo_ray.functions.analytics import regional_revenue
        rd = lambda t, cols: ray.data.read_parquet(  # noqa: E731
            os.path.join(sf_dir, t + ".parquet"), columns=cols)
        return regional_revenue(
            _lineitem(sf_dir, ["l_orderkey", "l_suppkey",
                               "l_extendedprice", "l_discount"]),
            rd("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            rd("customer", ["c_custkey", "c_nationkey"]),
            rd("supplier", ["s_suppkey", "s_nationkey"]),
            rd("nation", ["n_nationkey", "n_name", "n_regionkey"]),
            rd("region", ["r_regionkey", "r_name"]))

    def q_promo_revenue(sf_dir):
        import ray.data
        from apollo_ray.functions.analytics import promo_revenue
        part = ray.data.read_parquet(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_type"])
        return promo_revenue(
            _lineitem(sf_dir, ["l_partkey", "l_extendedprice",
                               "l_discount", "l_shipdate"]), part)

    def q_unigram_score(sf_dir):
        from apollo_ray.functions.lm import unigram_score
        return unigram_score(_docs(sf_dir))

    def q_unigram_score_cap16(sf_dir):
        # distributed top-V + OOV-floor path (the web-scale mode)
        from apollo_ray.functions.lm import unigram_score
        return unigram_score(_docs(sf_dir), vocab_cap=16)

    def q_tfidf_top_terms(sf_dir):
        from apollo_ray.functions.lm import tfidf_top_terms
        return tfidf_top_terms(_docs(sf_dir), k=5)

    def q_bigram_score(sf_dir):
        from apollo_ray.functions.lm import bigram_score
        return bigram_score(_docs(sf_dir))

    def q_ppl_buckets(sf_dir):
        from apollo_ray.functions.ranking import ppl_buckets
        return ppl_buckets(_docs(sf_dir), n=3)

    def q_token_ntile(sf_dir):
        from apollo_ray.functions.ranking import token_ntile_buckets
        return token_ntile_buckets(_docs(sf_dir), n=10)

    def q_stratified_sample(sf_dir):
        from apollo_ray.functions.sampling import stratified_sample
        return stratified_sample(_docs(sf_dir), _STRAT_RATES,
                                 group_col="lang")

    def q_temperature_sample(sf_dir):
        from apollo_ray.functions.sampling import temperature_sample
        return temperature_sample(_docs(sf_dir), alpha=0.0,
                                  base_permille=300, group_col="lang")

    def q_redact_pii(sf_dir):
        from apollo_ray.functions.pii import redact_pii
        return redact_pii(_docs(sf_dir))

    def q_char_pair_counts(sf_dir):
        from apollo_ray.functions.lm import char_pair_counts
        return char_pair_counts(_docs(sf_dir))

    def q_pack_sequences(sf_dir):
        from apollo_ray.pipelines.export import pack_sequences
        return pack_sequences(_docs(sf_dir), seq_len=128, n_shards=8)

    def q_bpe_merges(sf_dir):
        from apollo_ray.functions.bpe import bpe_train
        return bpe_train(_docs(sf_dir), num_merges=6)

    def q_bpe_learned_counts(sf_dir):
        from apollo_ray.functions.bpe import bpe_encode_counts
        return bpe_encode_counts(_docs(sf_dir), num_merges=6)

    def q_value_quantiles(sf_dir):
        return textstats.value_quantiles(_events(sf_dir))

    def q_props_key_stats(sf_dir):
        return textstats.props_key_stats(_events(sf_dir))

    def q_user_cumulative_spend(sf_dir):
        from apollo_ray.functions.asof import user_cumulative_spend
        return user_cumulative_spend(_events(sf_dir))

    def q_retention_cohorts(sf_dir):
        from apollo_ray.functions.asof import retention_cohorts
        return retention_cohorts(_events(sf_dir))

    def q_funnel_counts(sf_dir):
        from apollo_ray.functions.asof import funnel_counts
        return funnel_counts(_events(sf_dir))

    def q_token_freq_hist(sf_dir):
        return textstats.token_freq_hist(_docs(sf_dir))

    def q_source_dup_stats(sf_dir):
        return textstats.source_dup_stats(_docs(sf_dir))

    def q_dup_size_hist(sf_dir):
        return dedup_extras.dup_size_hist(_docs(sf_dir))

    def q_jaccard_join(sf_dir):
        # incremental-dedup shape: join the "new shard" (odd doc_ids)
        # against the "existing corpus" (even doc_ids)
        import pyarrow.compute as pc

        def _side(parity: int):
            def f(batch):
                m = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1),
                             parity)
                return batch.filter(m)
            return f

        docs = _docs(sf_dir)
        left = docs.map_batches(_side(0), batch_format="pyarrow")
        right = docs.map_batches(_side(1), batch_format="pyarrow")
        return dedup_extras.jaccard_join(left, right, k=3, threshold=0.4)

    def q_containment_join(sf_dir):
        # decontamination shape: how much of each "benchmark" doc (odd
        # ids) is contained in any "training" doc (even ids)
        import pyarrow.compute as pc

        def _side(parity: int):
            def f(batch):
                m = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1),
                             parity)
                return batch.filter(m)
            return f

        docs = _docs(sf_dir)
        left = docs.map_batches(_side(0), batch_format="pyarrow")
        right = docs.map_batches(_side(1), batch_format="pyarrow")
        return dedup_extras.jaccard_join(left, right, k=3, threshold=0.6,
                                         metric="containment")

    def q_normalize_text(sf_dir):
        """Unicode/whitespace canonicalization.  The fixture text is
        clean ASCII, so a messy variant is derived deterministically on
        BOTH sides: every ' the ' becomes a splice of a decomposed
        e-acute, CRLF, a tab run and a BEL control char
        (_MESSY_SPLICE; the oracle builds the identical string with
        chr())."""
        import pyarrow as pa
        import pyarrow.compute as _pc
        from apollo_ray.functions.clean import normalize_text

        def mess(batch):
            t = batch.column("text")
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            return batch.set_column(
                batch.schema.get_field_index("text"), "text",
                _pc.replace_substring(t, " the ", _MESSY_SPLICE))

        return normalize_text(
            _docs(sf_dir).map_batches(mess, batch_format="pyarrow"))

    def q_hostlist_filter(sf_dir):
        """Domain blocklist over the synthetic crawl urls: exact-host
        entries plus the port-strip path (the c==1 urls keep :8080 in
        the canonical host)."""
        from apollo_ray.functions.urls import hostlist_filter
        return hostlist_filter(_synthetic_pages(sf_dir),
                               _BLOCKLIST_DOMAINS)

    def q_nb_classify(sf_dir):
        from apollo_ray.functions.classify import nb_classify
        return nb_classify(_docs(sf_dir), label_col="source",
                           num_partitions=16)

    def q_nb_classify_cap64(sf_dir):
        from apollo_ray.functions.classify import nb_classify
        return nb_classify(_docs(sf_dir), label_col="source",
                           vocab_cap=64, num_partitions=16)

    def q_char_entropy(sf_dir):
        from apollo_ray.functions.textstats import char_entropy
        return char_entropy(_docs(sf_dir))

    def q_token_budget_sample(sf_dir):
        """Per-source token-budget mixing: 600 tokens per source cuts
        roughly half of each source's ~25 fixture docs."""
        from apollo_ray.functions.sampling import token_budget_sample
        return token_budget_sample(_docs(sf_dir), 600,
                                   num_partitions=16)

    def q_source_overlap(sf_dir):
        from apollo_ray.functions.dedup_extras import source_overlap
        return source_overlap(_docs(sf_dir), num_partitions=16)

    def q_encoding_quality(sf_dir):
        """Encoding-health counts.  The fixture text is clean ASCII,
        so every 7th doc gets _ENC_SPLICE appended on BOTH sides
        (replacement char, two mojibake markers, a BEL, an nbsp)."""
        import pyarrow as pa
        import pyarrow.compute as _pc
        from apollo_ray.functions.textstats import encoding_quality

        def mess(batch):
            t = batch.column("text")
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
            ids = batch.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            joined = _pc.binary_join_element_wise(
                t, pa.array([_ENC_SPLICE] * len(t)), "")
            spliced = _pc.if_else(pa.array(ids % 7 == 0), joined, t)
            return batch.set_column(
                batch.schema.get_field_index("text"), "text", spliced)

        return encoding_quality(
            _docs(sf_dir).map_batches(mess, batch_format="pyarrow"))

    def q_readability(sf_dir):
        from apollo_ray.functions.textstats import readability
        return readability(_docs(sf_dir))

    def q_chunk_documents(sf_dir):
        """120-char windows with 24 overlap: the 48-553-char fixture
        docs emit 1-6 chunks each."""
        from apollo_ray.functions.clean import chunk_documents
        return chunk_documents(_docs(sf_dir), size=120, overlap=24)

    def q_word_pmi_pairs(sf_dir):
        from apollo_ray.functions.lm import word_pmi_pairs
        return word_pmi_pairs(_docs(sf_dir), min_count=5, topn=40,
                              num_partitions=16)

    def q_embedding_quantize(sf_dir):
        from apollo_ray.functions.ann import embedding_quantize
        return embedding_quantize(_embeddings(sf_dir))

    def q_snapshot_diff(sf_dir):
        """Crawl-refresh diff: the fixture splits into an 'old'
        (even doc_id) and 'new' (odd doc_id) snapshot keyed by
        doc_id % 249 (odd modulus so both parities share keys);
        latest-id-wins per side, text equality -> unchanged."""
        import pyarrow as pa
        import pyarrow.compute as _pc
        from apollo_ray.functions.snapshots import snapshot_diff

        def keyed(parity):
            def f(batch):
                ids = batch.column("doc_id").cast(pa.int64())
                keep = _pc.equal(
                    _pc.bit_wise_and(ids, pa.scalar(1, type=pa.int64())),
                    pa.scalar(parity, type=pa.int64()))
                b = batch.filter(keep)
                k = _pc.subtract(
                    b.column("doc_id").cast(pa.int64()),
                    _pc.multiply(
                        _pc.divide(b.column("doc_id").cast(pa.int64()),
                                   pa.scalar(249, type=pa.int64())),
                        pa.scalar(249, type=pa.int64())))
                return b.append_column("page_key", k)
            return f

        docs = _docs(sf_dir)
        old = docs.map_batches(keyed(0), batch_format="pyarrow")
        new = docs.map_batches(keyed(1), batch_format="pyarrow")
        return snapshot_diff(old, new, num_partitions=16)

    def q_feature_hash_embed(sf_dir):
        """Hashing-trick 16-dim doc vectors over the documents table
        (md5 bucket + sign hashes, signed occurrence sums)."""
        from apollo_ray.functions.ann import feature_hash_embed
        return feature_hash_embed(_docs(sf_dir), dim=16)

    def q_embedding_stats(sf_dir):
        from apollo_ray.functions.ann import embedding_stats
        return embedding_stats(_embeddings(sf_dir))

    def q_kmeans_assign_k8(sf_dir):
        from apollo_ray.functions.ann import kmeans_assign
        return kmeans_assign(_embeddings(sf_dir), k=8)

    def q_pq_codes(sf_dir):
        """Product-quantization codes (4 subspaces x 8 codewords,
        2 integer Lloyd rounds) over the embeddings table — the
        IVF-PQ index format, value-exact in SQL."""
        from apollo_ray.functions.ann import pq_encode
        return pq_encode(_embeddings(sf_dir), m=4, k=8, iters=2)

    def q_priority_dedup(sf_dir):
        """Multi-source merge: per distinct text keep the copy from
        the highest-priority source (listed best-first; unlisted rank
        after, by source string), then min doc_id."""
        from apollo_ray.functions.merge import priority_dedup
        return priority_dedup(_docs(sf_dir), priority=("src7", "src3"))

    def q_normalized_exact_dedup(sf_dir):
        """ccnet-style normalize-then-hash exact dedup tier: groups by
        canonicalized text (NFC + line endings + control strip +
        whitespace collapse), reporting the distinct raw variants each
        normalized group merged."""
        from apollo_ray.functions.merge import normalized_exact_dedup
        return normalized_exact_dedup(_docs(sf_dir))

    def q_bbit_minhash_pairs(sf_dir):
        """1-bit MinHash similarity estimates (Li & Koenig 2010) for
        every LSH-co-bucketed pair — the 32x-compressed sketch tier,
        integer-exact estimator."""
        return dedup_extras.bbit_minhash_pairs(_docs(sf_dir))

    def q_oph_signatures(sf_dir):
        """One-Permutation-Hashing MinHash with rotation densification
        (Li et al. 2012; Shrivastava & Li 2014): one hash per shingle
        instead of n_perm permutations — the hash-bound signature
        path for 10^12-doc sketching, value-exact in SQL."""
        return dedup_extras.oph_signatures(_docs(sf_dir))

    def q_ivfpq_topk(sf_dir):
        """IVF-PQ approximate top-k (Jegou et al. 2011): coarse cells
        + nprobe scan + ADC codebook lookups, all integer milli-unit
        arithmetic — the billion-scale ANN index layout, value-exact
        in SQL."""
        from apollo_ray.functions.ann import ivfpq_topk
        return ivfpq_topk(_embeddings(sf_dir), query_ids=list(range(8)),
                          k_out=5, n_coarse=8, m=4, k_pq=8, iters=1,
                          nprobe=2)

    return {
        # Round-5 rotation (VERDICT r4 task 1): ivfpq_topk and
        # oph_signatures are the only registry entries with no driver
        # CORRECTNESS record in any round (they sat at positions 51-52,
        # past the ~50-row window).  They lead this round; everything
        # else keeps its frozen r4 relative order so cumulative union
        # coverage stays 117/117.
        "ivfpq_topk": q_ivfpq_topk,
        "oph_signatures": q_oph_signatures,
        "paragraph_dedup": q_paragraph_dedup,
        "lang_budget_sample": q_lang_budget_sample,
        "html_tag_stats": q_html_tag_stats,
        "quantile_filter": q_quantile_filter,
        "term_blocklist": q_term_blocklist,
        "strip_boilerplate": q_strip_boilerplate,
        "soft_dedup_weights": q_soft_dedup_weights,
        "heavy_hitters": q_heavy_hitters,
        "canonical_urls": q_canonical_urls,
        "url_host_stats": q_url_host_stats,
        "mirror_hosts": q_mirror_hosts,
        "per_host_topk": q_per_host_topk,
        "extract_links": q_extract_links,
        "link_host_counts": q_link_host_counts,
        "code_detect": q_code_detect,
        "anchor_texts": q_anchor_texts,
        "host_pagerank": q_host_pagerank,
        "embedding_stats": q_embedding_stats,
        "kmeans_assign_k8": q_kmeans_assign_k8,
        "pq_codes": q_pq_codes,
        "feature_hash_embed": q_feature_hash_embed,
        "snapshot_diff": q_snapshot_diff,
        "dedup_tier_rollup": q_dedup_tier_rollup,
        "dedup_tier_rollup_sem": q_dedup_tier_rollup_sem,
        "pii_stats": q_pii_stats,
        "redact_pii": q_redact_pii,
        "semdedup": q_semdedup,
        "stratified_sample": q_stratified_sample,
        "temperature_sample_a0": q_temperature_sample,
        "corpus_stats": q_corpus_stats,
        "top_terms_lang": q_top_terms,
        "length_quantiles": q_length_quantiles,
        "pricing_summary": q_pricing_summary,
        "forecast_revenue": q_forecast_revenue,
        "top_revenue_orders": q_top_revenue_orders,
        "order_priority_counts": q_order_priority_counts,
        "customer_order_dist": q_customer_order_dist,
        "regional_revenue": q_regional_revenue,
        "promo_revenue": q_promo_revenue,
        "ppl_buckets": q_ppl_buckets,
        "token_ntile_buckets": q_token_ntile,
        "unigram_score": q_unigram_score,
        "unigram_score_cap16": q_unigram_score_cap16,
        "tfidf_top_terms": q_tfidf_top_terms,
        "bigram_score": q_bigram_score,
        "communities_invariants": q_communities_invariants,
        "minhash_dedup_clusters": q_minhash_clusters,
        "priority_dedup": q_priority_dedup,
        "normalized_exact_dedup": q_normalized_exact_dedup,
        "bbit_minhash_pairs": q_bbit_minhash_pairs,
        "minhash_dedup_invariants": q_minhash_invariants,
        "minhash_cluster_stats": q_minhash_cluster_stats,
        "embedding_quantize": q_embedding_quantize,
        "encoding_quality": q_encoding_quality,
        "readability": q_readability,
        "chunk_documents": q_chunk_documents,
        "word_pmi_pairs": q_word_pmi_pairs,
        "normalize_text": q_normalize_text,
        "hostlist_filter": q_hostlist_filter,
        "nb_classify": q_nb_classify,
        "nb_classify_cap64": q_nb_classify_cap64,
        "char_entropy": q_char_entropy,
        "token_budget_sample": q_token_budget_sample,
        "source_overlap": q_source_overlap,
        "exact_dedup_groups": q_exact_dedup,
        "jaccard_join": q_jaccard_join,
        "dup_size_hist": q_dup_size_hist,
        "containment_join": q_containment_join,
        "funnel_counts": q_funnel_counts,
        "retention_cohorts": q_retention_cohorts,
        "user_cumulative_spend": q_user_cumulative_spend,
        "props_key_stats": q_props_key_stats,
        "value_quantiles": q_value_quantiles,
        "char_pair_counts": q_char_pair_counts,
        "bpe_merges": q_bpe_merges,
        "pack_sequences": q_pack_sequences,
        "bpe_learned_token_counts": q_bpe_learned_counts,
        "token_freq_hist": q_token_freq_hist,
        "source_dup_stats": q_source_dup_stats,
        "lang_stats": q_lang_stats,
        "token_counts": q_token_counts,
        "quality_stats": q_quality,
        "docfreq": q_docfreq,
        "docfreq_min5": q_docfreq_min5,
        "shingle_counts": q_shingles,
        "shingle_novelty": q_shingle_novelty,
        "ngram_jaccard_pairs": q_ngram_pairs,
        "user_last_event": q_user_last_event,
        "events_hourly": q_events_hourly,
        "user_sessions": q_user_sessions,
        "emb_label_counts": q_emb_label_counts,
        "ann_close_pairs": q_ann_close,
        "emb_dup_pairs": q_emb_dup_pairs,
        "soft_near_dedup_invariants": q_soft_near_dedup_invariants,
        "simhash_pairs": q_simhash_pairs,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_clusters": q_minhash_lsh_clusters,
        "lang_id_fingerprint": q_lang_id,
        "ann_topk": q_ann_topk,
        "substring_dup_spans": q_substring_spans,
        "repetition_stats": q_repetition_stats,
        "c4_clean": q_c4_clean,
        "line_dedup": q_line_dedup,
        "bpe_token_counts": q_bpe_token_counts,
        "asof_purchase": q_asof_purchase,
        "purchase_window": q_purchase_window,
        "decontam_overlap": q_decontam,
        "hash_sample_200": q_hash_sample,
        "bloom_dedup": q_bloom_dedup,
        "dsir_logweights": q_dsir,
        "kmv_distinct_text": q_kmv_distinct,
        "hll_distinct_text": q_hll_distinct,
        "cms_token_counts": q_cms_counts,
        "leakage_safe_splits": q_leakage_splits,
        "sliding_window_stats": q_sliding_window,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "normalize_text": _normalize_text_sql_entry(),
        "hostlist_filter": _hostlist_filter_sql_entry(),
        "nb_classify": _nb_classify_sql_entry(None),
        "nb_classify_cap64": _nb_classify_sql_entry(64),
        "char_entropy": _char_entropy_sql_entry(),
        "token_budget_sample": _token_budget_sql_entry(),
        "source_overlap": _source_overlap_sql_entry(),
        "encoding_quality": _encoding_quality_sql_entry(),
        "readability": _readability_sql_entry(),
        "chunk_documents": _chunk_documents_sql_entry(),
        "word_pmi_pairs": _word_pmi_sql_entry(),
        "embedding_quantize": _embedding_quantize_sql_entry(),
        "exact_dedup_groups": """
            SELECT min(doc_id) AS rep_id, count(*) AS n_members
            FROM documents GROUP BY text
        """,
        "dup_size_hist": """
            WITH g AS (SELECT count(*) AS n_members
                       FROM documents GROUP BY text)
            SELECT n_members, CAST(count(*) AS BIGINT) AS n_groups
            FROM g GROUP BY n_members
        """,
        "jaccard_join": r"""
            WITH tok AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE length(trim(text)) > 0),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
              FROM tok,
                   LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS l_id, b.doc_id AS r_id, count(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s
              WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
              GROUP BY a.doc_id, b.doc_id)
            SELECT l_id, r_id, c AS shared,
                   (2000000 * c + (su.n + sv.n - c)) // (2 * (su.n + sv.n - c))
                       AS jacc_ppm
            FROM inter JOIN sz su ON su.doc_id = l_id
                       JOIN sz sv ON sv.doc_id = r_id
            WHERE c * 1000000 >= 400000 * (su.n + sv.n - c)
        """,
        "pack_sequences": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8
                          AS INTEGER) AS shard,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END AS n_tokens
              FROM documents),
            c AS (
              SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
                     sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
            SELECT doc_id, shard, n_tokens,
                   CASE WHEN n_tokens = 0 THEN -1
                        ELSE CAST((cum - n_tokens) // 128 AS BIGINT)
                   END AS first_seq,
                   CASE WHEN n_tokens = 0 THEN -1
                        ELSE CAST((cum - 1) // 128 AS BIGINT)
                   END AS last_seq
            FROM c
        """,
        "bpe_merges": _bpe_train_sql_entry(),
        "bpe_learned_token_counts": _bpe_encode_sql_entry(),
        "char_pair_counts": r"""
            WITH tok AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM documents WHERE length(trim(text)) > 0),
            pr AS (
              SELECT substr(w, i, 2) AS pair
              FROM tok,
                   LATERAL (SELECT unnest(range(1, length(w))) AS i))
            SELECT pair, CAST(count(*) AS BIGINT) AS n
            FROM pr GROUP BY pair
        """,
        "value_quantiles": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   quantile_disc(CAST(round(value * 100) AS BIGINT), 0.25)
                       AS p25_c,
                   quantile_disc(CAST(round(value * 100) AS BIGINT), 0.50)
                       AS p50_c,
                   quantile_disc(CAST(round(value * 100) AS BIGINT), 0.75)
                       AS p75_c
            FROM events GROUP BY event_type
        """,
        "props_key_stats": r"""
            WITH e AS (
              SELECT event_type,
                     CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
                          AS BIGINT) AS v
              FROM events
              WHERE regexp_extract(props, '"k":\s*(-?\d+)', 1) <> '')
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_with_key,
                   CAST(sum(v) AS BIGINT) AS sum_v,
                   min(v) AS min_v, max(v) AS max_v
            FROM e GROUP BY event_type
        """,
        "user_cumulative_spend": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum_spend_c
            FROM events WHERE event_type = 'purchase'
        """,
        "retention_cohorts": """
            WITH act AS (
              SELECT DISTINCT user_id,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
              FROM events),
            coh AS (SELECT user_id, min(day) AS cohort_day
                    FROM act GROUP BY user_id)
            SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM act a JOIN coh c ON a.user_id = c.user_id
            GROUP BY 1, 2
        """,
        "funnel_counts": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'signup' GROUP BY user_id),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
              WHERE e.event_type = 'view' GROUP BY e.user_id),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t FROM events e
              JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
              WHERE e.event_type = 'purchase' GROUP BY e.user_id)
            SELECT 1 AS step_idx, 'signup' AS step,
                   CAST(count(*) AS BIGINT) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
            UNION ALL
            SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3
        """,
        "containment_join": r"""
            WITH tok AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE length(trim(text)) > 0),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
              FROM tok,
                   LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS l_id, b.doc_id AS r_id, count(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s
              WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
              GROUP BY a.doc_id, b.doc_id)
            SELECT l_id, r_id, c AS shared,
                   (2000000 * c + sv.n) // (2 * sv.n) AS cont_ppm
            FROM inter JOIN sz sv ON sv.doc_id = r_id
            WHERE c * 1000000 >= 600000 * sv.n
        """,
        "token_freq_hist": r"""
            WITH tok AS (
              SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
              FROM documents WHERE length(trim(text)) > 0),
            cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t)
            SELECT length(bin(c)) - 1 AS bucket, count(*) AS n_tokens
            FROM cnt GROUP BY 1
        """,
        "source_dup_stats": """
            SELECT source, count(*) AS n_docs,
                   count(DISTINCT text) AS n_distinct,
                   (2000000 * (count(*) - count(DISTINCT text)) + count(*))
                       // (2 * count(*)) AS dup_ppm
            FROM documents GROUP BY source
        """,
        "lang_stats": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "quality_stats": r"""
            WITH tok AS (
              SELECT doc_id, text,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\s+')
                     END AS toks
              FROM documents)
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   length(text) AS n_chars,
                   CAST(coalesce(list_aggregate(
                        list_transform(toks, t -> length(t)), 'sum'), 0)
                        AS BIGINT) AS sum_token_len,
                   len(list_filter(toks,
                        t -> list_contains([%s], lower(t)))) AS n_stopwords,
                   (length(text) - length(replace(text, '.', ''))
                    + length(text) - length(replace(text, ',', ''))
                    + length(text) - length(replace(text, ';', ''))
                    + length(text) - length(replace(text, ':', ''))
                    + length(text) - length(replace(text, '!', ''))
                    + length(text) - length(replace(text, '?', '')))
                   AS n_punct
            FROM tok
        """ % _STOPWORD_SQL_LIST,
        "docfreq": r"""
            SELECT token, count(DISTINCT doc_id) AS df
            FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                  FROM documents WHERE length(trim(text)) > 0)
            GROUP BY token
        """,
        "docfreq_min5": r"""
            SELECT token, count(DISTINCT doc_id) AS df
            FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                  FROM documents WHERE length(trim(text)) > 0)
            GROUP BY token HAVING count(DISTINCT doc_id) >= 5
        """,
        "shingle_counts": r"""
            WITH tok AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\s+')
                     END AS toks
              FROM documents)
            SELECT t.doc_id,
                   coalesce(s.n, 0) AS n_shingles
            FROM tok t LEFT JOIN (
              SELECT doc_id,
                     count(DISTINCT array_to_string(toks[i:i+2], ' ')) AS n
              FROM tok,
                   LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i)
              GROUP BY doc_id) s ON s.doc_id = t.doc_id
        """,
        "shingle_novelty": _shingle_novelty_sql_entry(),
        "ngram_jaccard_pairs": r"""
            WITH tok AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE length(trim(text)) > 0),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
              FROM tok,
                   LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i)),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT u, v
            FROM inter JOIN sz su ON su.doc_id = u JOIN sz sv ON sv.doc_id = v
            WHERE c * 1.0 / (su.n + sv.n - c) >= 0.5
        """,
        "user_last_event": """
            SELECT user_id, epoch_us(max(ts)) AS last_ts_us,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "events_hourly": """
            SELECT user_id,
                   epoch_us(date_trunc('hour', ts)) AS hour_us,
                   count(*) AS n,
                   round(sum(value), 4) AS sum_value_r4
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        """,
        "user_sessions": """
            WITH g AS (
              SELECT user_id, ts,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                               OVER (PARTITION BY user_id ORDER BY ts)
                               > 1800 * 1000000 THEN 1 ELSE 0 END AS new_s
              FROM events)
            SELECT user_id,
                   CAST(1 + sum(CASE WHEN new_s IS NULL THEN 0
                                     ELSE new_s END) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "emb_label_counts": """
            SELECT label, count(*) AS n FROM embeddings GROUP BY label
        """,
        "simhash_pairs": r"""
            WITH tok AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE length(trim(text)) > 0),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
              FROM tok,
                   LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 0)
                                                  + 1)) AS i)
              WHERE len(toks) >= 3),
            bits AS (
              SELECT doc_id, j,
                     sum(CASE WHEN (md5_number_lower(s) >> CAST(j AS INTEGER))
                                   & 1 = 1 THEN 1 ELSE -1 END) AS vote
              FROM sh, LATERAL (SELECT unnest(range(0, 64)) AS j)
              GROUP BY doc_id, j),
            sig AS (
              SELECT doc_id,
                     bit_or(CASE WHEN vote > 0
                                 THEN (1::UBIGINT << CAST(j AS INTEGER))
                                 ELSE 0::UBIGINT END) AS sig
              FROM bits GROUP BY doc_id)
            SELECT a.doc_id AS u, b.doc_id AS v,
                   CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 3
        """,
        "lang_id_fingerprint": _lang_id_sql(),
        "minhash_signatures": _minhash_signatures_sql_entry(),
        "minhash_lsh_clusters": _minhash_lsh_clusters_sql_entry(),
        "purchase_window": """
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS ts_us
              FROM events WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id, p.ts_us,
                   CAST(count(e.event_id) AS BIGINT) AS n_win_events,
                   coalesce(max(e.value), -1.0) AS max_value
            FROM p LEFT JOIN events e
              ON e.user_id = p.user_id
             AND e.event_id != p.event_id
             AND epoch_us(e.ts) BETWEEN p.ts_us - 600000000 AND p.ts_us
            GROUP BY p.event_id, p.user_id, p.ts_us
        """,
        "asof_purchase": """
            WITH r AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
                     row_number() OVER (PARTITION BY user_id, ts
                                        ORDER BY event_id DESC) AS rn
              FROM events WHERE event_type = 'purchase'),
            r1 AS (SELECT user_id, ts_us, event_id, value
                   FROM r WHERE rn = 1),
            l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
                  FROM events)
            SELECT l.event_id, l.user_id, l.ts_us,
                   coalesce(r1.ts_us, -1) AS prior_ts_us,
                   coalesce(r1.event_id, -1) AS prior_event_id,
                   coalesce(r1.value, -1.0) AS prior_value
            FROM l ASOF LEFT JOIN r1
              ON l.user_id = r1.user_id AND l.ts_us >= r1.ts_us
        """,
        "bpe_token_counts": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(
                        text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]+'))
                        AS BIGINT) AS n_tokens
            FROM documents
        """,
        "c4_clean": r"""
            WITH l AS (
              SELECT doc_id,
                     list_filter(string_split(text, chr(10)),
                        x -> len(regexp_split_to_array(trim(x), '\s+')) >= 3
                             AND length(trim(x)) > 0
                             AND regexp_matches(x, '[.!?"]$')
                             AND NOT contains(lower(x), 'javascript')
                             AND NOT contains(lower(x), 'cookie')
                             AND NOT contains(lower(x), 'lorem ipsum')
                     ) AS kept,
                     len(string_split(text, chr(10))) AS n_lines
              FROM documents)
            SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_kept,
                   CAST(n_lines - len(kept) AS BIGINT) AS n_dropped,
                   coalesce(array_to_string(kept, chr(10)), '') AS clean_text
            FROM l
        """,
        "line_dedup": _line_dedup_sql_entry(),
        "paragraph_dedup": _paragraph_dedup_sql_entry(),
        "lang_budget_sample": _lang_budget_sample_sql_entry(),
        "html_tag_stats": _html_tag_stats_sql_entry(),
        "quantile_filter": _quantile_filter_sql_entry(),
        "term_blocklist": _term_blocklist_sql_entry(),
        "strip_boilerplate": _strip_boilerplate_sql_entry(),
        "soft_dedup_weights": _soft_dedup_sql_entry(),
        "repetition_stats": r"""
            WITH l AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS line
              FROM documents),
            lc AS (
              SELECT doc_id, line, count(*) AS cnt,
                     sum(length(line)) AS chars
              FROM l GROUP BY doc_id, line),
            lagg AS (
              SELECT doc_id,
                     CAST(sum(cnt) AS BIGINT) AS n_lines,
                     CAST(sum(cnt) - count(*) AS BIGINT) AS n_dup_lines,
                     CAST(sum(CASE WHEN cnt >= 2 THEN chars ELSE 0 END)
                          AS BIGINT) AS dup_line_chars,
                     CAST(sum(chars) AS BIGINT) AS line_chars
              FROM lc GROUP BY doc_id),
            tok AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                          ELSE regexp_split_to_array(trim(text), '\s+')
                     END AS toks
              FROM documents),
            g2 AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
              FROM tok, unnest(range(1, greatest(len(toks), 1))) AS t(i)),
            g2c AS (SELECT doc_id, g, count(*) AS cnt FROM g2
                    GROUP BY doc_id, g),
            g2agg AS (
              SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_2grams,
                     CAST(sum(cnt) - count(*) AS BIGINT) AS n_dup_2grams
              FROM g2c GROUP BY doc_id),
            g3 AS (
              SELECT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
              FROM tok,
                   unnest(range(1, greatest(len(toks) - 1, 1))) AS t(i)),
            g3c AS (SELECT doc_id, g, count(*) AS cnt FROM g3
                    GROUP BY doc_id, g),
            g3agg AS (
              SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_3grams,
                     CAST(sum(cnt) - count(*) AS BIGINT) AS n_dup_3grams
              FROM g3c GROUP BY doc_id)
            SELECT d.doc_id, lagg.n_lines, lagg.n_dup_lines,
                   lagg.dup_line_chars, lagg.line_chars,
                   coalesce(g2agg.n_2grams, 0) AS n_2grams,
                   coalesce(g2agg.n_dup_2grams, 0) AS n_dup_2grams,
                   coalesce(g3agg.n_3grams, 0) AS n_3grams,
                   coalesce(g3agg.n_dup_3grams, 0) AS n_dup_3grams
            FROM documents d
            JOIN lagg USING (doc_id)
            LEFT JOIN g2agg USING (doc_id)
            LEFT JOIN g3agg USING (doc_id)
        """,
        "substring_dup_spans": """
            WITH w AS (
              SELECT doc_id, i, substr(text, CAST(i AS INT), 40) AS win
              FROM documents, unnest(range(1, length(text) - 40 + 2)) AS t(i)
            ),
            dup AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
            marks AS (
              SELECT w.doc_id, CAST(w.i - 1 AS BIGINT) AS s,
                     CAST(w.i - 1 + 40 AS BIGINT) AS e
              FROM w JOIN dup USING (win)),
            isl AS (
              SELECT doc_id, s, e,
                     CASE WHEN s > lag(e) OVER (PARTITION BY doc_id
                                                ORDER BY s)
                          THEN 1 ELSE 0 END AS brk
              FROM marks),
            g AS (SELECT doc_id, s, e,
                         sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                                        ROWS UNBOUNDED PRECEDING) AS grp
                  FROM isl)
            SELECT doc_id, min(s) AS start_pos, max(e) AS end_pos,
                   CAST(max(e) - min(s) AS BIGINT) AS span_len
            FROM g GROUP BY doc_id, grp
        """,
        "minhash_dedup_invariants": """
            SELECT min(doc_id) AS rep_id, count(*) AS n_members,
                   CAST(1 AS BIGINT) AS n_distinct_cc
            FROM documents GROUP BY text
        """,
        "minhash_cluster_stats": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(1 AS BIGINT) AS clusters_le_distinct_texts,
                   CAST(1 AS BIGINT) AS max_cc_ge_max_exact
            FROM documents
        """,
        "soft_near_dedup_invariants": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(1 AS BIGINT) AS mass_ok,
                   CAST(1 AS BIGINT) AS bounds_ok
            FROM documents
        """,
        "communities_invariants": """
            SELECT CAST(1 AS BIGINT) AS docs_unique,
                   CAST(1 AS BIGINT) AS cc_match,
                   CAST(1 AS BIGINT) AS coverage,
                   CAST(1 AS BIGINT) AS pair_rule,
                   CAST(1 AS BIGINT) AS community_within_cc
        """,
        "decontam_overlap": r"""
            WITH tok AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents WHERE length(trim(text)) > 0),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS s
              FROM tok,
                   LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 0)
                                                  + 1)) AS i)),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
            sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            hits AS (
              SELECT sh.doc_id, count(*) AS n_hits
              FROM sh JOIN bench USING (s) GROUP BY sh.doc_id)
            SELECT d.doc_id,
                   coalesce(sz.n_sh, 0) AS n_shingles,
                   coalesce(hits.n_hits, 0) AS n_bench_hits,
                   coalesce(hits.n_hits, 0) > 0 AS contaminated
            FROM documents d
            LEFT JOIN sz USING (doc_id)
            LEFT JOIN hits USING (doc_id)
        """,
        "hash_sample_200": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < 200
        """,
        "bloom_dedup": """
            WITH pos AS (
              SELECT DISTINCT doc_id,
                CAST((CAST(md5_number_lower(text) AS HUGEINT)
                    + j * CAST(md5_number_upper(text) AS HUGEINT))
                     % 1048576 AS BIGINT) AS pos
              FROM documents, range(4) t(j)),
            fs AS (SELECT pos, min(doc_id) AS first_doc
                   FROM pos GROUP BY pos)
            SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_pos,
                   CAST(sum(CASE WHEN f.first_doc < p.doc_id
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_set,
                   count(*) = sum(CASE WHEN f.first_doc < p.doc_id
                                  THEN 1 ELSE 0 END) AS flagged
            FROM pos p JOIN fs f USING (pos)
            GROUP BY p.doc_id
        """,
        "dsir_logweights": _dsir_sql_entry(),
        "kmv_distinct_text": _kmv_sql_entry(),
        "hll_distinct_text": _hll_sql_entry(),
        "cms_token_counts": _cms_sql_entry(),
        "heavy_hitters": _heavy_hitters_sql_entry(),
        "canonical_urls": _canonical_urls_sql_entry(),
        "url_host_stats": _url_host_stats_sql_entry(),
        "mirror_hosts": _mirror_hosts_sql_entry(),
        "per_host_topk": _per_host_topk_sql_entry(),
        "extract_links": _extract_links_sql_entry(),
        "link_host_counts": _link_host_counts_sql_entry(),
        "code_detect": _code_detect_sql_entry(),
        "anchor_texts": _anchor_texts_sql_entry(),
        "host_pagerank": _host_pagerank_sql_entry(),
        "embedding_stats": _embedding_stats_sql_entry(),
        "kmeans_assign_k8": _kmeans_assign_sql_entry(),
        "pq_codes": _pq_codes_sql_entry(),
        "feature_hash_embed": _feature_hash_embed_sql_entry(),
        "snapshot_diff": _snapshot_diff_sql_entry(),
        "dedup_tier_rollup": _tiered_sql_entry(),
        "dedup_tier_rollup_sem": _tiered_sql_entry(semantic=True),
        "leakage_safe_splits": _leakage_sql_entry(),
        "sliding_window_stats": _sliding_sql_entry(),
        "pii_stats": _pii_stats_sql(),
        "redact_pii": _redact_pii_sql(),
        "semdedup": _semdedup_sql_entry(),
        "stratified_sample": _stratified_sql_entry(),
        "temperature_sample_a0": _temperature_sql_entry(),
        "corpus_stats": r"""
            SELECT source, lang, count(*) AS n_docs,
                   count(DISTINCT text) AS n_unique_texts,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\s+')) END)
                        AS BIGINT) AS sum_tokens
            FROM documents GROUP BY source, lang
        """,
        "ppl_buckets": _ppl_buckets_sql_entry(),
        "token_ntile_buckets": _token_ntile_sql_entry(),
        "unigram_score": _unigram_score_sql_entry(),
        "unigram_score_cap16": _unigram_score_sql_entry(vocab_cap=16),
        "tfidf_top_terms": _tfidf_sql_entry(),
        "bigram_score": _bigram_sql_entry(),
        "top_terms_lang": r"""
            WITH tok AS (SELECT lang,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                 FROM documents WHERE length(trim(text)) > 0),
            tf AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
                   FROM tok GROUP BY lang, token),
            r AS (SELECT lang, token, n, row_number()
                     OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
                  FROM tf)
            SELECT lang, token, n FROM r WHERE rk <= 5
        """,
        "pricing_summary": _pricing_sql_entry(),
        "forecast_revenue": _forecast_sql_entry(),
        "top_revenue_orders": _top_revenue_sql_entry(),
        "order_priority_counts": _order_priority_sql_entry(),
        "customer_order_dist": _customer_order_dist_sql_entry(),
        "regional_revenue": _regional_revenue_sql_entry(),
        "promo_revenue": _promo_revenue_sql_entry(),
        "length_quantiles": r"""
            WITH t AS (SELECT lang,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+'))
                END AS n
              FROM documents)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(quantile_disc(n, 0.25) AS BIGINT) AS p25,
                   CAST(quantile_disc(n, 0.5) AS BIGINT) AS p50,
                   CAST(quantile_disc(n, 0.75) AS BIGINT) AS p75
            FROM t GROUP BY lang
        """,
        "emb_dup_pairs": """
            SELECT a.vec_id AS u, b.vec_id AS v,
                   round(CAST(list_cosine_similarity(a.embedding, b.embedding)
                              AS DOUBLE), 3) AS cos_r3
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(CAST(list_cosine_similarity(a.embedding, b.embedding)
                             AS DOUBLE), 3) >= 0.3
        """,
        "ann_topk": """
            SELECT query_id, vec_id, cos_r3 FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                     round(CAST(list_cosine_similarity(a.embedding,
                           b.embedding) AS DOUBLE), 3) AS cos_r3,
                     row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY round(CAST(list_cosine_similarity(
                                a.embedding, b.embedding) AS DOUBLE), 3)
                                DESC, b.vec_id) AS rn
              FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
              WHERE a.vec_id < 10)
            WHERE rn <= 5
        """,
        "ann_close_pairs": """
            SELECT a.vec_id AS query_id, b.vec_id,
                   round(CAST(list_cosine_similarity(
                         a.embedding, b.embedding) AS DOUBLE), 3) AS cos_r3
            FROM embeddings a, embeddings b
            WHERE a.vec_id IN (0, 1, 2, 3, 4) AND b.vec_id != a.vec_id
              AND round(CAST(list_cosine_similarity(a.embedding, b.embedding)
                             AS DOUBLE), 3) >= 0.3
        """,
        "priority_dedup": _priority_dedup_sql_entry(),
        "normalized_exact_dedup": _normalized_exact_dedup_sql_entry(),
        "bbit_minhash_pairs": _bbit_minhash_pairs_sql_entry(),
        "ivfpq_topk": _ivfpq_topk_sql_entry(),
        "oph_signatures": _oph_signatures_sql_entry(),
    }
