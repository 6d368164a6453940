"""Pipeline configuration.

Replaces apollo's per-command argparse flags (reference:
``apollo/__main__.py:41-207``) with one frozen dataclass shared by every
stage, so that a single config hash identifies a run for checkpoint
lineage.  Defaults mirror the reference where one exists:

- ``size=128``          -> ``apollo/__main__.py:52`` (``--size``)
- ``threshold=0.8``     -> ``apollo/__main__.py:161-163`` (``--threshold``)
- ``false_positive_weight=0.5`` / ``false_negative_weight=0.5``
                        -> ``apollo/__main__.py:56-63``
- seeded WMH params reused across runs -> ``doc/model/wmh.md:12-14``
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field, replace


@dataclass(frozen=True)
class DedupConfig:
    # --- feature extraction (webtext analog of apollo's UAST extractors) ---
    shingle_k: int = 5            # token k-shingles (analog of --uast2seq-seq-len)
    extra_shingle_ks: tuple = ()  # additional shingle families (the multi-extractor -f analog)
    family_weights: tuple = ()    # per-family weight multipliers (M7 --<ex>-weight); () => all 1.0
    feature_dim_log2: int = 16    # feature-hash into D = 2**k columns (vocab cap analog)
    tokenizer: str = "whitespace"  # "whitespace" | "bpe_ish" | "words"
    # (whitespace and bpe_ish run the vectorized batch path;
    #  words falls back per-doc — unicode \w is not byte-classable)
    weighting: str = "logtf"      # "logtf" | "tf" | "logtf_logidf" (idf needs docfreq pass)
    min_docfreq: int = 1          # drop features seen in fewer docs (--min-docfreq)
    vocabulary_size: int = 0      # keep only the top-N features by df (0 = all; --vocabulary-size analog)

    # --- Weighted MinHash (apollo `hash` command) ---
    size: int = 128               # samples per signature (--size)
    seed: int = 42                # WMH param seed (--seed; fixed => reusable params)
    # "weighted": Ioffe WMH over weighted bags (the reference's scheme);
    # "unweighted": classic k-permutation MinHash over the distinct
    # feature set (kernels/minhash.py) — binary Jaccard semantics,
    # compute-bound kernel (no param gather), the cheap web-dedup mode
    minhash_mode: str = "weighted"

    # --- LSH banding ---
    threshold: float = 0.8        # Jaccard similarity threshold (--threshold)
    false_positive_weight: float = 0.5
    false_negative_weight: float = 0.5
    band_mode: str = "optimal"    # "optimal" (reference fp/fn balance) | "recall" (catch >= recall_target at threshold)
    recall_target: float = 0.99   # per-pair catch floor for band_mode="recall"

    # --- skew / shuffle handling (no analog in the reference; SURVEY §4) ---
    # 1 = single-level bucket groupby (one exchange; per-partition
    # memory is N/P + the largest single bucket).  Set >= 8 for corpora
    # with boilerplate mega-buckets (a band value shared by ~10M+ docs):
    # the two-level salted scheme splits each bucket across `salt`
    # partitions and links the local minima in a second pass — capped
    # memory, but the rep-link exchange adds ~n_buckets rows, measured
    # ~2x the whole edges stage on skew-free webtext
    # (tools/exchange_microbench.py: 8.2s vs 5.0s at 2M rows/8 CPUs).
    bucket_salt: int = 1          # sub-buckets for the two-level salted bucket groupby
    max_bucket_pairs: int = 4096  # cap on pairwise verification work per bucket

    # --- verification (apollo query --precise, apollo/query.py:45-66) ---
    verify: bool = False          # exact weighted-Jaccard check on candidate edges

    # --- communities (apollo --algorithm, apollo/__main__.py:176-179) ---
    # 'walktrap' = the reference's default, via the built-in from-
    # scratch Pons-Latapy kernel (LPA fallback above its per-CC size
    # cap); 'label_propagation' = the O(E)-per-round scale kernel;
    # igraph names resolve by reflection when the library is present.
    community_algorithm: str = "walktrap"

    # --- execution ---
    batch_size: int = 512         # docs per map_batches batch in the WMH stage
    wmh_concurrency: int = 8      # actor-pool size for the hasher stage
    cc_max_rounds: int = 50       # safety cap on the CC fixpoint iteration

    # --- exact dedup (D2) ---
    collapse_exact: bool = True   # collapse byte-identical texts before hashing

    @property
    def feature_dim(self) -> int:
        return 1 << self.feature_dim_log2

    @property
    def needs_docfreq(self) -> bool:
        """True when a global document-frequency pass is required
        (idf weighting, a min-docfreq filter, or a vocabulary cap)."""
        return (self.weighting == "logtf_logidf" or self.min_docfreq > 1
                or self.vocabulary_size > 0)

    @property
    def bag_kwargs(self) -> dict:
        """Static doc_to_bag keyword arguments derived from the config."""
        return {
            "tokenizer": self.tokenizer,
            "weighting": self.weighting,
            "extra_ks": tuple(self.extra_shingle_ks),
            "family_weights": (tuple(self.family_weights)
                               if self.family_weights else None),
        }

    def config_hash(self) -> str:
        """Stable hash identifying this config for checkpoint lineage."""
        blob = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.blake2b(blob, digest_size=8).hexdigest()

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)
