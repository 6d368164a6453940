"""Incremental shard append (append_dedup): hashing only the new
shard then rebuilding edges/CC over the union must give EXACTLY the
clusters of a from-scratch run over the full corpus (cc_id = min
doc_id per component, so equality is well-defined)."""

import os

import pandas as pd
import pytest

from apollo_ray.config import DedupConfig
from apollo_ray.fixtures import generate_pages
from apollo_ray.pipelines.dedup import append_dedup, run_dedup

CFG = DedupConfig(feature_dim_log2=12)


def _split_pages(n=500, cut=350):
    import ray.data
    pages, _ = generate_pages(n)
    return (ray.data.from_arrow(pages.slice(0, cut)),
            ray.data.from_arrow(pages.slice(cut)),
            ray.data.from_arrow(pages))


def _clusters_df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_append_equals_full_run(ray_session, tmp_path):
    shard_a, shard_b, full = _split_pages()
    ckpt = str(tmp_path / "ckpt")
    run_dedup(shard_a, CFG, ckpt_root=ckpt, input_fingerprint="a",
              num_partitions=8)
    out = append_dedup(shard_b, CFG, ckpt_root=ckpt,
                       shard_fingerprint="b", num_partitions=8)
    got = _clusters_df(out["clusters"])
    want = _clusters_df(run_dedup(full, CFG, num_partitions=8)["clusters"])
    pd.testing.assert_frame_equal(got, want)
    assert out["metrics"]["shard_rows"] > 0

    # idempotent: same shard fp skips hashing, result unchanged
    out2 = append_dedup(shard_b, CFG, ckpt_root=ckpt,
                        shard_fingerprint="b", num_partitions=8)
    assert out2["metrics"].get("shard_cached")
    pd.testing.assert_frame_equal(_clusters_df(out2["clusters"]), want)
    # appended shard dirs exist in the stage layout
    assert os.path.isdir(os.path.join(ckpt, "bands", "shard-b"))


def test_append_guards(ray_session, tmp_path):
    shard_a, shard_b, _ = _split_pages(60, 40)
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(FileNotFoundError, match="base stage"):
        append_dedup(shard_b, CFG, ckpt_root=ckpt, shard_fingerprint="b")
    run_dedup(shard_a, CFG, ckpt_root=ckpt, input_fingerprint="a",
              num_partitions=4)
    with pytest.raises(ValueError, match="config hash"):
        append_dedup(shard_b, CFG.with_(threshold=0.5), ckpt_root=ckpt,
                     shard_fingerprint="b")
    with pytest.raises(ValueError, match="filesystem-safe"):
        append_dedup(shard_b, CFG, ckpt_root=ckpt,
                     shard_fingerprint="../evil")
    with pytest.raises(ValueError, match="verify"):
        append_dedup(shard_b, CFG.with_(verify=True), ckpt_root=ckpt,
                     shard_fingerprint="b")
