"""Fused hashing stage == staged bags -> wmh -> bands path, row-set
identical (same kernels, same order)."""

import pandas as pd
import pytest


def test_fused_equals_staged(ray_session):
    import ray.data as rd
    from apollo_ray.config import DedupConfig
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.stages.bags import build_bags, collapse_exact
    from apollo_ray.stages.bands import explode_bands
    from apollo_ray.stages.extract import extract_docs
    from apollo_ray.stages.fused import fused_bands
    from apollo_ray.stages.wmh_stage import compute_signatures

    pages_t, _ = generate_pages(300)
    cfg = DedupConfig(feature_dim_log2=12)
    reps = collapse_exact(extract_docs(rd.from_arrow(pages_t), cfg)).materialize()

    staged = explode_bands(
        compute_signatures(build_bags(reps, cfg), cfg), cfg).to_pandas()
    fused = fused_bands(reps, cfg).to_pandas()

    key = ["band_id", "bucket", "doc_id"]
    a = staged.sort_values(key).reset_index(drop=True)
    b = fused.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key], b[key])
