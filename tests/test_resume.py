"""Checkpoint / resume test (SURVEY §5.5): delete a mid-stage
checkpoint, re-run, outputs identical; config change invalidates."""

import os
import shutil

import pytest


@pytest.fixture()
def ckpt(tmp_path):
    return str(tmp_path / "ckpt")


def _run(cfg, ckpt_root, n=300):
    import ray.data as rd
    from apollo_ray.fixtures import generate_pages
    from apollo_ray.pipelines.dedup import run_dedup
    pages_t, _ = generate_pages(n)
    out = run_dedup(rd.from_arrow(pages_t), cfg, ckpt_root=ckpt_root,
                    input_fingerprint="n=%d" % n)
    cl = out["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    return cl, out["metrics"]


def test_resume_identical(ckpt, ray_session):
    from apollo_ray.config import DedupConfig
    cfg = DedupConfig(feature_dim_log2=12)
    cl1, m1 = _run(cfg, ckpt)
    assert not any(k.endswith("_cached") for k in m1)
    # full re-run: everything cached
    cl2, m2 = _run(cfg, ckpt)
    assert m2.get("clusters_cached") is True
    assert cl1.equals(cl2)
    # delete a mid-stage checkpoint -> downstream recomputed, same output
    shutil.rmtree(os.path.join(ckpt, "bands"))
    cl3, m3 = _run(cfg, ckpt)
    assert "bands_sec" in m3 and m3.get("bags_cached") is True
    assert cl1.equals(cl3)


def test_config_change_invalidates(ckpt, ray_session):
    from apollo_ray.config import DedupConfig
    cfg = DedupConfig(feature_dim_log2=12)
    _run(cfg, ckpt)
    cl2, m2 = _run(cfg.with_(threshold=0.7), ckpt)
    # different config hash -> nothing reused
    assert not any(k.endswith("_cached") for k in m2)
