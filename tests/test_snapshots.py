"""snapshot_diff: crawl-refresh diff semantics and DuckDB oracle
parity (latest-id-wins per side, text equality -> unchanged)."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray.data

from apollo_ray.functions.snapshots import snapshot_diff, snapshot_diff_sql


def _tab(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "page_key": pa.array([r[1] for r in rows], type=pa.int64()),
        "text": pa.array([r[2] for r in rows], type=pa.string()),
    })


def test_snapshot_diff_statuses(ray_session):
    old = _tab([(1, 10, "same"), (2, 20, "before"), (3, 30, "gone"),
                (4, 40, "v1"), (6, 40, "v2")])       # 40: latest=6 "v2"
    new = _tab([(11, 10, "same"), (12, 20, "after"), (14, 50, "fresh"),
                (15, 40, "v2")])
    out = (snapshot_diff(ray.data.from_arrow(old),
                         ray.data.from_arrow(new), num_partitions=4)
           .to_pandas().sort_values("page_key").reset_index(drop=True))
    st = dict(zip(out.page_key, out.status))
    assert st == {10: "unchanged", 20: "changed", 30: "removed",
                  40: "unchanged", 50: "added"}
    r30 = out[out.page_key == 30].iloc[0]
    assert r30.old_id == 3 and pd.isna(r30.new_id)
    r50 = out[out.page_key == 50].iloc[0]
    assert pd.isna(r50.old_id) and r50.new_id == 14
    # latest-id-wins: key 40 compares v2 (id 6) vs v2 (id 15)
    r40 = out[out.page_key == 40].iloc[0]
    assert r40.old_id == 6 and r40.new_id == 15


def test_snapshot_diff_matches_duckdb(ray_session):
    import numpy as np
    rng = np.random.default_rng(3)
    ids = np.arange(120)
    texts = ["doc %d" % (i % 37) for i in ids]       # planted dups
    docs = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts)})
    import pyarrow.compute as pc

    def keyed(parity):
        def f(batch):
            idc = batch.column("doc_id").cast(pa.int64())
            keep = pc.equal(pc.bit_wise_and(idc, pa.scalar(
                1, type=pa.int64())), pa.scalar(parity, type=pa.int64()))
            b = batch.filter(keep)
            k = pc.subtract(
                b.column("doc_id").cast(pa.int64()),
                pc.multiply(pc.divide(b.column("doc_id").cast(pa.int64()),
                                      pa.scalar(49, type=pa.int64())),
                            pa.scalar(49, type=pa.int64())))
            return b.append_column("page_key", k)
        return f

    ds = ray.data.from_arrow(docs).repartition(3)
    eng = (snapshot_diff(ds.map_batches(keyed(0), batch_format="pyarrow"),
                         ds.map_batches(keyed(1), batch_format="pyarrow"),
                         num_partitions=4)
           .to_pandas().sort_values("page_key").reset_index(drop=True))
    con = duckdb.connect(); con.register("documents", docs)
    ora = (con.sql(snapshot_diff_sql("doc_id % 2 = 0", "doc_id % 2 = 1",
                                     "doc_id % 49")).df()
           .sort_values("page_key").reset_index(drop=True))
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    # sides split by id parity and texts keyed off the id, so every
    # shared key compares two different texts: all 49 keys 'changed'
    # (the four-status variety is covered by the unit test above)
    assert set(eng.status) == {"changed"} and len(eng) == 49
