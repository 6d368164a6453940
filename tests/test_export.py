"""Hash-sharded training export: determinism, completeness, manifest
resume, per-shard read-back."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest


def _docs(n=500):
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["doc %d body" % i for i in range(n)]),
        "lang": pa.array([("en", "de")[i % 2] for i in range(n)]),
    })


def test_export_roundtrip_and_resume(ray_session, tmp_path):
    import ray.data
    from apollo_ray.pipelines.export import (export_shards, read_shard,
                                             shard_of)
    out = str(tmp_path / "shards")
    tab = _docs()
    man = export_shards(ray.data.from_arrow(tab), out, n_shards=4)
    assert man["rows"] == 500
    assert sum(man["per_shard"].values()) == 500
    assert set(man["per_shard"]) <= {"0", "1", "2", "3"}
    # every row is in exactly the shard shard_of says, nothing lost
    seen = []
    for s in range(4):
        df = read_shard(out, s).to_pandas()
        assert (shard_of(df["doc_id"].to_numpy(), 4) == s).all()
        seen.append(df["doc_id"].to_numpy())
    assert np.array_equal(np.sort(np.concatenate(seen)),
                          np.arange(500))
    # manifest hit: unchanged input is a no-op
    man2 = export_shards(ray.data.from_arrow(tab), out, n_shards=4)
    assert man2.get("cached") is True
    with open(os.path.join(out, "_MANIFEST.json")) as f:
        assert json.load(f)["rows"] == 500


def test_export_empty_and_validation(ray_session, tmp_path):
    import ray.data
    from apollo_ray.pipelines.export import export_shards
    tab = _docs(0)
    man = export_shards(ray.data.from_arrow(tab),
                        str(tmp_path / "e"), n_shards=2)
    assert man["rows"] == 0 and man["per_shard"] == {}
    with pytest.raises(ValueError):
        export_shards(ray.data.from_arrow(_docs(3)),
                      str(tmp_path / "bad"), n_shards=0)


def test_export_column_projection(ray_session, tmp_path):
    import ray.data
    from apollo_ray.pipelines.export import export_shards, read_shard
    out = str(tmp_path / "cols")
    export_shards(ray.data.from_arrow(_docs(50)), out, n_shards=2,
                  columns=["doc_id", "text"])
    df = read_shard(out, 0).to_pandas()
    assert set(df.columns) == {"doc_id", "text"}


def test_reshard_previous_export(ray_session, tmp_path):
    """Re-exporting a shard directory (stale `shard` column present)
    must drop the old assignment instead of colliding."""
    import ray.data
    from apollo_ray.pipelines.export import export_shards
    out1 = str(tmp_path / "one")
    export_shards(ray.data.from_arrow(_docs(100)), out1, n_shards=2)
    out2 = str(tmp_path / "two")
    man = export_shards(
        ray.data.read_parquet(os.path.join(out1, "shard=0")),
        out2, n_shards=3)
    assert man["rows"] == sum(man["per_shard"].values()) > 0


def test_pack_sequences(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.pipelines.export import pack_sequences
    # one shard so the packing math is deterministic to eyeball
    texts = ["a " * 100, "b " * 50, "", "c " * 10]
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([s.strip() for s in texts]),
    })
    df = pack_sequences(rd.from_arrow(t), seq_len=64, n_shards=1) \
        .to_pandas().set_index("doc_id").sort_index()
    # stream: doc0 tokens [0,100) -> seqs 0..1; doc1 [100,150) -> 1..2;
    # doc2 empty -> -1; doc3 [150,160) -> 2..2
    assert df.loc[0, ["first_seq", "last_seq"]].tolist() == [0, 1]
    assert df.loc[1, ["first_seq", "last_seq"]].tolist() == [1, 2]
    assert df.loc[2, ["first_seq", "last_seq"]].tolist() == [-1, -1]
    assert df.loc[3, ["first_seq", "last_seq"]].tolist() == [2, 2]
    assert (df["shard"] == 0).all()


def test_pack_sequences_shard_isolation(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.pipelines.export import pack_sequences
    t = pa.table({
        "doc_id": pa.array(range(40), type=pa.int64()),
        "text": pa.array(["w " * 10] * 40),
    })
    df = pack_sequences(rd.from_arrow(t), seq_len=16, n_shards=4) \
        .to_pandas()
    # each shard's stream starts at sequence 0 independently
    assert (df.groupby("shard")["first_seq"].min() == 0).all()
    # within a shard, sequences are monotone in doc_id
    for _, g in df.sort_values("doc_id").groupby("shard"):
        assert g["first_seq"].is_monotonic_increasing


def test_export_packed_round_trip(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from apollo_ray.pipelines.export import export_packed, pack_sequences

    texts = ["a b c d e f g h", "i j k", "", "l m n o p"]
    t = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": pa.array(texts),
    })
    out = str(tmp_path / "packed")
    man = export_packed(rd.from_arrow(t), out, seq_len=4, n_shards=1)
    # 16 tokens total -> 4 exact windows of 4
    assert man["n_sequences"] == 4
    got = pq.read_table(out).to_pandas().sort_values("seq_id")
    assert (got["token_ids"].map(len) == 4).all()
    # windows hold the doc_id-ordered stream: recompute expected ids
    from apollo_ray.hashing import hash_utf8
    stream = [hash_utf8(w) & 0xFFFFFFFF
              for txt in texts for w in txt.split()]
    flat = [tid for seq in got["token_ids"] for tid in seq]
    assert flat == stream[:16]

    # manifest agrees: doc 0 occupies seqs 0..1, doc 3 ends in seq 3
    mani = pack_sequences(rd.from_arrow(t), seq_len=4, n_shards=1) \
        .to_pandas().set_index("doc_id")
    assert mani.loc[0, ["first_seq", "last_seq"]].tolist() == [0, 1]
    assert mani.loc[3, "last_seq"] == 3


def test_export_packed_tail_dropped(tmp_path, ray_session):
    import pyarrow as pa
    import ray.data as rd
    from apollo_ray.pipelines.export import export_packed
    t = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array(["a b c d e"]),       # 5 tokens, seq_len 4
    })
    man = export_packed(rd.from_arrow(t), str(tmp_path / "p"),
                        seq_len=4, n_shards=1)
    assert man["n_sequences"] == 1             # tail token dropped
