"""CLI surface test: run -> report -> query -> reset round trip."""

import json
import os

import pyarrow.parquet as pq
import pytest


def test_cli_round_trip(tmp_path, capsys, ray_session):
    from apollo_ray.cli import main
    from apollo_ray.fixtures import generate_pages

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pages_t, _ = generate_pages(200)
    pq.write_table(pages_t, str(pages_dir / "part-0.parquet"))
    ckpt = str(tmp_path / "ckpt")

    assert main(["run", "--input", str(pages_dir), "--ckpt", ckpt,
                 "--feature-dim-log2", "12"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == 200
    assert os.path.exists(os.path.join(ckpt, "clusters", "_SUCCESS.json"))

    # re-run: everything cached
    assert main(["run", "--input", str(pages_dir), "--ckpt", ckpt,
                 "--feature-dim-log2", "12"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["metrics"].get("clusters_cached") is True

    assert main(["report", "--ckpt", ckpt]) == 0
    rep = capsys.readouterr().out
    assert rep.startswith("# Duplicate clusters")

    probe = tmp_path / "probe.txt"
    probe.write_text(pages_t.column("text")[0].as_py())
    assert main(["query", "--ckpt", ckpt, "--file", str(probe),
                 "--feature-dim-log2", "12"]) == 0
    hits = json.loads(capsys.readouterr().out.strip())["similar"]
    assert len(hits) >= 1

    # batch probe join: parquet in, candidate-pairs parquet out
    probes = tmp_path / "probes.parquet"
    import pyarrow as pa
    pq.write_table(pa.table({
        "probe_id": pa.array([0, 1], type=pa.int64()),
        "text": pages_t.column("text").slice(0, 2)}), str(probes))
    assert main(["query", "--ckpt", ckpt, "--probes", str(probes),
                 "--output", str(tmp_path / "pairs"),
                 "--feature-dim-log2", "12"]) == 0
    qout = json.loads(capsys.readouterr().out.strip())
    assert qout["n_pairs"] >= 2       # each probe finds its own doc
    got = pq.read_table(str(tmp_path / "pairs"))
    assert set(got.column_names) == {"probe_id", "doc_id"}

    assert main(["reset", "--ckpt", ckpt, "--stages", "bands,edges"]) == 0
    capsys.readouterr()
    assert not os.path.exists(os.path.join(ckpt, "bands"))
    assert os.path.exists(os.path.join(ckpt, "clusters"))


def test_cli_curate(tmp_path, capsys, ray_session):
    from apollo_ray.cli import main
    from apollo_ray.fixtures import generate_pages

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pages_t, _ = generate_pages(150)
    pq.write_table(pages_t, str(pages_dir / "part-0.parquet"))
    out_dir = str(tmp_path / "curated")

    # fixture texts carry no terminal punctuation -> --no-clean
    assert main(["curate", "--input", str(pages_dir), "--output", out_dir,
                 "--feature-dim-log2", "12", "--min-tokens", "5",
                 "--no-clean"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < out["curated_docs"] < 150          # dups were collapsed
    import glob
    t = pq.read_table(glob.glob(os.path.join(out_dir, "*.parquet")))
    assert t.num_rows == out["curated_docs"]
    assert "text" in t.column_names


def test_cli_stats(tmp_path, capsys, ray_session):
    import pyarrow as pa
    from apollo_ray.cli import main
    d = tmp_path / "docs"
    d.mkdir()
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b c", "a b c", "d e"]),
        "lang": pa.array(["en", "en", "de"]),
        "source": pa.array(["s1", "s1", "s2"]),
        "n_chars": pa.array([5, 5, 3], type=pa.int64()),
    })
    pq.write_table(t, str(d / "part-0.parquet"))
    assert main(["stats", "--input", str(d)]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["n_docs"] == 3
    srcs = {r["source"]: r for r in out["sources"]}
    assert srcs["s1"]["dup_ppm"] == 500000
    assert srcs["s2"]["dup_ppm"] == 0
    assert {r["lang"] for r in out["langs"]} == {"en", "de"}
    assert sum(r["n_tokens"] for r in out["token_freq_log2_hist"]) == 5


def test_cli_evalcc(tmp_path, capsys, ray_session):
    """``evalcc`` renders the community fitness metrics of
    ``apollo/graph.py:349-377`` over a checkpointed ``run
    --communities``."""
    from apollo_ray.cli import main
    from apollo_ray.fixtures import generate_pages

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pages_t, _ = generate_pages(200)
    pq.write_table(pages_t, str(pages_dir / "part-0.parquet"))
    ckpt = str(tmp_path / "ckpt")

    assert main(["run", "--input", str(pages_dir), "--ckpt", ckpt,
                 "--feature-dim-log2", "12", "--communities"]) == 0
    capsys.readouterr()
    assert main(["evalcc", "--ckpt", ckpt,
                 "--feature-dim-log2", "12"]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["n_communities"] >= 1
    assert out["total_pairs"] >= out["total_misses"] >= 0
    assert 0.0 <= out["avg_normalized_misses"] <= 1.0
    # a missing communities ckpt is the documented clean error path
    assert main(["evalcc", "--ckpt", str(tmp_path / "nope")]) == 2


def test_cli_dumpcc(tmp_path, capsys, ray_session):
    """``dumpcc`` prints one line of space-joined member urls per CC
    (``apollo/graph.py:151-157`` parity)."""
    from apollo_ray.cli import main
    from apollo_ray.fixtures import generate_pages

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pages_t, _ = generate_pages(200)
    pq.write_table(pages_t, str(pages_dir / "part-0.parquet"))
    ckpt = str(tmp_path / "ckpt")
    assert main(["run", "--input", str(pages_dir), "--ckpt", ckpt,
                 "--feature-dim-log2", "12"]) == 0
    capsys.readouterr()
    assert main(["dumpcc", "--ckpt", ckpt]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) >= 1
    # every line is a CC: urls, space-joined
    n_urls = sum(len(l.split()) for l in lines)
    assert n_urls == 200


def test_cli_tokenizer_flag(tmp_path, capsys, ray_session):
    """--tokenizer bpe_ish flows into the config (distinct config
    hash -> fresh stages, not cache hits from a whitespace run) and
    the pipeline completes end-to-end."""
    from apollo_ray.cli import main
    from apollo_ray.fixtures import generate_pages

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pages_t, _ = generate_pages(120)
    pq.write_table(pages_t, str(pages_dir / "part-0.parquet"))
    ckpt = str(tmp_path / "ckpt")
    assert main(["run", "--input", str(pages_dir), "--ckpt", ckpt,
                 "--feature-dim-log2", "12"]) == 0
    capsys.readouterr()
    # different tokenizer => different config hash => stages rebuild
    assert main(["run", "--input", str(pages_dir), "--ckpt", ckpt,
                 "--feature-dim-log2", "12",
                 "--tokenizer", "bpe_ish"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == 120
    assert "clusters_cached" not in out["metrics"]
