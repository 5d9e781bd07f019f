"""CLI surface (reference script parity) + S6 JSON document source."""

import json

from image_indexing_and_retrival_with_qdrant_spark import cli
from image_indexing_and_retrival_with_qdrant_spark.sources.files import (
    read_json_documents,
)

# the reference's only checked-in input shape
# (with_jina_text_v4/sample_text_data.json:1-27)
_SAMPLE = [
    {"id": "doc1", "title": "Spark engines", "content": "distributed query engines run plans"},
    {"id": "doc2", "title": "Vector search", "content": "cosine similarity over embeddings"},
    {"id": "doc3", "title": "Streams", "content": "windowed aggregation with watermarks"},
]


def _write_sample(tmp_path):
    p = tmp_path / "sample_text_data.json"
    p.write_text(json.dumps(_SAMPLE))
    return str(p)


def test_read_json_documents(spark, tmp_path):
    df = read_json_documents(spark, _write_sample(tmp_path))
    rows = {r.id: r for r in df.collect()}
    assert set(rows) == {"doc1", "doc2", "doc3"}
    assert rows["doc2"].title == "Vector search"


def test_cli_index_query_stats_roundtrip(spark, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("ENGINE_EMBED_DIM", "8")
    root = str(tmp_path / "colls")
    sample = _write_sample(tmp_path)

    rc = cli.main(["index-docs", "--json", sample, "--collection", "txt",
                   "--root", root])
    assert rc == 0
    assert "3 points" in capsys.readouterr().out

    # merge mode: re-index is idempotent (no duplicate points)
    cli.main(["index-docs", "--json", sample, "--collection", "txt",
              "--root", root])
    assert "3 points" in capsys.readouterr().out

    # append mode: reference duplicate-on-rerun semantics
    cli.main(["index-docs", "--json", sample, "--collection", "txt",
              "--root", root, "--append"])
    assert "6 points" in capsys.readouterr().out

    rc = cli.main(["query", "cosine similarity search", "--collection", "txt",
                   "--root", root, "--top-k", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("score=") == 2

    rc = cli.main(["stats", "--collection", "txt", "--root", root])
    assert rc == 0
    assert "6 points" in capsys.readouterr().out


def test_cli_index_images_roundtrip(spark, tmp_path, monkeypatch, capsys):
    """Image-folder smoke (reference §3.1 surface): scan → hash-embed →
    upsert → query → stats, plus merge-refresh — re-indexing a
    *modified* file must update its point in place (ids key on
    full_path; Qdrant upsert overwrites by id)."""
    monkeypatch.setenv("ENGINE_EMBED_DIM", "8")
    root = str(tmp_path / "colls")
    imgroot = tmp_path / "imgs"
    (imgroot / "cats").mkdir(parents=True)
    (imgroot / "dogs").mkdir()
    (imgroot / "cats" / "a.png").write_bytes(b"\x89PNG-fake-a")
    (imgroot / "cats" / "b.jpg").write_bytes(b"\xff\xd8-fake-b")
    (imgroot / "dogs" / "c.jpeg").write_bytes(b"\xff\xd8-fake-c")
    (imgroot / "dogs" / "notes.txt").write_bytes(b"not an image")

    rc = cli.main(["index-images", "--folder", str(imgroot),
                   "--collection", "imgs", "--root", root])
    assert rc == 0
    assert "3 points" in capsys.readouterr().out  # .txt excluded

    rc = cli.main(["query", "fluffy cat", "--collection", "imgs",
                   "--root", root, "--top-k", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("score=") == 2

    # merge-refresh: grow a.png; its surrogate (filename:length) and
    # embedding change, the point count must not
    (imgroot / "cats" / "a.png").write_bytes(b"\x89PNG-fake-a-grown")
    cli.main(["index-images", "--folder", str(imgroot),
              "--collection", "imgs", "--root", root])
    assert "3 points" in capsys.readouterr().out

    rc = cli.main(["stats", "--collection", "imgs", "--root", root])
    assert rc == 0
    assert "3 points" in capsys.readouterr().out


def test_cli_query_missing_collection(tmp_path, capsys):
    rc = cli.main(["query", "x", "--collection", "nope",
                   "--root", str(tmp_path)])
    assert rc == 1
    assert "not found" in capsys.readouterr().err


def test_cli_facet_and_scroll(spark, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("ENGINE_EMBED_DIM", "8")
    root = str(tmp_path / "colls")
    sample = _write_sample(tmp_path)
    assert cli.main(["index-docs", "--json", sample, "--collection", "txt",
                     "--root", root]) == 0
    capsys.readouterr()

    rc = cli.main(["facet", "source_tag", "--collection", "txt",
                   "--root", root])
    out = capsys.readouterr().out
    assert rc == 0
    assert "document\t3" in out

    rc = cli.main(["scroll", "--limit", "2", "--collection", "txt",
                   "--root", root])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("{") == 2
    assert "embedding" not in out  # vectors projected away

    assert cli.main(["facet", "source_tag", "--collection", "nope",
                     "--root", root]) == 1


def test_cli_discover_and_matrix(spark, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("ENGINE_EMBED_DIM", "8")
    root = str(tmp_path / "colls")
    sample = _write_sample(tmp_path)
    assert cli.main(["index-docs", "--json", sample, "--collection", "txt",
                     "--root", root]) == 0
    capsys.readouterr()

    # point ids are content hashes (P1) — fetch them like a user would
    # (scroll/query output), keyed by the source_id payload
    from image_indexing_and_retrival_with_qdrant_spark.catalog import Collection
    pid = {r.source_id: r.id
           for r in Collection(root, "txt").read(spark).collect()}

    rc = cli.main(["discover", "--context", f"{pid['doc1']}:{pid['doc3']}",
                   "--target", pid["doc2"],
                   "--collection", "txt", "--root", root, "--top-k", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("score=") == 2 and "rank=" in out

    # context-only (no target): no rank column
    rc = cli.main(["discover", "--context", f"{pid['doc1']}:{pid['doc3']}",
                   "--collection", "txt", "--root", root, "--top-k", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("score=") == 2 and "rank=" not in out

    rc = cli.main(["matrix", "--sample", "3", "--top-k", "1",
                   "--collection", "txt", "--root", root])
    out = capsys.readouterr().out
    assert rc == 0
    assert len(out.strip().splitlines()) == 3  # 3 sampled x top-1

    assert cli.main(["discover", "--context", "badpair",
                     "--collection", "txt", "--root", root]) == 1


def test_cli_collections_and_drop(spark, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("ENGINE_EMBED_DIM", "8")
    root = str(tmp_path / "colls")
    sample = _write_sample(tmp_path)
    assert cli.main(["index-docs", "--json", sample, "--collection", "txt",
                     "--root", root]) == 0
    capsys.readouterr()  # drain index output
    rc = cli.main(["collections", "--root", root])
    assert rc == 0 and capsys.readouterr().out.split() == ["txt"]
    # refuses without --yes; collection survives
    rc = cli.main(["drop", "--collection", "txt", "--root", root])
    assert rc == 1 and "refusing" in capsys.readouterr().err
    rc = cli.main(["drop", "--collection", "txt", "--root", root, "--yes"])
    assert rc == 0 and "deleted txt" in capsys.readouterr().out
    rc = cli.main(["collections", "--root", root])
    assert rc == 0 and capsys.readouterr().out.strip() == ""
    rc = cli.main(["drop", "--collection", "txt", "--root", root, "--yes"])
    assert rc == 1
