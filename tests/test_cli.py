"""CLI surface (python -m engine ...): the ray-job-submit entrypoints,
driven in-process through engine.cli.main — build, query, stats,
delete, compact (+alias), merge."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def cli_idx(ray_session, tmp_path_factory):
    from engine.cli import main

    root = tmp_path_factory.mktemp("cli")
    idx = str(root / "idx")
    rc = main(["build", "/root/testdata/sf0.001", idx,
               "--from-documents", "--num-parts", "4"])
    assert rc == 0
    return {"root": root, "idx": idx}


def test_cli_query_and_stats(cli_idx, capsys):
    from engine.cli import main

    qfile = str(cli_idx["root"] / "q.jsonl")
    with open(qfile, "w") as f:
        f.write(json.dumps({"query_id": 1, "text": "data processing", "k": 5}) + "\n")
    out = str(cli_idx["root"] / "res.parquet")
    assert main(["query", cli_idx["idx"], qfile, "--k", "5", "--out", out]) == 0
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == 5
    assert main(["stats", cli_idx["idx"]]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["num_docs"] == 500


def test_cli_delete_and_compact_alias(cli_idx, capsys):
    from engine.cli import main
    from engine.maintenance import read_alias, read_tombstones

    idx = cli_idx["idx"]
    assert main(["delete", idx, "12345", "67890"]) == 0
    assert json.loads(capsys.readouterr().out)["tombstones"] == 2
    assert list(read_tombstones(idx)) == [12345, 67890]

    alias = str(cli_idx["root"] / "alias.json")
    # threshold not exceeded -> no-op, alias points at the original
    assert main(["compact", idx, "--max-generations", "4",
                 "--alias", alias]) == 0
    r = json.loads(capsys.readouterr().out)
    assert r["compacted"] is False and r["live"] == idx
    assert read_alias(alias) == idx

    # unconditional compact -> new dir, alias flipped, tombstones folded
    out = str(cli_idx["root"] / "idx2")
    assert main(["compact", idx, out, "--alias", alias]) == 0
    r = json.loads(capsys.readouterr().out)
    assert r["compacted"] is True and r["live"] == out
    assert read_alias(alias) == out
    assert not os.path.exists(os.path.join(out, "tombstones.parquet"))


def test_cli_alias(cli_idx, capsys):
    from engine.cli import main

    alias = str(cli_idx["root"] / "a2.json")
    assert main(["alias", alias, "--set", cli_idx["idx"]]) == 0
    assert json.loads(capsys.readouterr().out)["index_dir"] == cli_idx["idx"]
    assert main(["alias", alias]) == 0
    assert json.loads(capsys.readouterr().out)["index_dir"] == cli_idx["idx"]
