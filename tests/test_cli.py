"""Drive the CLI surface in-process (start → check → refresh → version)."""

from __future__ import annotations

import json

from meilisync_spark.cli import main
from tests.conftest import SF_SMOKE


def test_cli_start_check_refresh(spark, tmp_path, capsys):
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    rc = main([
        "start",
        "--events", f"{SF_SMOKE}/events.parquet",
        "--index", index,
        "--checkpoint", ckpt,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "backfill: loaded" in out and "sync complete" in out

    rc = main(["check", "--source", index, "--index", index, "--table", "users"])
    assert rc == 0
    assert "consistent" in capsys.readouterr().out

    cust_index = str(tmp_path / "cust")
    rc = main(["refresh", "--source", f"{SF_SMOKE}/customer.parquet", "--index", cust_index])
    assert rc == 0
    assert spark.read.parquet(cust_index).count() == 150

    # drifted check exits nonzero (the reference logs error per sync)
    rc = main(["check", "--source", f"{SF_SMOKE}/customer.parquet", "--index", index])
    assert rc == 1


def test_cli_version(capsys):
    assert main(["version"]) == 0
    assert "meilisync_spark" in json.loads(capsys.readouterr().out.strip())
