"""The CLI pass: discovery -> load -> re-run no-op -> verify-oldest."""

from __future__ import annotations

import json

import pytest

from google_sheets_etl_spark.__main__ import main


@pytest.fixture()
def cli_env(tmp_path):
    sheets = {
        "ss-cli-1": {
            "name": "CLI People",
            "modifiedTime": "2026-02-01T00:00:00Z",
            "sheets": {"Sheet1": [["Name", "Age"], ["alice", "30"], ["bob"]]},
        }
    }
    config = {
        "$schema": "ignored",
        "ss-cli-1": {
            "Sheet1": {
                "targetTable": "cli_people",
                "columnMapping": {"person": "Name", "age": "Age"},
            }
        },
    }
    sheets_p = tmp_path / "sheets.json"
    config_p = tmp_path / "etl.json"
    sheets_p.write_text(json.dumps(sheets))
    config_p.write_text(json.dumps(config))
    return {
        "sheets": str(sheets_p),
        "config": str(config_p),
        "warehouse": str(tmp_path / "wh"),
    }


def run_cli(capsys, env, extra=()):
    rc = main([
        "--config", env["config"],
        "--warehouse", env["warehouse"],
        "--sheets", env["sheets"],
        *extra,
    ])
    assert rc == 0
    return [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]


def test_cli_full_pass_then_noop(spark, cli_env, capsys):
    out = run_cli(capsys, cli_env, ["--verify-oldest"])
    phases = {o["phase"] for o in out}
    assert phases == {"discovery", "load", "summary", "verify_oldest"}
    load = next(o for o in out if o["phase"] == "load")
    assert load["rows_loaded"] == 2 and not load["skipped_unchanged"]
    assert next(o for o in out if o["phase"] == "verify_oldest")["accessible"]

    # second pass: nothing changed -> change filter yields no jobs
    out2 = run_cli(capsys, cli_env)
    summary = next(o for o in out2 if o["phase"] == "summary")
    assert summary["jobs_loaded"] == 0 and summary["jobs_skipped_unchanged"] == 0
