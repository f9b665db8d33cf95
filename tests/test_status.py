"""Freshness monitor (X4) against a synthetic output tree."""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

from monitoring_data_ingestion_spark.scripts.status import check_status, main


def _write(tmp_path, name, obj):
    (tmp_path / name).write_text(json.dumps(obj))


def test_all_fresh(tmp_path):
    now = datetime(2026, 8, 13, 12, 0, 0, tzinfo=timezone.utc)
    _write(tmp_path, "heart.json", {"last_beat": "2026-08-13T11:58:00.000Z"})
    _write(
        tmp_path,
        "era5monthly.json",
        {"date": "2020-01-01", "last_successful_update": "2026-08-13T06:00:00.000Z"},
    )
    report = check_status(str(tmp_path), now=now)
    assert not report["down"]
    assert {c["name"] for c in report["checks"]} == {"heartbeat", "era5monthly"}


def test_stale_heartbeat_and_source(tmp_path):
    now = datetime(2026, 8, 13, 12, 0, 0, tzinfo=timezone.utc)
    _write(tmp_path, "heart.json", {"last_beat": "2026-08-13T11:00:00.000Z"})
    old = (now - timedelta(hours=30)).strftime("%Y-%m-%dT%H:%M:%S.000Z")
    _write(tmp_path, "src.json", {"last_successful_update": old})
    report = check_status(str(tmp_path), now=now)
    assert report["down"]
    by_name = {c["name"]: c for c in report["checks"]}
    assert by_name["heartbeat"]["down"] and by_name["heartbeat"]["reason"] == "stale heartbeat"
    assert by_name["src"]["down"] and by_name["src"]["reason"] == "stale source"


def test_missing_heartbeat_and_never_succeeded(tmp_path):
    _write(tmp_path, "src.json", {"date": "2020-01-01"})
    report = check_status(str(tmp_path))
    by_name = {c["name"]: c for c in report["checks"]}
    assert by_name["heartbeat"]["down"] and "unreadable" in by_name["heartbeat"]["reason"]
    assert by_name["src"]["down"] and by_name["src"]["reason"] == "never succeeded"


def test_cli_exit_codes(tmp_path, capsys):
    _write(tmp_path, "heart.json", {"last_beat": "2000-01-01T00:00:00.000Z"})
    assert main([str(tmp_path)]) == 1
    fresh = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.000Z")
    _write(tmp_path, "heart.json", {"last_beat": fresh})
    assert main([str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert '"down"' in out
