"""Freshness/liveness monitor (X4: /root/reference/src/scripts/status.js).

Asserts the heartbeat is fresh (default 5 minutes, src/scripts/status.js:33)
and every source's `last_successful_update` is within its staleness
threshold; exits non-zero when anything is down — the contract a cron/alert
wrapper consumes. Pure driver-side file reads (no SparkSession needed);
the queryable twin over DataFrames is plans/timeseries.ts_freshness_check.

The reference quirk of reporting every non-zero exit as "timed out"
(src/rabbit-sanctuary.js:84-91) is NOT replicated: each failure here names
its own cause.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timezone

HEART_MAX_DELAY_S = 5 * 60  # src/scripts/status.js:33
SOURCE_MAX_DELAY_S = 18 * 3600  # upper bound of the 11-18h thresholds (:34-36)


def _parse_iso(s: str) -> datetime:
    return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(timezone.utc)


def _age_s(iso: str, now: datetime) -> float:
    return (now - _parse_iso(iso)).total_seconds()


def check_status(
    root: str,
    heart_max_delay_s: float = HEART_MAX_DELAY_S,
    source_max_delay_s: float = SOURCE_MAX_DELAY_S,
    now: datetime | None = None,
) -> dict:
    """Inspect an output root; returns {"down": bool, "checks": [...]}.

    Checks: heart.json recency; every top-level `{source}.json` state's
    last_successful_update recency. Missing/unparseable files are DOWN
    (absence of evidence is an outage, matching the reference's throw).
    """
    now = now or datetime.now(timezone.utc)
    checks: list[dict] = []

    heart_path = os.path.join(root, "heart.json")
    try:
        with open(heart_path) as f:
            beat = json.load(f)["last_beat"]
        age = _age_s(beat, now)
        checks.append(
            {
                "name": "heartbeat",
                "age_s": round(age, 1),
                "down": age > heart_max_delay_s,
                "reason": "stale heartbeat" if age > heart_max_delay_s else "",
            }
        )
    except (OSError, KeyError, ValueError) as exc:
        checks.append(
            {"name": "heartbeat", "age_s": None, "down": True, "reason": f"unreadable: {exc}"}
        )

    for entry in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        if not entry.endswith(".json") or entry in (
            "heart.json",
            "state.json",
            "inventory.json",
        ):
            continue
        name = entry[: -len(".json")]
        try:
            with open(os.path.join(root, entry)) as f:
                state = json.load(f)
            last = state.get("last_successful_update")
            if last is None:
                checks.append(
                    {"name": name, "age_s": None, "down": True, "reason": "never succeeded"}
                )
                continue
            age = _age_s(last, now)
            checks.append(
                {
                    "name": name,
                    "age_s": round(age, 1),
                    "down": age > source_max_delay_s,
                    "reason": "stale source" if age > source_max_delay_s else "",
                }
            )
        except (OSError, ValueError) as exc:
            checks.append(
                {"name": name, "age_s": None, "down": True, "reason": f"unreadable: {exc}"}
            )

    return {"down": any(c["down"] for c in checks), "checks": checks}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="engine output freshness monitor")
    ap.add_argument("root", help="output root (contains heart.json, {source}.json)")
    ap.add_argument("--heart-max-delay", type=float, default=HEART_MAX_DELAY_S)
    ap.add_argument("--source-max-delay", type=float, default=SOURCE_MAX_DELAY_S)
    args = ap.parse_args(argv)
    report = check_status(args.root, args.heart_max_delay, args.source_max_delay)
    print(json.dumps(report, indent=2))
    return 1 if report["down"] else 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
