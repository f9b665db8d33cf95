"""Watermark / incremental-state bookkeeping (SURVEY.md §2.9 T1-T2).

Parity targets: the reference keeps per-source and per-dataset JSON state
files `{date, last_updated, normals, last_successful_update}` /
`{start, end, missing}` written atomically *after* outputs succeed
(/root/reference/src/rabbit.js:25-26,51-61, src/utility.js:94-103).

Here state is the same JSON shape (human-inspectable, tiny) persisted with
temp-file + rename atomicity. The cursor advances exactly one period per
successful batch (src/sources/era5monthly.js:38-41). At cluster scale the
same interface can back onto a Delta/parquet `_state` table — the commit
ordering (outputs first, then state) is what guarantees idempotent
reprocessing, not the storage format.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

from .sinks import write_json_atomically

EPOCH_DEFAULT = "1959-01-01T00:00:00Z"


def utcnow_iso() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"


@dataclass
class SourceState:
    """The `{date, last_updated, normals, last_successful_update}` record."""

    date: str | None = None
    last_updated: str | None = None
    normals: dict[str, Any] = field(default_factory=dict)
    last_successful_update: str | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any] | None) -> "SourceState":
        d = dict(d or {})
        return cls(
            date=d.pop("date", None),
            last_updated=d.pop("last_updated", None),
            normals=d.pop("normals", {}) or {},
            last_successful_update=d.pop("last_successful_update", None),
            extra=d,
        )

    def to_dict(self) -> dict[str, Any]:
        out = {
            "date": self.date,
            "last_updated": self.last_updated,
            "normals": self.normals,
            "last_successful_update": self.last_successful_update,
        }
        out.update(self.extra)
        return out


class StateStore:
    """Per-source + per-dataset state files under a root directory.

    Layout (mirrors the reference's output tree, src/rabbit.js:32-49):
        {root}/{source}.json                 — source state
        {root}/{dataset}/state.json          — dataset state {start,end,missing}
        {root}/{dataset}/metadata.json       — published dataset metadata
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- source state ------------------------------------------------------
    def source_path(self, source: str) -> str:
        return os.path.join(self.root, f"{source}.json")

    def load_source(self, source: str) -> SourceState:
        try:
            with open(self.source_path(source)) as f:
                return SourceState.from_dict(json.load(f))
        except FileNotFoundError:
            return SourceState()

    def commit_source(self, source: str, state: SourceState) -> None:
        """Commit state — call ONLY after all batch outputs are published
        (the reference's ordering, src/rabbit.js:51-61)."""
        state.last_successful_update = utcnow_iso()
        write_json_atomically(self.source_path(source), state.to_dict())

    # -- dataset state -----------------------------------------------------
    def dataset_dir(self, dataset: str) -> str:
        d = os.path.join(self.root, dataset)
        os.makedirs(d, exist_ok=True)
        return d

    def load_dataset(self, dataset: str) -> dict[str, Any]:
        try:
            with open(os.path.join(self.dataset_dir(dataset), "state.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"start": None, "end": None, "missing": None}

    def commit_dataset(self, dataset: str, state: dict[str, Any]) -> None:
        write_json_atomically(os.path.join(self.dataset_dir(dataset), "state.json"), state)

    def write_dataset_metadata(self, dataset: str, metadata: dict[str, Any]) -> None:
        write_json_atomically(os.path.join(self.dataset_dir(dataset), "metadata.json"), metadata)


def typical_metadata(
    dataset: dict[str, Any], dt_iso: str, prior: dict[str, Any]
) -> dict[str, Any]:
    """Min/max range accumulation across runs (A3,
    /root/reference/src/utility.js:135-142): start = min(start, dt),
    end = max(end, dt), `missing` flag preserved."""
    start = prior.get("start")
    end = prior.get("end")
    return {
        "name": dataset["name"],
        "start": dt_iso if start is None or dt_iso < start else start,
        "end": dt_iso if end is None or dt_iso > end else end,
        "missing": prior.get("missing"),
        "unit": dataset.get("unit"),
        "originalUnit": dataset.get("original_unit"),
        "interval": dataset.get("interval", "monthly-aggregate"),
    }
