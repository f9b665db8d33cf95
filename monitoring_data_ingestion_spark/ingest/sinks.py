"""Publish sinks (SURVEY.md §2.1 S6-S12).

Atomic file publish (temp + rename, /root/reference/src/utility.js:94-103),
compressed JSON inventory (src/utility.js:89-92 — the reference *names*
`.br` outputs but never actually compresses; the engine implements the
evident intent, with gzip fallback when brotli isn't installed), heartbeat
(src/rabbit.js:14-16), merged inventory scan (src/rabbit.js:73-85), and the
HMAC-signed webhook notification (src/utility.js:144-163).

DataFrame outputs use `df.write.parquet` with overwrite semantics — Spark's
v2 file committer provides the same atomic-publish guarantee the reference
hand-rolls with rename.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
import urllib.request
from typing import Any

from ..functions.hashing import hmac_sha256_hex

try:  # brotli is optional in this environment
    import brotli  # type: ignore

    def _brotli(data: bytes) -> bytes:
        return brotli.compress(data, quality=11)

    BROTLI_AVAILABLE = True
except ImportError:  # pragma: no cover
    import gzip

    def _brotli(data: bytes) -> bytes:
        return gzip.compress(data, 9)

    BROTLI_AVAILABLE = False


def write_file_atomically(path: str, data: bytes) -> None:
    """Temp file + rename — readers never observe a torn file."""
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        finally:
            raise


def write_json_atomically(path: str, obj: Any, compress: bool = False) -> None:
    data = json.dumps(obj, indent=2, sort_keys=True).encode("utf-8")
    if compress:
        data = _brotli(data)
    write_file_atomically(path, data)


def write_heartbeat(root: str) -> None:
    """`heart.json` {last_beat: ISO} — written at every batch start."""
    from .state import utcnow_iso

    write_json_atomically(os.path.join(root, "heart.json"), {"last_beat": utcnow_iso()})


def publish_inventory(root: str, compress: bool = True) -> list[dict[str, Any]]:
    """Merge every `*/metadata.json` under root into one inventory array
    (S12, src/rabbit.js:73-85), dropping absent entries, and publish it as
    `inventory.json` (+ `.br`-style compressed twin)."""
    inventory: list[dict[str, Any]] = []
    for path in sorted(glob.glob(os.path.join(root, "*", "metadata.json"))):
        try:
            with open(path) as f:
                md = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if md:
            md = dict(md)
            md["path"] = os.path.relpath(os.path.dirname(path), root)
            inventory.append(md)
    write_json_atomically(os.path.join(root, "inventory.json"), inventory)
    if compress:
        write_json_atomically(os.path.join(root, "inventory.json.br"), inventory, compress=True)
    return inventory


def publish_state_summary(root: str) -> dict[str, Any]:
    """`state.json` — nested object of every JSON state file under root
    (S11, src/utility.js:56-69), excluding the summary itself."""
    summary: dict[str, Any] = {}
    for path in sorted(glob.glob(os.path.join(root, "**", "*.json"), recursive=True)):
        rel = os.path.relpath(path, root)
        if rel in ("state.json", "inventory.json", "inventory.json.br"):
            continue
        parts = rel[: -len(".json")].split(os.sep)
        try:
            with open(path) as f:
                obj = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        node = summary
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = obj
    write_json_atomically(os.path.join(root, "state.json"), summary)
    return summary


def send_ingest_command(
    endpoint: str, secret: str, payload: dict[str, Any], timeout: float = 30.0
) -> int:
    """Signed webhook notification to a downstream consumer (S9).

    The body is signed with HMAC-SHA256 in the `X-Gsky-Signature` header
    exactly as src/utility.js:144-163. Driver-side, post-commit — never in
    an executor path.
    """
    body = json.dumps(payload).encode("utf-8")
    req = urllib.request.Request(
        endpoint,
        data=body,
        headers={
            "Content-Type": "application/json",
            "X-Gsky-Signature": hmac_sha256_hex(body, secret),
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # pragma: no cover - needs server
        return resp.status
