"""Hashing surface (SURVEY.md §2.8 F18-F19).

Column-level hashing uses Spark built-ins (`md5`, `sha2`, `xxhash64`).
HMAC-SHA256 webhook signing (/root/reference/src/utility.js:144-149) is a
driver-side concern — stdlib ``hmac`` — because it signs one small request
body, never a column.
"""

from __future__ import annotations

import hashlib
import hmac


def hmac_sha256_hex(body: bytes | str, secret: bytes | str) -> str:
    """Hex HMAC-SHA256 of a payload — the webhook `X-Gsky-Signature`."""
    if isinstance(body, str):
        body = body.encode("utf-8")
    if isinstance(secret, str):
        secret = secret.encode("utf-8")
    return hmac.new(secret, body, hashlib.sha256).hexdigest()


def md5_hex(data: bytes | str) -> str:
    """Driver-side file/content MD5 (reference `hash_of_this_file`)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.md5(data).hexdigest()
