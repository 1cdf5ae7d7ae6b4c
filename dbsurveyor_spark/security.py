"""Security surface: credential sanitization, sample redaction, encryption.

Parity targets (behavior only, re-implemented for a Spark pipeline):

- `dbsurveyor-core/src/security/connection.rs` — parse a database URL,
  split out credentials, reconstruct a loggable credential-free URL.
- `dbsurveyor-core/src/security/credentials.rs` — credential container
  that never exposes the password in repr/str/logs.
- `dbsurveyor/src/redaction/mod.rs` — sample-row redaction with four
  modes (none / minimal / balanced / conservative) driven by field-name
  patterns; conservative also keeps timestamp-looking strings.
- `dbsurveyor-core/src/security/encryption.rs` — AES-256-GCM with random
  96-bit nonce (the `cryptography` package is not in this container, so
  the cipher core is gated behind an import-try; the envelope format and
  key handling are real and tested against a deterministic stub cipher).

Redaction is exposed both as a plain-Python function (for exported sample
docs) and as a DataFrame transformation (`redact_dataframe`) so it scales
to full tables: column selection happens once on the driver, the rewrite
is a JVM-side `lit()` projection — no Python in the executor path.
"""

from __future__ import annotations

import json
import os
import secrets
from dataclasses import dataclass, field
from typing import Any
from urllib.parse import parse_qsl, unquote, urlsplit

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REDACTED_VALUE = "[REDACTED]"

# Field-name substrings per mode (reference: redaction/mod.rs:102-131).
MINIMAL_PATTERNS = (
    "password",
    "secret",
    "token",
    "api_key",
    "key",
    "private_key",
    "passwd",
)
BALANCED_PATTERNS = (
    "email",
    "ssn",
    "phone",
    "dob",
    "birth",
    "credit_card",
    "card_number",
    "cvv",
    "sin",
)
CONSERVATIVE_SAFE_FIELDS = (
    "id",
    "created_at",
    "updated_at",
    "timestamp",
    "date",
    "time",
)

REDACTION_MODES = ("none", "minimal", "balanced", "conservative")


# --------------------------------------------------------------- credentials


@dataclass
class Credentials:
    """Credential holder that never leaks the password through repr/str.

    Python has no reliable memory zeroing (the reference uses `zeroize`);
    the enforceable guarantees here are: password absent from repr, from
    ``safe_url`` output, and from anything this library logs or exports.
    """

    username: str
    _password: str | None = field(default=None, repr=False)

    def has_password(self) -> bool:
        return self._password is not None

    def password(self) -> str | None:
        """Explicit accessor — the only way to read the secret back."""
        return self._password

    def __repr__(self) -> str:  # defensive: never echo the secret
        return f"Credentials(username={self.username!r}, password={'***' if self.has_password() else None})"

    __str__ = __repr__


@dataclass
class ConnectionInfo:
    """Credential-free connection facts, safe to log/serialize.

    Mirrors security/connection.rs `ConnectionInfo` + `to_safe_string`.
    """

    scheme: str
    host: str
    port: int | None = None
    database: str | None = None
    query_params: list[tuple[str, str]] = field(default_factory=list)

    def to_safe_string(self) -> str:
        url = f"{self.scheme}://{self.host}"
        if self.port is not None:
            url += f":{self.port}"
        if self.database:
            url += f"/{self.database}"
        if self.query_params:
            url += "?" + "&".join(f"{k}={v}" for k, v in self.query_params)
        return url


def parse_connection_string(connection_string: str) -> tuple[ConnectionInfo, Credentials]:
    """Split a DB URL into loggable info + secured credentials.

    Raises ValueError on URLs without a host (reference behavior).
    Query-param values that look like secrets (password=..., sslpassword=...)
    are dropped from the safe params, not just the userinfo section.
    """
    parts = urlsplit(connection_string)
    if not parts.hostname:
        raise ValueError("Missing host in connection string")
    params = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not any(p in k.lower() for p in MINIMAL_PATTERNS)
    ]
    info = ConnectionInfo(
        scheme=parts.scheme,
        host=parts.hostname,
        port=parts.port,
        database=(parts.path or "").lstrip("/") or None,
        query_params=params,
    )
    # urlsplit does NOT percent-decode userinfo; credentials containing
    # @ : / % must be percent-encoded in the URL and decoded here, or the
    # JDBC driver receives the encoded form and authentication fails.
    creds = Credentials(
        unquote(parts.username) if parts.username else "",
        unquote(parts.password) if parts.password is not None else None,
    )
    return info, creds


def sanitize_connection_url(connection_string: str) -> str:
    """One-shot: URL in, credential-free URL out (for logs/exports)."""
    info, _ = parse_connection_string(connection_string)
    return info.to_safe_string()


# ----------------------------------------- sensitive-column detection

# Default column-name patterns (adapters/config/sampling.rs:110
# SamplingConfig::default — password/email/ssn, case-insensitive).
DEFAULT_SENSITIVE_PATTERNS: list[tuple[str, str]] = [
    (r"(?i)(password|passwd|pwd)", "Password field detected"),
    (r"(?i)(email|mail)", "Email field detected"),
    (r"(?i)(ssn|social_security)", "Social Security Number field detected"),
]


def compile_sensitive_patterns(
    patterns: list[tuple[str, str]],
) -> list[tuple["re.Pattern[str]", str]]:
    """(regex, description) pairs; invalid patterns are skipped rather than
    raising (sampling.rs:95 compile_sensitive_patterns — also removes any
    ReDoS risk from malformed user-supplied patterns)."""
    import re

    out = []
    for pattern, description in patterns:
        try:
            out.append((re.compile(pattern), description))
        except re.error:
            continue
    return out


def detect_sensitive_columns(
    tables: list[dict],
    patterns: list[tuple[str, str]] | None = None,
) -> list[str]:
    """Warnings for schema-document tables whose column NAMES match a
    sensitive pattern (the reference's warn_sensitive pass over collected
    columns). Purely metadata — no data is read."""
    compiled = compile_sensitive_patterns(
        DEFAULT_SENSITIVE_PATTERNS if patterns is None else patterns
    )
    warnings = []
    for t in tables:
        for c in t.get("columns", []):
            name = c.get("name") or ""
            for regex, description in compiled:
                if regex.search(name):
                    warnings.append(
                        f"sensitive column {t.get('name')}.{name}: {description}"
                    )
                    break
    return warnings


# ----------------------------------------------------------------- redaction


def _matches(key: str | None, patterns: tuple[str, ...]) -> bool:
    if key is None:
        return False
    k = key.lower()
    return any(p in k for p in patterns)


def _conservative_safe_key(key: str | None) -> bool:
    if key is None:
        return False
    k = key.lower()
    return k in CONSERVATIVE_SAFE_FIELDS or k.endswith("_id") or k.endswith("_at")


def _looks_like_timestamp(value: str) -> bool:
    # reference redaction/mod.rs:150 — deliberately loose heuristic.
    return "T" in value or "-" in value or ":" in value


def should_redact(key: str | None, value: str, mode: str) -> bool:
    if mode == "none":
        return False
    if mode == "minimal":
        return _matches(key, MINIMAL_PATTERNS)
    if mode == "balanced":
        return _matches(key, MINIMAL_PATTERNS) or _matches(key, BALANCED_PATTERNS)
    if mode == "conservative":
        return not _conservative_safe_key(key) and not _looks_like_timestamp(value)
    raise ValueError(f"unknown redaction mode {mode!r}; expected one of {REDACTION_MODES}")


def redact_value(value: Any, key: str | None, mode: str) -> Any:
    """Recursively redact a JSON-ish value (dict/list/str pass-through for
    numbers/bools/None — only strings are ever replaced, as in the reference)."""
    if isinstance(value, dict):
        return {k: redact_value(v, k, mode) for k, v in value.items()}
    if isinstance(value, list):
        return [redact_value(v, key, mode) for v in value]
    if isinstance(value, str):
        return REDACTED_VALUE if should_redact(key, value, mode) else value
    return value


def redact_rows(rows: list[dict[str, Any]], mode: str) -> list[dict[str, Any]]:
    return [redact_value(r, None, mode) for r in rows]


def redact_dataframe(df: DataFrame, mode: str) -> DataFrame:
    """Column-level redaction as a distributed projection.

    String columns whose NAME matches the mode's patterns are replaced with
    a literal; in conservative mode, unsafe string columns keep only
    timestamp-looking values. Non-string columns pass through (the
    reference only redacts strings). Pure JVM expressions — scales to any
    table size with zero Python per-row cost.
    """
    if mode == "none":
        return df
    cols = []
    for f_ in df.schema.fields:
        if not isinstance(f_.dataType, T.StringType):
            cols.append(F.col(f_.name))
            continue
        if mode in ("minimal", "balanced"):
            pats = MINIMAL_PATTERNS + (BALANCED_PATTERNS if mode == "balanced" else ())
            if _matches(f_.name, pats):
                cols.append(
                    F.when(F.col(f_.name).isNull(), None)
                    .otherwise(F.lit(REDACTED_VALUE))
                    .alias(f_.name)
                )
            else:
                cols.append(F.col(f_.name))
        elif mode == "conservative":
            if _conservative_safe_key(f_.name):
                cols.append(F.col(f_.name))
            else:
                ts_like = (
                    F.col(f_.name).contains("T")
                    | F.col(f_.name).contains("-")
                    | F.col(f_.name).contains(":")
                )
                cols.append(
                    F.when(F.col(f_.name).isNull() | ts_like, F.col(f_.name))
                    .otherwise(F.lit(REDACTED_VALUE))
                    .alias(f_.name)
                )
        else:
            raise ValueError(f"unknown redaction mode {mode!r}")
    return df.select(*cols)


# ---------------------------------------------------------------- encryption

NONCE_SIZE = 12  # 96-bit, NIST SP 800-38D (encryption.rs:47)
KEY_SIZE = 32  # AES-256 (encryption.rs:66)
SALT_SIZE = 16  # 128-bit KDF salt (encryption.rs:77)
ENVELOPE_MAGIC = b"DBSVY1"

try:  # cipher backend is optional in this container
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # type: ignore

    HAVE_AESGCM = True
except Exception:  # pragma: no cover - container has no `cryptography`
    AESGCM = None
    HAVE_AESGCM = False


def _derive_key(passphrase: str, salt: bytes) -> bytes:
    """Key derivation. The reference uses Argon2id (RFC 9106); neither
    argon2 nor cryptography's KDFs are available here, so the gated
    fallback is PBKDF2-HMAC-SHA256 from the stdlib — still a real KDF,
    with the same salt/key sizes. Swap for Argon2id where available."""
    import hashlib

    return hashlib.pbkdf2_hmac("sha256", passphrase.encode(), salt, 600_000, dklen=KEY_SIZE)


def encrypt_bytes(plaintext: bytes, passphrase: str) -> bytes:
    """AES-256-GCM envelope: magic || salt || nonce || ciphertext+tag.

    Fresh random nonce per call (no reuse). Raises NotImplementedError
    when the AES-GCM backend is missing — callers must treat encryption
    as unavailable rather than silently writing plaintext.
    """
    if not HAVE_AESGCM:
        raise NotImplementedError(
            "AES-GCM backend unavailable (install `cryptography`); refusing to write plaintext"
        )
    salt = secrets.token_bytes(SALT_SIZE)
    nonce = secrets.token_bytes(NONCE_SIZE)
    key = _derive_key(passphrase, salt)
    ct = AESGCM(key).encrypt(nonce, plaintext, ENVELOPE_MAGIC)
    return ENVELOPE_MAGIC + salt + nonce + ct


def decrypt_bytes(envelope: bytes, passphrase: str) -> bytes:
    if not HAVE_AESGCM:
        raise NotImplementedError("AES-GCM backend unavailable (install `cryptography`)")
    if envelope[: len(ENVELOPE_MAGIC)] != ENVELOPE_MAGIC:
        raise ValueError("not a dbsurveyor-spark encrypted envelope")
    off = len(ENVELOPE_MAGIC)
    salt = envelope[off : off + SALT_SIZE]
    nonce = envelope[off + SALT_SIZE : off + SALT_SIZE + NONCE_SIZE]
    ct = envelope[off + SALT_SIZE + NONCE_SIZE :]
    key = _derive_key(passphrase, salt)
    return AESGCM(key).decrypt(nonce, ct, ENVELOPE_MAGIC)


def write_encrypted_json(obj: Any, path: str, passphrase: str) -> None:
    payload = json.dumps(obj, default=str).encode()
    env = encrypt_bytes(payload, passphrase)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(env)
    os.replace(tmp, path)
