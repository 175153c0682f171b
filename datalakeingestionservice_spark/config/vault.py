"""Vault-placeholder resolution for connection strings (SURVEY.md A20).

The reference expands ``{vault:secret/path}`` placeholders via HTTP vault
providers with a 5-minute cache (`ConnectionStringBuilder.cs:17-103`). The
engine keeps the same placeholder grammar and cache behavior behind a
pluggable provider callable; the HTTP clients themselves are out of engine
scope (secrets feed connector options, not Spark plans).
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable

VAULT_PATTERN = re.compile(r"\{vault:([^}]+)\}")

SecretProvider = Callable[[str], str]


class StaticSecretProvider:
    """Dict-backed provider (tests / local runs)."""

    def __init__(self, secrets: dict[str, str]):
        self._secrets = secrets

    def __call__(self, path: str) -> str:
        try:
            return self._secrets[path]
        except KeyError:
            raise KeyError(f"vault secret not found: {path}") from None


class CachingResolver:
    """TTL-cached placeholder resolver (reference caches 5 min,
    `ConnectionStringBuilder.cs:95-100`)."""

    def __init__(self, provider: SecretProvider, ttl_seconds: float = 300.0):
        self._provider = provider
        self._ttl = ttl_seconds
        self._cache: dict[str, tuple[float, str]] = {}

    def _secret(self, path: str) -> str:
        now = time.monotonic()
        hit = self._cache.get(path)
        if hit and now - hit[0] < self._ttl:
            return hit[1]
        value = self._provider(path)
        self._cache[path] = (now, value)
        return value

    def resolve(self, template: str) -> str:
        return VAULT_PATTERN.sub(lambda m: self._secret(m.group(1)), template)


def resolve_placeholders(template: str, provider: SecretProvider) -> str:
    """One-shot resolution without caching."""
    return VAULT_PATTERN.sub(lambda m: provider(m.group(1)), template)
