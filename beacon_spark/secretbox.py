"""Authenticated encryption for persisted credentials.

The reference stores credentials as ``EncryptedSecret`` values in its
database file (``beacon-db/beacon-sql-databases/src/secret.rs``); a
catalog.json with merely-obfuscated values would be plaintext for the
stated threat model ("anything with filesystem access to the lake
root"). This module provides a real secret box from public primitives
only:

  - **ChaCha20** stream cipher implemented from RFC 8439 §2.3-2.4
    (pure Python — secrets are tiny, throughput is irrelevant).
  - **Encrypt-then-MAC** with HMAC-SHA256 over ``nonce || ciphertext``
    using an independent MAC key (both subkeys derived from the master
    key with HMAC, an HKDF-expand-style split).

Key material comes from, in order:

  1. ``BEACON_SPARK_SECRET_KEY`` env var (passphrase, stretched with
     scrypt under a fixed versioned salt),
  2. the keyfile named by ``BEACON_SPARK_KEYFILE``,
  3. ``~/.beacon_spark/secret.key`` — auto-generated (32 random bytes,
     mode 0600) on first use.

The keyfile deliberately lives OUTSIDE the lake root: a reader with
access to the data directory alone cannot decrypt the catalog.

Wire format: ``enc:v1:`` + base64(nonce(12) || ciphertext || tag(32)).
``decrypt`` transparently accepts legacy bare-base64 values written by
older catalogs (and re-encrypts happen on the next write of the entry).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import secrets as _secrets
import struct

__all__ = ["SecretBox", "default_box", "chacha20_xor"]

_CACHED: "SecretBox | None" = None

_MAGIC = "enc:v1:"
_SCRYPT_SALT = b"beacon-spark-secret-v1"


# ------------------------------------------------------ ChaCha20 (RFC 8439)

def _quarter(s: list[int], a: int, b: int, c: int, d: int) -> None:
    M = 0xFFFFFFFF
    s[a] = (s[a] + s[b]) & M
    s[d] ^= s[a]
    s[d] = ((s[d] << 16) | (s[d] >> 16)) & M
    s[c] = (s[c] + s[d]) & M
    s[b] ^= s[c]
    s[b] = ((s[b] << 12) | (s[b] >> 20)) & M
    s[a] = (s[a] + s[b]) & M
    s[d] ^= s[a]
    s[d] = ((s[d] << 8) | (s[d] >> 24)) & M
    s[c] = (s[c] + s[d]) & M
    s[b] ^= s[c]
    s[b] = ((s[b] << 7) | (s[b] >> 25)) & M


def _block(key: bytes, counter: int, nonce: bytes) -> bytes:
    """One 64-byte ChaCha20 keystream block (RFC 8439 §2.3)."""
    state = (
        [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
        + list(struct.unpack("<8L", key))
        + [counter & 0xFFFFFFFF]
        + list(struct.unpack("<3L", nonce))
    )
    w = state[:]
    for _ in range(10):  # 20 rounds: 10 column+diagonal double-rounds
        _quarter(w, 0, 4, 8, 12)
        _quarter(w, 1, 5, 9, 13)
        _quarter(w, 2, 6, 10, 14)
        _quarter(w, 3, 7, 11, 15)
        _quarter(w, 0, 5, 10, 15)
        _quarter(w, 1, 6, 11, 12)
        _quarter(w, 2, 7, 8, 13)
        _quarter(w, 3, 4, 9, 14)
    return struct.pack(
        "<16L", *((a + b) & 0xFFFFFFFF for a, b in zip(w, state))
    )


def chacha20_xor(key: bytes, nonce: bytes, data: bytes,
                 counter: int = 1) -> bytes:
    """XOR ``data`` with the ChaCha20 keystream (encrypt == decrypt).

    Counter starts at 1 per RFC 8439 §2.4 (block 0 is reserved for the
    Poly1305 one-time key in AEAD constructions; we MAC with HMAC but
    keep the offset for test-vector compatibility).
    """
    if len(key) != 32 or len(nonce) != 12:
        raise ValueError("chacha20 needs a 32-byte key and 12-byte nonce")
    out = bytearray()
    for i in range(0, len(data), 64):
        ks = _block(key, counter + i // 64, nonce)
        chunk = data[i:i + 64]
        out += bytes(a ^ b for a, b in zip(chunk, ks))
    return bytes(out)


# ------------------------------------------------------------- secret box

class SecretBox:
    def __init__(self, master_key: bytes, fallback: "SecretBox | None" = None):
        if len(master_key) != 32:
            raise ValueError("master key must be 32 bytes")
        self._enc = hmac.new(master_key, b"beacon-spark-enc",
                             hashlib.sha256).digest()
        self._mac = hmac.new(master_key, b"beacon-spark-mac",
                             hashlib.sha256).digest()
        #: decrypt-only compatibility box (e.g. the legacy fixed-salt
        #: passphrase derivation) — encrypt always uses THIS box's key,
        #: so re-created secrets migrate to the new derivation
        self._fallback = fallback

    def encrypt(self, value: str) -> str:
        nonce = _secrets.token_bytes(12)
        ct = chacha20_xor(self._enc, nonce, value.encode())
        tag = hmac.new(self._mac, nonce + ct, hashlib.sha256).digest()
        return _MAGIC + base64.b64encode(nonce + ct + tag).decode()

    def decrypt(self, stored: str) -> str:
        """Decrypt an ``enc:v1:`` value. Legacy bare-base64 values from
        pre-encryption catalogs decode only when
        ``BEACON_SPARK_ALLOW_LEGACY_SECRETS=1``: accepting them silently
        would let anyone who can edit catalog.json DOWNGRADE a MAC'd
        secret to attacker-chosen plaintext (e.g. repoint a remote
        table's credentials), defeating the tamper check the enc:v1
        format exists to provide."""
        if not stored.startswith(_MAGIC):
            if os.environ.get("BEACON_SPARK_ALLOW_LEGACY_SECRETS") == "1":
                return base64.b64decode(stored).decode()
            raise ValueError(
                "unauthenticated legacy secret value refused (set "
                "BEACON_SPARK_ALLOW_LEGACY_SECRETS=1 to migrate an old "
                "catalog, then re-create the secret to re-encrypt it)"
            )
        blob = base64.b64decode(stored[len(_MAGIC):])
        if len(blob) < 12 + 32:
            raise ValueError("corrupt encrypted secret")
        nonce, ct, tag = blob[:12], blob[12:-32], blob[-32:]
        want = hmac.new(self._mac, nonce + ct, hashlib.sha256).digest()
        if not hmac.compare_digest(tag, want):
            if self._fallback is not None:
                return self._fallback.decrypt(stored)
            raise ValueError(
                "secret authentication failed: wrong key "
                "(BEACON_SPARK_SECRET_KEY / keyfile) or tampered catalog"
            )
        return chacha20_xor(self._enc, nonce, ct).decode()


def _key_from_env(passphrase: str, salt: bytes = _SCRYPT_SALT) -> bytes:
    return hashlib.scrypt(
        passphrase.encode(), salt=salt, n=2 ** 14, r=8, p=1,
        dklen=32,
    )


def _install_salt() -> bytes:
    """Per-install random scrypt salt (r6-verdict nit: a fixed versioned
    salt lets one rainbow table cover every deployment). Lives beside
    the keyfile (0600); created once, read forever. The fixed ``v1``
    salt survives only as a decrypt-time fallback so catalogs written
    before this change keep opening."""
    keyfile = os.environ.get("BEACON_SPARK_KEYFILE")
    d = (os.path.dirname(keyfile) or "." if keyfile
         else os.path.join(os.path.expanduser("~"), ".beacon_spark"))
    p = os.path.join(d, "secret.salt")
    if not os.path.exists(p):
        os.makedirs(d, exist_ok=True)
        try:
            fd = os.open(p, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
            try:
                os.write(fd, _secrets.token_bytes(16))
            finally:
                os.close(fd)
        except FileExistsError:
            pass  # another process won the race — read theirs
    return _read_fully(p, 16)


def default_box() -> SecretBox:
    """The process-default box; see module docstring for the key order.
    Cached after first resolution (key sources don't change mid-process;
    tests that swap ``BEACON_SPARK_KEYFILE`` reset ``_CACHED``)."""
    global _CACHED
    if _CACHED is not None:
        return _CACHED
    _CACHED = _resolve_box()
    return _CACHED


def _resolve_box() -> SecretBox:
    pw = os.environ.get("BEACON_SPARK_SECRET_KEY")
    if pw:
        # per-install random salt; legacy fixed-salt box kept as a
        # decrypt-only fallback for pre-existing catalogs
        return SecretBox(_key_from_env(pw, _install_salt()),
                         fallback=SecretBox(_key_from_env(pw)))
    path = os.environ.get("BEACON_SPARK_KEYFILE") or os.path.join(
        os.path.expanduser("~"), ".beacon_spark", "secret.key"
    )
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
            try:
                os.write(fd, _secrets.token_bytes(32))
            finally:
                os.close(fd)
        except FileExistsError:
            pass  # another process won the cold-start race — read theirs
    key = _read_fully(path, 32)
    return SecretBox(key[:32])


def _read_fully(path: str, want: int) -> bytes:
    """Read a just-created key/salt file, tolerating the racer that won
    O_EXCL still being between create and write — retry briefly on a
    short read instead of crashing engine init."""
    import time as _time

    for _ in range(100):
        with open(path, "rb") as f:
            data = f.read()
        if len(data) >= want:
            return data
        _time.sleep(0.01)
    raise ValueError(f"key file {path!r} must hold >= {want} bytes")
