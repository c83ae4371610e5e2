"""OIDC/OAuth2 bearer-token validation — offline JWS verify.

The reference validates `Bearer` JWTs against the issuer's JWKS
(signature, ``exp``, ``iss``, optional ``aud``), then maps one
configurable claim to the username and another to role names — Beacon
still owns authorization (beacon-db/beacon-auth/src/oidc.rs:1-140,
beacon-server-config OidcConfig). This implementation does the same
verification OFFLINE from the RFCs:

  - RFC 7515 (JWS compact serialization): three base64url segments;
    signing input = ``header.payload``; signature verified against the
    JWK the header's ``kid`` names.
  - RFC 7517 (JWK): RSA keys as base64url ``n``/``e``; the JWKS is a
    local document (file path or dict) — the network fetch the
    reference does is a deployment concern, not a verification one, so
    a configured document keeps the whole path testable offline.
  - RS256/RS384/RS512 only (RSASSA-PKCS1-v1_5): ``pow(sig, e, n)`` and
    a constant-time compare against the EMSA-PKCS1-v1_5 encoding of the
    hash (DigestInfo DER prefixes below). ``none`` and HMAC algorithms
    are rejected outright — accepting an attacker-chosen symmetric alg
    against a public RSA key is the classic JWT confusion attack.

Claim checks: ``iss`` must equal the configured issuer; ``exp`` is
required and checked with leeway; ``nbf`` honored when present; ``aud``
(string or array) must contain the configured audience when one is set.
Username/roles resolve through dotted claim paths, arrays or
space-delimited strings for roles — same shapes the reference accepts.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import hmac
import json
import time
from dataclasses import dataclass, field

__all__ = ["OidcError", "Authenticated", "OidcValidator"]


class OidcError(Exception):
    """Token failed validation (never says which check, to the wire)."""


@dataclass
class Authenticated:
    username: str
    roles: list[str] = field(default_factory=list)


#: DER DigestInfo prefixes for EMSA-PKCS1-v1_5 (RFC 8017 §9.2 notes)
_DIGEST_INFO = {
    "RS256": (hashlib.sha256, bytes.fromhex(
        "3031300d060960864801650304020105000420")),
    "RS384": (hashlib.sha384, bytes.fromhex(
        "3041300d060960864801650304020205000430")),
    "RS512": (hashlib.sha512, bytes.fromhex(
        "3051300d060960864801650304020305000440")),
}


def _b64url(seg: str | bytes) -> bytes:
    if isinstance(seg, str):
        seg = seg.encode("ascii")
    pad = (-len(seg)) % 4
    try:
        return base64.urlsafe_b64decode(seg + b"=" * pad)
    except (binascii.Error, ValueError) as e:
        raise OidcError(f"bad base64url segment: {e}") from None


def _b64url_uint(seg: str) -> int:
    return int.from_bytes(_b64url(seg), "big")


def _claim_at(claims: dict, path: str):
    """Dotted claim path (``realm_access.roles``) → value or None."""
    cur = claims
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def _roles_from(value) -> list[str]:
    """Array of strings or one space-delimited string (both common)."""
    if isinstance(value, list):
        return [v for v in value if isinstance(v, str)]
    if isinstance(value, str):
        return value.split()
    return []


class OidcValidator:
    """Verify bearer JWTs against a configured issuer + local JWKS.

    ``jwks`` is the RFC 7517 document: a dict, a JSON string, or a path
    to a JSON file (re-read when the file's mtime changes — the offline
    analog of the reference's TTL-cached JWKS fetch)."""

    def __init__(
        self,
        issuer: str,
        jwks,
        audience: str | None = None,
        username_claim: str = "preferred_username",
        roles_claim: str = "realm_access.roles",
        leeway_seconds: float = 30.0,
    ):
        self.issuer = issuer
        self.audience = audience
        self.username_claim = username_claim
        self.roles_claim = roles_claim
        self.leeway = leeway_seconds
        self._jwks_path: str | None = None
        self._jwks_mtime: float | None = None
        if isinstance(jwks, dict):
            self._jwks = jwks
        elif isinstance(jwks, str) and jwks.lstrip().startswith("{"):
            self._jwks = json.loads(jwks)
        else:
            self._jwks_path = jwks
            self._jwks = self._load_jwks_file()

    def _load_jwks_file(self) -> dict:
        import os

        # stat BEFORE reading: a rotation landing between read and stat
        # would cache the OLD keys under the NEW mtime and never reload
        # (tokens signed by the new key would 401 forever); stat-first
        # at worst reloads once more on the next call
        mtime = os.path.getmtime(self._jwks_path)
        with open(self._jwks_path, "rb") as f:
            doc = json.load(f)
        self._jwks_mtime = mtime
        return doc

    def _keys(self) -> list[dict]:
        if self._jwks_path is not None:
            import os

            try:
                mtime = os.path.getmtime(self._jwks_path)
            except OSError:
                mtime = self._jwks_mtime
            if mtime != self._jwks_mtime:
                self._jwks = self._load_jwks_file()  # rotated keys
        keys = self._jwks.get("keys")
        if not isinstance(keys, list):
            raise OidcError("JWKS document has no 'keys' array")
        return keys

    def _key_for(self, kid: str) -> dict:
        for k in self._keys():
            if k.get("kid") == kid:
                if k.get("kty") != "RSA":
                    raise OidcError("matched JWK is not an RSA key")
                if k.get("use") not in (None, "sig"):
                    raise OidcError("matched JWK is not a signing key")
                return k
        raise OidcError("no signing key matches the token's kid")

    # ------------------------------------------------------------ verify

    def verify(self, token: str, now: float | None = None) -> Authenticated:
        """Full validation → the authenticated principal, or OidcError.

        EVERY failure mode surfaces as OidcError — the transports map it
        to a 401; any other exception type would escape their handler
        and turn a malformed token into a 500 (non-ascii segments,
        non-object header/payload JSON, wrong claim types)."""
        try:
            return self._verify(token, now)
        except OidcError:
            raise
        except Exception as e:  # malformed in a way the checks missed
            raise OidcError(
                f"malformed token ({type(e).__name__})") from None

    def _verify(self, token: str, now: float | None) -> Authenticated:
        parts = token.split(".")
        if len(parts) != 3:
            raise OidcError("not a JWS compact token")
        h64, p64, s64 = parts
        try:
            header = json.loads(_b64url(h64))
        except (json.JSONDecodeError, UnicodeDecodeError):
            raise OidcError("bad token header") from None
        alg = header.get("alg")
        if alg not in _DIGEST_INFO:
            # 'none' and HS* land here BY DESIGN (alg-confusion)
            raise OidcError(f"unsupported or forbidden alg {alg!r}")
        kid = header.get("kid")
        if not kid:
            raise OidcError("token is missing a key id (kid)")
        jwk = self._key_for(kid)
        if jwk.get("alg") not in (None, alg):
            raise OidcError("token alg does not match the key's alg")
        self._verify_rsa(jwk, alg, f"{h64}.{p64}".encode("ascii"),
                         _b64url(s64))

        try:
            claims = json.loads(_b64url(p64))
        except (json.JSONDecodeError, UnicodeDecodeError):
            raise OidcError("bad token payload") from None
        self._check_claims(claims, time.time() if now is None else now)

        username = _claim_at(claims, self.username_claim)
        if not isinstance(username, str) or not username:
            raise OidcError(
                f"token is missing the {self.username_claim!r} claim"
            )
        roles = _roles_from(_claim_at(claims, self.roles_claim))
        return Authenticated(username=username, roles=roles)

    def _verify_rsa(self, jwk: dict, alg: str, signing_input: bytes,
                    signature: bytes) -> None:
        hash_fn, prefix = _DIGEST_INFO[alg]
        try:
            n = _b64url_uint(jwk["n"])
            e = _b64url_uint(jwk["e"])
        except (KeyError, OidcError):
            raise OidcError("invalid RSA JWK (missing n/e)") from None
        k = (n.bit_length() + 7) // 8
        if len(signature) != k:
            raise OidcError("signature length does not match the modulus")
        s = int.from_bytes(signature, "big")
        if s >= n:
            raise OidcError("signature out of range")
        em = pow(s, e, n).to_bytes(k, "big")
        # EMSA-PKCS1-v1_5: 00 01 FF…FF 00 DigestInfo || H(m), with at
        # least 8 bytes of FF padding (RFC 8017 §9.2) — rebuild the whole
        # expected encoding and compare once, constant-time
        digest = hash_fn(signing_input).digest()
        t = prefix + digest
        ps_len = k - len(t) - 3
        if ps_len < 8:
            raise OidcError("modulus too small for this digest")
        expected = b"\x00\x01" + b"\xff" * ps_len + b"\x00" + t
        if not hmac.compare_digest(em, expected):
            raise OidcError("signature verification failed")

    def _check_claims(self, claims: dict, now: float) -> None:
        if claims.get("iss") != self.issuer:
            raise OidcError("issuer mismatch")
        exp = claims.get("exp")
        if not isinstance(exp, (int, float)):
            raise OidcError("token has no exp claim")
        if now > exp + self.leeway:
            raise OidcError("token expired")
        nbf = claims.get("nbf")
        if isinstance(nbf, (int, float)) and now < nbf - self.leeway:
            raise OidcError("token not yet valid")
        if self.audience is not None:
            aud = claims.get("aud")
            if isinstance(aud, str):
                ok = aud == self.audience
            elif isinstance(aud, list):
                ok = self.audience in aud
            else:
                ok = False
            if not ok:
                raise OidcError("audience mismatch")
