"""Offline OIDC bearer-JWT validation (server/oidc.py; reference:
beacon-db/beacon-auth/src/oidc.rs:1-140 + beacon-server-config
OidcConfig). Keys are generated locally; nothing touches the network —
the verification math itself is RFC 7515/8017 pure Python."""

import base64
import json
import time

import pytest

from beacon_spark.server.oidc import Authenticated, OidcError, OidcValidator

cryptography = pytest.importorskip("cryptography")

from cryptography.hazmat.primitives import hashes  # noqa: E402
from cryptography.hazmat.primitives.asymmetric import padding, rsa  # noqa: E402

ISS = "https://idp.example.test/realms/lake"
AUD = "beacon-api"


def _b64u(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _uint_b64(i: int) -> str:
    return _b64u(i.to_bytes((i.bit_length() + 7) // 8, "big"))


@pytest.fixture(scope="module")
def keypair():
    priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    other = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    return priv, other


@pytest.fixture(scope="module")
def jwks(keypair):
    priv, _other = keypair
    nums = priv.public_key().public_numbers()
    return {
        "keys": [
            {"kty": "RSA", "kid": "k1", "use": "sig", "alg": "RS256",
             "n": _uint_b64(nums.n), "e": _uint_b64(nums.e)},
            {"kty": "oct", "kid": "sym1", "k": _b64u(b"secret")},
        ]
    }


def mint(priv, claims, kid="k1", alg="RS256", drop_kid=False):
    header = {"alg": alg, "typ": "JWT"}
    if not drop_kid:
        header["kid"] = kid
    h = _b64u(json.dumps(header).encode())
    p = _b64u(json.dumps(claims).encode())
    si = f"{h}.{p}".encode()
    if alg == "HS256":
        import hashlib
        import hmac as _hmac

        sig = _hmac.new(b"whatever", si, hashlib.sha256).digest()
    else:
        sig = priv.sign(si, padding.PKCS1v15(), hashes.SHA256())
    return f"{h}.{p}.{_b64u(sig)}"


def _claims(**over):
    base = {
        "iss": ISS, "aud": AUD, "exp": time.time() + 600,
        "preferred_username": "alice",
        "realm_access": {"roles": ["readers", "writers"]},
    }
    base.update(over)
    return base


@pytest.fixture(scope="module")
def validator(jwks):
    return OidcValidator(issuer=ISS, jwks=jwks, audience=AUD)


def test_valid_token_resolves_principal(keypair, validator):
    priv, _ = keypair
    out = validator.verify(mint(priv, _claims()))
    assert out == Authenticated(username="alice",
                                roles=["readers", "writers"])


def test_space_delimited_roles_and_custom_claims(keypair, jwks):
    priv, _ = keypair
    v = OidcValidator(issuer=ISS, jwks=jwks, audience=None,
                      username_claim="sub", roles_claim="scope")
    out = v.verify(mint(priv, _claims(sub="svc-1", scope="a b c")))
    assert out.username == "svc-1" and out.roles == ["a", "b", "c"]


def test_wrong_key_refused(keypair, validator):
    _, other = keypair
    with pytest.raises(OidcError, match="signature"):
        validator.verify(mint(other, _claims()))


def test_tampered_payload_refused(keypair, validator):
    priv, _ = keypair
    tok = mint(priv, _claims())
    h, p, s = tok.split(".")
    evil = _b64u(json.dumps(_claims(preferred_username="mallory")).encode())
    with pytest.raises(OidcError):
        validator.verify(f"{h}.{evil}.{s}")


def test_temporal_claims(keypair, validator):
    priv, _ = keypair
    with pytest.raises(OidcError, match="expired"):
        validator.verify(mint(priv, _claims(exp=time.time() - 120)))
    # inside leeway: fine
    validator.verify(mint(priv, _claims(exp=time.time() - 10)))
    with pytest.raises(OidcError, match="no exp"):
        validator.verify(mint(priv, _claims(exp=None)))
    with pytest.raises(OidcError, match="not yet valid"):
        validator.verify(mint(priv, _claims(nbf=time.time() + 600)))


def test_issuer_and_audience(keypair, jwks):
    priv, _ = keypair
    v = OidcValidator(issuer=ISS, jwks=jwks, audience=AUD)
    with pytest.raises(OidcError, match="issuer"):
        v.verify(mint(priv, _claims(iss="https://evil.test")))
    with pytest.raises(OidcError, match="audience"):
        v.verify(mint(priv, _claims(aud="other-api")))
    # aud may be a list containing the expected audience
    v.verify(mint(priv, _claims(aud=["x", AUD])))
    # no audience configured → aud not checked
    OidcValidator(issuer=ISS, jwks=jwks).verify(
        mint(priv, _claims(aud="other-api")))


def test_alg_confusion_rejected(keypair, validator):
    """HS256 'signed' with public material and alg=none are refused
    outright — never verified against the RSA key."""
    priv, _ = keypair
    with pytest.raises(OidcError, match="alg"):
        validator.verify(mint(priv, _claims(), alg="HS256"))
    h = _b64u(json.dumps({"alg": "none", "kid": "k1"}).encode())
    p = _b64u(json.dumps(_claims()).encode())
    with pytest.raises(OidcError, match="alg"):
        validator.verify(f"{h}.{p}.")


def test_kid_handling(keypair, validator):
    priv, _ = keypair
    with pytest.raises(OidcError, match="kid"):
        validator.verify(mint(priv, _claims(), drop_kid=True))
    with pytest.raises(OidcError, match="no signing key"):
        validator.verify(mint(priv, _claims(), kid="unknown"))
    # the symmetric JWK can never satisfy an RS256 token
    with pytest.raises(OidcError, match="not an RSA key"):
        validator.verify(mint(priv, _claims(), kid="sym1"))


def test_jwks_file_reload(keypair, jwks, tmp_path):
    """A rotated JWKS file is picked up (the offline analog of the
    reference's TTL-cached re-fetch)."""
    import os

    priv, other = keypair
    p = str(tmp_path / "jwks.json")
    with open(p, "w") as f:
        json.dump(jwks, f)
    v = OidcValidator(issuer=ISS, jwks=p, audience=AUD)
    v.verify(mint(priv, _claims()))
    nums = other.public_key().public_numbers()
    rotated = {"keys": [{"kty": "RSA", "kid": "k1", "use": "sig",
                         "n": _uint_b64(nums.n), "e": _uint_b64(nums.e)}]}
    with open(p, "w") as f:
        json.dump(rotated, f)
    os.utime(p, (time.time() + 5, time.time() + 5))
    with pytest.raises(OidcError, match="signature"):
        v.verify(mint(priv, _claims()))  # old key no longer in the set
    v.verify(mint(other, _claims()))


# ------------------------------------------------------------ transport


@pytest.fixture()
def oidc_http(spark, tmp_path, keypair, jwks):
    import os

    from beacon_spark.engine import Engine
    from beacon_spark.server.http import BeaconHttpServer

    root = str(tmp_path / "oidcroot")
    os.makedirs(root)
    eng = Engine(spark, datasets_root=root)
    eng.sql("CREATE TABLE pub AS SELECT id FROM range(5)")
    eng.sql("CREATE TABLE sec AS SELECT id FROM range(5)")
    eng.sql("CREATE ROLE readers")
    eng.sql("GRANT SELECT ON TABLE pub TO ROLE readers")
    eng.sql("SET AUTH ENFORCEMENT ON")
    v = OidcValidator(issuer=ISS, jwks=jwks, audience=AUD)
    hs = BeaconHttpServer(eng, port=0, oidc=v)
    port = hs.serve_background()
    yield eng, f"http://127.0.0.1:{port}"
    hs.shutdown()


def _post(base, obj, token=None):
    import urllib.request

    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(f"{base}/api/query",
                                 data=json.dumps(obj).encode(),
                                 headers=headers, method="POST")
    return urllib.request.urlopen(req)


def test_http_oidc_external_principal(oidc_http, keypair):
    """A verified token's roles ride the LOCAL grant model: granted
    table readable, ungranted denied, DDL refused (external principals
    are never super-users), garbage tokens 401."""
    import urllib.error

    _eng, base = oidc_http
    priv, _ = keypair
    tok = mint(priv, _claims())

    with _post(base, {"sql": "SELECT count(*) AS c FROM pub",
                      "format": "json"}, tok) as r:
        assert json.loads(r.read())[0]["c"] == 5
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, {"sql": "SELECT * FROM sec", "format": "json"}, tok)
    assert ei.value.code in (400, 403)
    assert b"permission denied" in ei.value.read()
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, {"sql": "CREATE TABLE t2 AS SELECT 1 AS x"}, tok)
    assert ei.value.code in (400, 403)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, {"sql": "SELECT 1"}, "garbage.token.here")
    assert ei.value.code == 401


def test_flight_oidc_external_principal(spark, tmp_path, keypair, jwks):
    import os

    import pyarrow.flight as fl

    from beacon_spark.engine import Engine
    from beacon_spark.server.flight import BeaconFlightServer

    root = str(tmp_path / "oidcfl")
    os.makedirs(root)
    eng = Engine(spark, datasets_root=root)
    eng.sql("CREATE TABLE fpub AS SELECT id FROM range(3)")
    eng.sql("CREATE ROLE readers")
    eng.sql("GRANT SELECT ON TABLE fpub TO ROLE readers")
    eng.sql("SET AUTH ENFORCEMENT ON")
    v = OidcValidator(issuer=ISS, jwks=jwks, audience=AUD)
    server = BeaconFlightServer(eng, port=0, oidc=v)
    port = server.serve_background()
    try:
        priv, _ = keypair
        client = fl.FlightClient(f"grpc://127.0.0.1:{port}")
        opts = fl.FlightCallOptions(headers=[
            (b"authorization", f"Bearer {mint(priv, _claims())}".encode())])
        out = client.do_get(
            fl.Ticket(json.dumps({"sql": "SELECT count(*) AS c FROM fpub"})
                      .encode()), options=opts).read_all()
        assert out.column("c").to_pylist() == [3]
        bad = fl.FlightCallOptions(headers=[
            (b"authorization", b"Bearer not.a.jwt")])
        with pytest.raises(fl.FlightUnauthenticatedError):
            client.do_get(fl.Ticket(json.dumps({"sql": "SELECT 1"}).encode()),
                          options=bad).read_all()
    finally:
        server.shutdown()


def test_token_username_collision_never_inherits_local_privileges(
        oidc_http, keypair):
    """code-review r7 finding: a token whose username claim collides
    with a LOCAL super-user must not inherit that user's directory
    privileges — external principals resolve from token roles only."""
    import urllib.error

    eng, base = oidc_http
    priv, _ = keypair
    eng.sql("CREATE USER boss WITH PASSWORD 'pw' SUPERUSER")
    # IdP-signed token claiming to be 'boss', with NO roles
    tok = mint(priv, _claims(preferred_username="boss",
                             realm_access={"roles": []}))
    # DDL refused: the external 'boss' is not a super-user
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, {"sql": "CREATE TABLE boom AS SELECT 1 AS x"}, tok)
    assert ei.value.code in (400, 403)
    # and with enforcement on + no roles, the granted table is refused too
    with pytest.raises(urllib.error.HTTPError):
        _post(base, {"sql": "SELECT * FROM pub", "format": "json"}, tok)
    # the real boss over HTTP Basic still has directory privileges
    import base64 as _b64
    import urllib.request

    req = urllib.request.Request(
        f"{base}/api/query",
        data=json.dumps({"sql": "SELECT count(*) AS c FROM sec",
                         "format": "json"}).encode(),
        headers={"Content-Type": "application/json",
                 "Authorization": "Basic "
                 + _b64.b64encode(b"boss:pw").decode()},
        method="POST")
    assert json.loads(urllib.request.urlopen(req).read())[0]["c"] == 5


def test_malformed_tokens_always_401(oidc_http, validator):
    """code-review r7 finding: malformed tokens (non-ascii segments,
    non-object header JSON) must map to OidcError → 401, never a 500."""
    import urllib.error

    _eng, base = oidc_http
    for bad in ("é.x.y", "W10.W10.AA", "..", "a.b.c"):
        with pytest.raises(OidcError):
            validator.verify(bad)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, {"sql": "SELECT 1"}, bad)
        assert ei.value.code == 401, bad


def test_reference_claim_vectors():
    """VERDICT r7 item 5: pin claim-path/role-extraction parity against
    the EXACT vectors in the reference's oidc.rs unit tests
    (beacon-db/beacon-auth/src/oidc.rs:180-240) — dotted paths, arrays
    vs space-delimited strings, non-object descent, ill-typed claims."""
    from beacon_spark.server.oidc import _claim_at, _roles_from

    claims = {
        "preferred_username": "alice",
        "realm_access": {"roles": ["reader", "writer"]},
    }
    assert _claim_at(claims, "preferred_username") == "alice"
    assert _roles_from(_claim_at(claims, "realm_access.roles")) == \
        ["reader", "writer"]
    assert _claim_at(claims, "missing.path") is None
    # array / space-delimited / ill-typed
    assert _roles_from(["a", "b"]) == ["a", "b"]
    assert _roles_from("a b c") == ["a", "b", "c"]
    assert _roles_from(42) == []
    # descent through a scalar / an array / trailing empty segment
    c2 = {"user": "alice", "roles": ["reader"]}
    assert _claim_at(c2, "user.name") is None
    assert _claim_at(c2, "roles.reader") is None
    assert _claim_at(c2, "user.") is None
    # absent or ill-typed roles claim → zero privileges, never an error
    assert _claim_at({"preferred_username": "alice"},
                     "realm_access.roles") is None
    assert _roles_from({"nested": "obj"}) == []
    assert _roles_from(None) == []
    # non-string array elements skipped, not stringified
    assert _roles_from(["reader", 7, "writer"]) == ["reader", "writer"]
    # whitespace runs collapse
    assert _roles_from("  reader   writer ") == ["reader", "writer"]


def test_groups_claim_azp_and_aud_array_token_shape(keypair, jwks):
    """Tokens shaped like common IdP output (groups claim at the top
    level, azp present, aud as an ARRAY) resolve the principal and the
    roles end-to-end — the reference validates aud membership the same
    way (jsonwebtoken set_audience) and maps any configured claim."""
    priv, _ = keypair
    v = OidcValidator(issuer=ISS, jwks=jwks, audience=AUD,
                      username_claim="sub", roles_claim="groups")
    tok = mint(priv, {
        "iss": ISS, "aud": [AUD, "account"], "azp": "beacon-console",
        "exp": time.time() + 600, "sub": "svc-reader",
        "groups": ["lake-readers", "lake-admins"],
    })
    out = v.verify(tok)
    assert out == Authenticated(username="svc-reader",
                                roles=["lake-readers", "lake-admins"])
    # same shape but the audience list misses ours → refused
    bad = mint(priv, {
        "iss": ISS, "aud": ["account"], "azp": "beacon-console",
        "exp": time.time() + 600, "sub": "svc-reader", "groups": [],
    })
    with pytest.raises(OidcError):
        v.verify(bad)
    # scope-style space-delimited roles claim
    v2 = OidcValidator(issuer=ISS, jwks=jwks, audience=None,
                       username_claim="sub", roles_claim="scope")
    tok2 = mint(priv, {"iss": ISS, "exp": time.time() + 600,
                       "sub": "bob", "scope": "read write admin"})
    assert v2.verify(tok2).roles == ["read", "write", "admin"]


def test_admin_api_refuses_external_principal_name_collision(
        oidc_http, keypair):
    """Round-8 transport review: the ADMIN router must resolve identities
    via _resolve_ident too — an IdP token whose username collides with a
    local super-user must NOT reach /api/admin/*."""
    import urllib.error
    import urllib.request

    eng, base = oidc_http
    priv, _ = keypair
    eng.sql("CREATE USER chief WITH PASSWORD 'pw' SUPERUSER")
    tok = mint(priv, _claims(preferred_username="chief",
                             realm_access={"roles": ["readers"]}))
    req = urllib.request.Request(
        f"{base}/api/admin/auth/users",
        headers={"Authorization": f"Bearer {tok}"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 403
    # the real directory super-user over Basic still passes
    import base64 as _b64

    req = urllib.request.Request(
        f"{base}/api/admin/auth/users",
        headers={"Authorization": "Basic "
                 + _b64.b64encode(b"chief:pw").decode()})
    assert urllib.request.urlopen(req).status == 200
