"""Encrypted credential storage (secretbox.py; the reference persists
EncryptedSecret values, beacon-db/beacon-sql-databases/src/secret.rs).
The round-5 review found base64-only storage was plaintext for the
stated threat model — these tests pin real encryption at rest."""

import base64
import json
import os

import pytest

from beacon_spark.secretbox import SecretBox, chacha20_xor, default_box


def test_chacha20_rfc8439_vector():
    """RFC 8439 §2.4.2 — the from-spec cipher matches the published
    test vector byte-for-byte."""
    key = bytes(range(32))
    nonce = bytes.fromhex("000000000000004a00000000")
    pt = (
        b"Ladies and Gentlemen of the class of '99: If I could offer you "
        b"only one tip for the future, sunscreen would be it."
    )
    ct = chacha20_xor(key, nonce, pt, counter=1)
    assert ct == bytes.fromhex(
        "6e2e359a2568f98041ba0728dd0d6981e97e7aec1d4360c20a27afccfd9fae0b"
        "f91b65c5524733ab8f593dabcd62b3571639d624e65152ab8f530c359f0861d8"
        "07ca0dbf500d6a6156a38e088a22b65e52bc514d16ccf806818ce91ab7793736"
        "5af90bbf74a35be6b40b8eedf2785e42874d"
    )
    # decrypt = encrypt (stream cipher)
    assert chacha20_xor(key, nonce, ct, counter=1) == pt


def test_box_roundtrip_and_nondeterminism():
    box = SecretBox(b"k" * 32)
    e1, e2 = box.encrypt("hunter2"), box.encrypt("hunter2")
    assert e1.startswith("enc:v1:") and e2.startswith("enc:v1:")
    assert e1 != e2  # fresh nonce per encryption
    assert box.decrypt(e1) == box.decrypt(e2) == "hunter2"
    assert "hunter2" not in e1


def test_wrong_key_and_tamper_rejected():
    box = SecretBox(b"k" * 32)
    e = box.encrypt("tok")
    with pytest.raises(ValueError, match="authentication failed"):
        SecretBox(b"x" * 32).decrypt(e)
    blob = bytearray(base64.b64decode(e[len("enc:v1:"):]))
    blob[14] ^= 0x01  # flip a ciphertext bit
    tampered = "enc:v1:" + base64.b64encode(bytes(blob)).decode()
    with pytest.raises(ValueError, match="authentication failed"):
        box.decrypt(tampered)


def test_legacy_base64_values_gated(monkeypatch):
    """Catalogs written before encryption hold bare base64 — decrypt
    refuses them by default (a lake-root writer could DOWNGRADE a MAC'd
    secret to attacker plaintext otherwise) and accepts them only under
    the explicit migration flag."""
    import pytest as _p

    box = SecretBox(b"k" * 32)
    legacy = base64.b64encode(b"old-password").decode()
    monkeypatch.delenv("BEACON_SPARK_ALLOW_LEGACY_SECRETS", raising=False)
    with _p.raises(ValueError, match="legacy secret"):
        box.decrypt(legacy)
    monkeypatch.setenv("BEACON_SPARK_ALLOW_LEGACY_SECRETS", "1")
    assert box.decrypt(legacy) == "old-password"


def test_default_box_keyfile_created_0600(tmp_path, monkeypatch):
    import beacon_spark.secretbox as sb

    monkeypatch.delenv("BEACON_SPARK_SECRET_KEY", raising=False)
    monkeypatch.setenv("BEACON_SPARK_KEYFILE", str(tmp_path / "k.key"))
    monkeypatch.setattr(sb, "_CACHED", None)
    box = default_box()
    mode = os.stat(tmp_path / "k.key").st_mode & 0o777
    assert mode == 0o600
    # same keyfile → same key → decryptable across "processes"
    monkeypatch.setattr(sb, "_CACHED", None)
    assert default_box().decrypt(box.encrypt("v")) == "v"
    monkeypatch.setattr(sb, "_CACHED", None)


def test_env_passphrase_wins_over_keyfile(tmp_path, monkeypatch):
    import beacon_spark.secretbox as sb

    monkeypatch.setenv("BEACON_SPARK_SECRET_KEY", "correct horse")
    monkeypatch.setattr(sb, "_CACHED", None)
    b1 = default_box()
    monkeypatch.setattr(sb, "_CACHED", None)
    e = b1.encrypt("s")
    assert default_box().decrypt(e) == "s"  # scrypt is deterministic
    monkeypatch.setenv("BEACON_SPARK_SECRET_KEY", "wrong phrase")
    monkeypatch.setattr(sb, "_CACHED", None)
    with pytest.raises(ValueError):
        default_box().decrypt(e)
    monkeypatch.setattr(sb, "_CACHED", None)


def test_persistent_secret_encrypted_at_rest(spark, tmp_path):
    """CREATE PERSISTENT SECRET writes no recoverable plaintext into
    catalog.json — neither the raw value nor its base64 spelling."""
    from beacon_spark.engine import Engine

    eng = Engine(spark, datasets_root=str(tmp_path))
    eng.sql(
        "CREATE PERSISTENT SECRET s3c (TYPE s3, KEY_ID 'AKIAEXAMPLE', "
        "SECRET 'supersecretvalue', SCOPE 's3://bucket')"
    )
    raw = (tmp_path / ".beacon_catalog" / "catalog.json").read_text()
    assert "supersecretvalue" not in raw
    assert base64.b64encode(b"supersecretvalue").decode() not in raw
    stored = json.loads(raw)["secrets"]["s3c"]["options"]["secret"]
    assert stored.startswith("enc:v1:")
    # a fresh Engine on the same root decrypts and re-applies it
    eng2 = Engine(spark, datasets_root=str(tmp_path))
    rows = eng2.sql("SHOW SECRETS").collect()
    names = {r.name for r in rows}
    assert "s3c" in names
    # SHOW SECRETS never prints values
    assert all("supersecret" not in str(r) for r in rows)


def test_env_passphrase_uses_per_install_salt(tmp_path, monkeypatch):
    """r6-verdict nit: the passphrase derivation salts with a random
    per-install value (created 0600 beside the keyfile), so one rainbow
    table can't cover every deployment; fixed-salt ciphertexts from
    older catalogs still decrypt through the fallback box."""
    import beacon_spark.secretbox as sb

    monkeypatch.setenv("BEACON_SPARK_SECRET_KEY", "correct horse")
    monkeypatch.setenv("BEACON_SPARK_KEYFILE", str(tmp_path / "k.key"))
    monkeypatch.setattr(sb, "_CACHED", None)
    b1 = sb.default_box()
    salt_file = tmp_path / "secret.salt"
    assert salt_file.exists()
    assert (os.stat(salt_file).st_mode & 0o777) == 0o600
    salt = salt_file.read_bytes()
    assert len(salt) >= 16 and salt != sb._SCRYPT_SALT
    e = b1.encrypt("s3")
    monkeypatch.setattr(sb, "_CACHED", None)
    assert sb.default_box().decrypt(e) == "s3"  # stable across processes
    # a legacy fixed-salt ciphertext decrypts via the fallback...
    legacy_box = sb.SecretBox(sb._key_from_env("correct horse"))
    monkeypatch.setattr(sb, "_CACHED", None)
    assert sb.default_box().decrypt(legacy_box.encrypt("old")) == "old"
    # ...but a different install (different salt) cannot read ours
    salt_file.write_bytes(b"x" * 16)
    monkeypatch.setattr(sb, "_CACHED", None)
    with pytest.raises(ValueError):
        sb.default_box().decrypt(e)
    monkeypatch.setattr(sb, "_CACHED", None)
