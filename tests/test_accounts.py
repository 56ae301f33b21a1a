"""Dashboard accounts: PBKDF2 users, session cookies, tenant-scoped key
CRUD (reference web/src/lib/server/auth.ts + routes/api/auth,keys)."""

import json

import pytest

from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.server.accounts import AccountStore
from ucfp_tpu.server.app import ServerState, build_server
from ucfp_tpu.server.auth import StaticSingleKey
from ucfp_tpu.server.inputs_cache import InputsCache
from ucfp_tpu.server.keystore import PersistentKeyStore
from ucfp_tpu.server.ratelimit import NoopRateLimiter
from ucfp_tpu.server.usage import NoopUsageSink

from test_server import TOKEN, call, jbody


def make_app(tmp_path):
    state = ServerState(
        index=EmbeddedBackend(str(tmp_path / "db")),
        api_keys=StaticSingleKey(TOKEN),
        rate_limit=NoopRateLimiter(),
        usage=NoopUsageSink(),
        inputs=InputsCache(),
        keystore=PersistentKeyStore(str(tmp_path / "keys.json")),
        accounts=AccountStore(str(tmp_path / "accounts.json")),
    )
    return build_server(state, timeout_secs=120.0), state


def cookie_of(resp):
    raw = resp.headers["set-cookie"]
    assert raw.startswith("ucfp_session=")
    return raw.split(";", 1)[0].split("=", 1)[1]


class TestAccountStore:
    def test_signup_login_logout(self, tmp_path):
        st = AccountStore(str(tmp_path / "a.json"))
        s = st.signup("User@Example.com", "hunter2pass")
        assert s["tenant_id"] == 1
        assert st.resolve(s["token"])["email"] == "user@example.com"
        # second user gets the next tenant
        assert st.signup("b@x.co", "password!")["tenant_id"] == 2
        assert st.login("user@example.com", "wrong-password") is None
        s2 = st.login("user@example.com", "hunter2pass")
        assert s2["tenant_id"] == 1
        assert st.logout(s2["token"])
        assert st.resolve(s2["token"]) is None

    def test_validation_and_persistence(self, tmp_path):
        p = str(tmp_path / "a.json")
        st = AccountStore(p)
        with pytest.raises(ValueError):
            st.signup("not-an-email", "password!")
        with pytest.raises(ValueError):
            st.signup("a@b.co", "short")
        tok = st.signup("a@b.co", "password!")["token"]
        with pytest.raises(ValueError):
            st.signup("a@b.co", "password2!")  # duplicate
        # a fresh store (restart) still resolves the session
        st2 = AccountStore(p)
        assert st2.resolve(tok)["tenant_id"] == 1
        assert st2.login("a@b.co", "password!") is not None


class TestSessionRoutes:
    def test_signup_session_authenticates_scoped(self, tmp_path):
        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/auth/signup", token=None,
                 body=json.dumps({"email": "u@x.co", "password": "password!"}).encode())
        assert r.status == 201, r.body
        tid = jbody(r)["tenant_id"]
        ck = {"cookie": f"ucfp_session={cookie_of(r)}"}

        # session authenticates protected routes for its own tenant
        r = call(app, "GET", "/v1/auth/whoami", token=None, headers=ck)
        assert r.status == 200 and jbody(r)["tenant_id"] == tid
        r = call(app, "POST", f"/v1/ingest/text/{tid}/1", token=None, headers=ck,
                 body=json.dumps({"text": "hello session world"}).encode())
        assert r.status == 201, r.body
        # ...but not other tenants
        r = call(app, "POST", f"/v1/ingest/text/{tid + 1}/1", token=None,
                 headers=ck, body=json.dumps({"text": "x"}).encode())
        assert r.status == 403

        # duplicate signup -> 409; bad password -> 400; no cookie -> 401
        r = call(app, "POST", "/v1/auth/signup", token=None,
                 body=json.dumps({"email": "u@x.co", "password": "password!"}).encode())
        assert r.status == 409
        r = call(app, "POST", "/v1/auth/signup", token=None,
                 body=json.dumps({"email": "v@x.co", "password": "pw"}).encode())
        assert r.status == 400
        assert call(app, "GET", "/v1/auth/whoami", token=None).status == 401

    def test_login_logout_cycle(self, tmp_path):
        app, _ = make_app(tmp_path)
        call(app, "POST", "/v1/auth/signup", token=None,
             body=json.dumps({"email": "u@x.co", "password": "password!"}).encode())
        r = call(app, "POST", "/v1/auth/login", token=None,
                 body=json.dumps({"email": "u@x.co", "password": "nope-nope"}).encode())
        assert r.status == 401
        r = call(app, "POST", "/v1/auth/login", token=None,
                 body=json.dumps({"email": "u@x.co", "password": "password!"}).encode())
        assert r.status == 200
        ck = {"cookie": f"ucfp_session={cookie_of(r)}"}
        assert call(app, "GET", "/v1/auth/whoami", token=None, headers=ck).status == 200
        r = call(app, "POST", "/v1/auth/logout", token=None, headers=ck)
        assert r.status == 200 and "Max-Age=0" in r.headers["set-cookie"]
        assert call(app, "GET", "/v1/auth/whoami", token=None, headers=ck).status == 401

    def test_tenant_scoped_key_crud(self, tmp_path):
        app, _ = make_app(tmp_path)

        def session(email):
            r = call(app, "POST", "/v1/auth/signup", token=None,
                     body=json.dumps({"email": email, "password": "password!"}).encode())
            return jbody(r)["tenant_id"], {"cookie": f"ucfp_session={cookie_of(r)}"}

        tid_a, ck_a = session("a@x.co")
        tid_b, ck_b = session("b@x.co")

        # each user issues a key; tenant_id is implied by the session
        r = call(app, "POST", "/v1/admin/keys", token=None, headers=ck_a, body=b"{}")
        assert r.status == 201 and jbody(r)["tenant_id"] == tid_a
        key_a = jbody(r)["key_id"]
        # ...and may not mint for another tenant
        r = call(app, "POST", "/v1/admin/keys", token=None, headers=ck_a,
                 body=json.dumps({"tenant_id": tid_b}).encode())
        assert r.status == 403

        # list shows only own keys even if tenant_id query asks wider
        r = call(app, "GET", "/v1/admin/keys", token=None, headers=ck_b)
        assert jbody(r)["keys"] == []
        r = call(app, "GET", "/v1/admin/keys", token=None, headers=ck_a)
        assert [k["key_id"] for k in jbody(r)["keys"]] == [key_a]

        # B cannot revoke A's key (404, not 403 — no existence leak)
        r = call(app, "DELETE", f"/v1/admin/keys/{key_a}", token=None, headers=ck_b)
        assert r.status == 404
        r = call(app, "DELETE", f"/v1/admin/keys/{key_a}", token=None, headers=ck_a)
        assert r.status == 200

        # the service bearer still has full control
        r = call(app, "POST", "/v1/admin/keys",
                 body=json.dumps({"tenant_id": tid_b}).encode())
        assert r.status == 201


class TestSessionExpiry:
    def test_expired_session_rejected(self, tmp_path, monkeypatch):
        from ucfp_tpu.server import accounts as acc

        st = AccountStore(str(tmp_path / "a.json"))
        s = st.signup("u@x.co", "password!")
        assert st.resolve(s["token"]) is not None
        # jump past the TTL
        real_time = acc.time.time
        monkeypatch.setattr(acc.time, "time",
                            lambda: real_time() + acc.SESSION_TTL_SECS + 1)
        assert st.resolve(s["token"]) is None
        # purge was in-memory; a fresh login still works and persists
        monkeypatch.undo()
        assert st.login("u@x.co", "password!") is not None

    def test_session_store_overflow_clears(self, tmp_path, monkeypatch):
        from ucfp_tpu.server import accounts as acc

        monkeypatch.setattr(acc, "_MAX_SESSIONS", 4)
        st = AccountStore(str(tmp_path / "a.json"))
        first = st.signup("u@x.co", "password!")
        tokens = [st.login("u@x.co", "password!")["token"] for _ in range(4)]
        # the 4-session cap forced a clear; only the newest survives
        assert st.resolve(tokens[-1]) is not None
        assert st.resolve(first["token"]) is None


class TestReservedTenants:
    """Signup tenant assignment must skip ids that API keys already name
    (keys file / service bearer / issued keys): a collision would put two
    principals in one data namespace (query/delete each other's rows)."""

    def test_signup_skips_reserved_ids(self, tmp_path):
        reserved = {1, 2, 7}
        st = AccountStore(str(tmp_path / "a.json"),
                          reserved_tenants=lambda: tuple(reserved))
        assert st.signup("a@x.co", "password!")["tenant_id"] == 8
        # live closure: a key issued AFTER boot reserves its id too
        reserved.add(11)
        assert st.signup("b@x.co", "password!")["tenant_id"] == 12

    def test_known_tenant_ids_across_lookups(self, tmp_path):
        from ucfp_tpu.server.auth import (
            StaticMapKey,
            StaticSingleKey,
            WebhookKeyLookup,
            parse_keys_file,
        )
        from ucfp_tpu.server.keystore import CompositeKeyLookup

        single = StaticSingleKey("t", tenant_id=3)
        mapped = StaticMapKey(
            parse_keys_file('[keys.a]\ntoken = "x"\ntenant_id = 4\n')
        )
        ks = PersistentKeyStore(str(tmp_path / "k.json"))
        ks.issue(tenant_id=9)
        comp = CompositeKeyLookup(single, mapped, ks)
        assert set(comp.known_tenant_ids()) == {3, 4, 9}

        async def never(tok):
            return None

        # webhook lookups can't enumerate: they reserve nothing
        assert WebhookKeyLookup(never).known_tenant_ids() == ()

    def test_state_from_env_wires_reservation(self, tmp_path, monkeypatch):
        from ucfp_tpu.server.app import state_from_env

        monkeypatch.setenv("UCFP_TOKEN", "t")
        monkeypatch.setenv("UCFP_SHARD", "off")
        state = state_from_env(data_dir=str(tmp_path))
        try:
            state.keystore.issue(tenant_id=5)
            s = state.accounts.signup("u@x.co", "password!")
            assert s["tenant_id"] == 6  # not 1: ids 0 (bearer) + 5 taken
        finally:
            state.index.close()


class TestSnapshotDurability:
    def test_logout_persists_across_restart(self, tmp_path):
        p = str(tmp_path / "a.json")
        st = AccountStore(p)
        s = st.signup("a@b.co", "password!")
        assert st.logout(s["token"])
        st2 = AccountStore(p)
        assert st2.resolve(s["token"]) is None

    def test_stale_snapshot_write_cannot_regress_file(self, tmp_path):
        """Disk writes happen outside the store lock; the version counter
        must keep a delayed older snapshot from clobbering a newer one."""
        p = str(tmp_path / "a.json")
        st = AccountStore(p)
        st.signup("a@b.co", "password!")
        with st._lock:
            old = st._snapshot_locked()
        st.signup("b@b.co", "password!")  # newer snapshot reaches disk
        st._write_snapshot(old)  # the delayed stale write is a no-op
        st2 = AccountStore(p)
        assert st2.login("b@b.co", "password!") is not None
