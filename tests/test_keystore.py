"""API-key issuance/revocation: keystore unit + admin route integration."""

import asyncio
import json

import pytest

from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.server.app import ServerState, build_server
from ucfp_tpu.server.auth import StaticSingleKey
from ucfp_tpu.server.inputs_cache import InputsCache
from ucfp_tpu.server.keystore import CompositeKeyLookup, PersistentKeyStore
from ucfp_tpu.server.ratelimit import NoopRateLimiter
from ucfp_tpu.server.usage import NoopUsageSink

from test_server import TOKEN, call, jbody


def run(coro):
    return asyncio.run(coro)


def make_app_with_keystore(tmp_path):
    ks = PersistentKeyStore(str(tmp_path / "keys.json"))
    static = StaticSingleKey(TOKEN)
    state = ServerState(
        index=EmbeddedBackend(str(tmp_path / "db")),
        api_keys=CompositeKeyLookup(static, ks),
        rate_limit=NoopRateLimiter(),
        usage=NoopUsageSink(),
        inputs=InputsCache(),
        keystore=ks,
    )
    return build_server(state, timeout_secs=120.0), ks


class TestKeystore:
    def test_issue_lookup_revoke(self, tmp_path):
        ks = PersistentKeyStore(str(tmp_path / "k.json"))
        issued = ks.issue(7, "mykey")
        assert issued["token"].startswith("ucfp_")
        ctx = run(ks.lookup(issued["token"]))
        assert ctx.tenant_id == 7 and ctx.key_id == "mykey"
        assert ks.revoke("mykey")
        assert run(ks.lookup(issued["token"])) is None
        assert not ks.revoke("mykey")

    def test_persists_across_reopen(self, tmp_path):
        p = str(tmp_path / "k.json")
        tok = PersistentKeyStore(p).issue(3)["token"]
        ks2 = PersistentKeyStore(p)
        assert run(ks2.lookup(tok)).tenant_id == 3

    def test_file_stores_digests_not_tokens(self, tmp_path):
        p = tmp_path / "k.json"
        tok = PersistentKeyStore(str(p)).issue(1)["token"]
        assert tok not in p.read_text()


class TestAdminRoutes:
    def test_key_lifecycle_over_http(self, tmp_path):
        app, ks = make_app_with_keystore(tmp_path)
        issued = jbody(call(app, "POST", "/v1/admin/keys",
                            json.dumps({"tenant_id": 5, "key_id": "alpha"}).encode()))
        assert issued["tenant_id"] == 5
        # the issued key works for its own tenant...
        assert call(app, "POST", "/v1/ingest/text/5/1", b"hello issued key",
                    token=issued["token"]).status == 201
        # ...but not for others
        assert call(app, "POST", "/v1/ingest/text/6/1", b"nope",
                    token=issued["token"]).status == 403
        # list + revoke via service bearer
        keys = jbody(call(app, "GET", "/v1/admin/keys"))["keys"]
        assert any(k["key_id"] == "alpha" for k in keys)
        assert call(app, "DELETE", "/v1/admin/keys/alpha").status == 200
        assert call(app, "POST", "/v1/ingest/text/5/2", b"x",
                    token=issued["token"]).status == 401

    def test_admin_usage_tail(self, tmp_path, monkeypatch):
        import asyncio
        import os

        from ucfp_tpu.server.usage import LogUsageSink

        log = tmp_path / "usage.ndjson"
        monkeypatch.setenv("UCFP_USAGE_LOG_PATH", str(log))
        from ucfp_tpu.index.embedded import EmbeddedBackend
        from ucfp_tpu.server.app import ServerState, build_server
        from ucfp_tpu.server.inputs_cache import InputsCache
        from ucfp_tpu.server.ratelimit import NoopRateLimiter

        state = ServerState(
            index=EmbeddedBackend(str(tmp_path / "db")),
            api_keys=StaticSingleKey(TOKEN),
            rate_limit=NoopRateLimiter(),
            usage=LogUsageSink(str(log)),
            inputs=InputsCache(),
        )
        app = build_server(state, timeout_secs=120.0)

        async def go():
            await app.handle_request(
                __import__("test_server").req(
                    "POST", "/v1/ingest/text/0/1", b"meter this request"
                )
            )
            await asyncio.sleep(0.05)
            resp, _ = await app.handle_request(
                __import__("test_server").req("GET", "/v1/admin/usage")
            )
            return resp

        resp = run(go())
        events = json.loads(resp.body)["events"]
        assert events and events[-1]["op"] == "ingest"

    def test_tenant_key_scoped_to_own_tenant(self, tmp_path):
        """A tenant-scoped key manages ONLY its own tenant's keys (the
        reference dashboard's per-user key CRUD); other tenants 403."""
        app, ks = make_app_with_keystore(tmp_path)
        issued = ks.issue(5, "beta")
        resp = call(app, "POST", "/v1/admin/keys", b"{}", token=issued["token"])
        assert resp.status == 201
        assert json.loads(resp.body)["tenant_id"] == 5
        resp = call(app, "POST", "/v1/admin/keys",
                    json.dumps({"tenant_id": 6}).encode(),
                    token=issued["token"])
        assert resp.status == 403


class TestScopes:
    """Scoped keys: empty scopes = unrestricted; explicit scopes gate
    route families with 403 (web docs/error-codes scope-mismatch rule,
    reference keys-file TOML `scopes = ["ingest", "query"]`)."""

    def test_issue_with_scopes_enforced(self, tmp_path):
        app, ks = make_app_with_keystore(tmp_path)
        resp = call(app, "POST", "/v1/admin/keys", json.dumps({
            "tenant_id": 5, "key_id": "ingest-only",
            "scopes": ["ingest"],
        }).encode())
        assert resp.status == 201
        tok = jbody(resp)["token"]
        assert jbody(resp)["scopes"] == ["ingest"]

        # allowed: its scope's route family
        resp = call(app, "POST", "/v1/ingest/text/5/1",
                    b"hello world text", token=tok)
        assert resp.status == 201
        # denied: query is outside the key's scopes
        resp = call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 5, "modality": "text", "k": 3,
            "terms": ["hello"],
        }).encode(), token=tok)
        assert resp.status == 403
        assert "scope" in jbody(resp)["message"]
        # denied: records reads too
        resp = call(app, "GET", "/v1/records/5/1", token=tok)
        assert resp.status == 403

    def test_multi_scope_key(self, tmp_path):
        app, ks = make_app_with_keystore(tmp_path)
        tok = ks.issue(6, "iq", scopes=["ingest", "query"])["token"]
        assert call(app, "POST", "/v1/ingest/text/6/1",
                    b"some words here", token=tok).status == 201
        assert call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 6, "modality": "text", "terms": ["words"],
        }).encode(), token=tok).status == 200
        assert call(app, "GET", "/v1/records/6/1", token=tok).status == 403

    def test_empty_scopes_unrestricted(self, tmp_path):
        app, ks = make_app_with_keystore(tmp_path)
        tok = ks.issue(6, "full")["token"]
        assert call(app, "POST", "/v1/ingest/text/6/2",
                    b"unrestricted key words", token=tok).status == 201
        assert call(app, "GET", "/v1/records/6/2", token=tok).status == 200

    def test_unknown_scope_rejected(self, tmp_path):
        app, _ = make_app_with_keystore(tmp_path)
        resp = call(app, "POST", "/v1/admin/keys", json.dumps({
            "tenant_id": 5, "scopes": ["superuser"],
        }).encode())
        assert resp.status == 400
        assert "unknown scopes" in jbody(resp)["message"]

    def test_scopes_survive_reopen(self, tmp_path):
        from ucfp_tpu.server.keystore import PersistentKeyStore

        p = str(tmp_path / "k.json")
        tok = PersistentKeyStore(p).issue(3, scopes=["query"])["token"]
        ctx = run(PersistentKeyStore(p).lookup(tok))
        assert ctx.scopes == ("query",)


class TestKeysFileScopes:
    def test_toml_scope_array_parsed(self):
        from ucfp_tpu.server.auth import parse_keys_file

        keys = parse_keys_file('''
[keys.worker]
token = "sek"
tenant_id = 4
scopes = ["ingest", "query"]
rate_class = "bulk"
''')
        ctx = keys["sek"]
        assert ctx.scopes == ("ingest", "query")
        assert ctx.rate_class == "bulk"
        assert ctx.tenant_id == 4


class TestKeyIdValidation:
    def test_non_string_and_bad_key_ids_rejected(self, tmp_path):
        app, ks = make_app_with_keystore(tmp_path)
        for bad in (5, "", "a/b", "x" * 65):
            resp = call(app, "POST", "/v1/admin/keys", json.dumps({
                "tenant_id": 1, "key_id": bad,
            }).encode())
            assert resp.status == 400, bad
            assert "key_id must" in jbody(resp)["message"]
        # sane ids still work and revoke by path
        resp = call(app, "POST", "/v1/admin/keys", json.dumps({
            "tenant_id": 1, "key_id": "worker-1.a",
        }).encode())
        assert resp.status == 201
        assert call(app, "DELETE", "/v1/admin/keys/worker-1.a").status == 200
