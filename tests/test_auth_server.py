"""Auth issuance service: signup -> pending -> approve -> sign-in -> token
accepted by the serving auth layer (full loop, the reference's
test_auth.sh/test_ws_auth.sh flows)."""

import asyncio

from aiohttp.test_utils import TestClient, TestServer

from dsm_tpu.server import auth as auth_mod
from dsm_tpu.server.auth_server import AuthServer
from dsm_tpu.sessions import lm_gen_simple  # noqa: F401  (import check)


def test_auth_flow_end_to_end():
    srv = AuthServer(db_path=":memory:", secret="shared-secret")

    async def main():
        async with TestClient(TestServer(srv.web_app)) as client:
            # Sign up -> pending.
            r = await client.post(
                "/api/auth/sign-up",
                json={"email": "a@b.c", "password": "longenough"},
            )
            assert r.status == 200
            assert (await r.json())["status"] == "pending"
            # Duplicate refused.
            r = await client.post(
                "/api/auth/sign-up",
                json={"email": "a@b.c", "password": "longenough"},
            )
            assert r.status == 409
            # Sign in while pending: token issued but serving layer refuses.
            r = await client.post(
                "/api/auth/sign-in",
                json={"email": "a@b.c", "password": "longenough"},
            )
            token = (await r.json())["token"]
            try:
                auth_mod.validate_token(token, secret="shared-secret")
                raise AssertionError("pending account accepted")
            except auth_mod.AuthError as e:
                assert e.code == "pending_approval"
            # Wrong password.
            r = await client.post(
                "/api/auth/sign-in", json={"email": "a@b.c", "password": "nope1234"}
            )
            assert r.status == 401
            # Approve (admin) then sign in -> valid token.
            r = await client.post(
                "/api/auth/admin/approve",
                json={"email": "a@b.c", "status": "approved"},
                headers={"X-Admin-Secret": srv.admin_secret},
            )
            assert r.status == 200
            r = await client.post(
                "/api/auth/sign-in",
                json={"email": "a@b.c", "password": "longenough"},
            )
            token = (await r.json())["token"]
            claims = auth_mod.validate_token(token, secret="shared-secret")
            assert claims["user"]["email"] == "a@b.c"
            # Admin endpoint gated.
            r = await client.post(
                "/api/auth/admin/approve", json={"email": "a@b.c"},
                headers={"X-Admin-Secret": "wrong"},
            )
            assert r.status == 403

    asyncio.run(main())
