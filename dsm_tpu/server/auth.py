"""Better Auth JWT validation + generation (HS256, stdlib only).

Wire-compatible with the reference (moshi-server/src/auth.rs): claims carry
``{session: {...}, user: {id, email, status, role}, exp, iat}``, signed
HS256 with ``BETTER_AUTH_SECRET``; credentials come from the Authorization
Bearer header, the ``?token=`` query param, or the
``better-auth.session_token`` cookie.  Approval-status gate: "approved" or
absent passes, "pending"/"rejected"/unknown are refused (auth.rs:209-252).

Also provides token *generation* matching the reference client
(kyutai-client-core/src/auth.rs) so our CLI can mint tokens for testing.
"""

from __future__ import annotations

import base64
import dataclasses
import hashlib
import hmac
import json
import os
import time
from typing import Dict, Optional

AUTHORIZATION_HEADER = "authorization"
SESSION_COOKIE = "better-auth.session_token"
SECRET_ENV = "BETTER_AUTH_SECRET"


class AuthError(Exception):
    def __init__(self, error: str, code: str, message: str, hint: str):
        super().__init__(message)
        self.error = error
        self.code = code
        self.message = message
        self.hint = hint

    def to_json(self) -> Dict[str, str]:
        return {
            "error": self.error,
            "code": self.code,
            "message": self.message,
            "hint": self.hint,
        }

    @property
    def status(self) -> int:
        return 403 if self.error == "forbidden" else 401

    # Constructors mirroring auth.rs:60-120.
    @classmethod
    def expired_token(cls):
        return cls("unauthorized", "expired_token", "Session has expired",
                   "Re-authenticate to obtain a new session token")

    @classmethod
    def missing_credentials(cls):
        return cls("unauthorized", "missing_credentials",
                   "No authentication credentials provided",
                   "Provide Authorization Bearer token, ?token query param, "
                   "or session cookie")

    @classmethod
    def jwt_validation_failed(cls, reason: str):
        return cls("unauthorized", "jwt_validation_failed",
                   f"JWT validation failed: {reason}",
                   "Ensure the token is properly signed and not corrupted")

    @classmethod
    def pending_approval(cls, email: Optional[str]):
        msg = (f"Account {email} is pending admin approval" if email
               else "Account is pending admin approval")
        return cls("forbidden", "pending_approval", msg,
                   "Please wait for an administrator to approve your account")

    @classmethod
    def account_rejected(cls, email: Optional[str]):
        msg = (f"Account {email} has been rejected" if email
               else "Account has been rejected")
        return cls("forbidden", "account_rejected", msg,
                   "Contact the administrator for more information")


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def sign_token(claims: dict, secret: str) -> str:
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    payload = _b64url(json.dumps(claims).encode())
    signing = f"{header}.{payload}".encode()
    sig = hmac.new(secret.encode(), signing, hashlib.sha256).digest()
    return f"{header}.{payload}.{_b64url(sig)}"


def generate_token(
    user_id: str = "cli-user",
    email: str = "cli@localhost",
    secret: Optional[str] = None,
    ttl_s: int = 7 * 24 * 3600,
    status: str = "approved",
    role: str = "user",
) -> str:
    """Mint a Better Auth compatible token (client-core/src/auth.rs)."""
    secret = secret or os.environ.get(SECRET_ENV)
    if not secret:
        raise AuthError.missing_credentials()
    now = int(time.time())
    claims = {
        "session": {
            "id": f"session-{user_id}",
            "userId": user_id,
            "expiresAt": (now + ttl_s) * 1000,
        },
        "user": {"id": user_id, "email": email, "status": status, "role": role},
        "iat": now,
        "exp": now + ttl_s,
    }
    return sign_token(claims, secret)


def validate_token(token: str, secret: Optional[str] = None) -> dict:
    secret = secret or os.environ.get(SECRET_ENV)
    if not secret:
        raise AuthError.jwt_validation_failed("server has no secret configured")
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError.jwt_validation_failed("malformed token")
    signing = f"{parts[0]}.{parts[1]}".encode()
    try:
        header = json.loads(_b64url_decode(parts[0]))
        claims = json.loads(_b64url_decode(parts[1]))
        sig = _b64url_decode(parts[2])
    except Exception as e:
        raise AuthError.jwt_validation_failed(f"decode error: {e}")
    if header.get("alg") != "HS256":
        raise AuthError.jwt_validation_failed(f"unsupported alg {header.get('alg')}")
    expected = hmac.new(secret.encode(), signing, hashlib.sha256).digest()
    if not hmac.compare_digest(sig, expected):
        raise AuthError.jwt_validation_failed("bad signature")
    exp = claims.get("exp")
    if exp is not None and time.time() > float(exp):
        raise AuthError.expired_token()
    check_approval_status(claims)
    return claims


def check_approval_status(claims: dict) -> None:
    """approved/absent -> ok; pending/rejected/unknown -> refuse
    (auth.rs:209-252; unknown statuses are rejected for safety)."""
    user = claims.get("user") or {}
    status = user.get("status")
    email = user.get("email")
    if status is None or status == "approved":
        return
    if status == "pending":
        raise AuthError.pending_approval(email)
    raise AuthError.account_rejected(email)


@dataclasses.dataclass
class AuthContext:
    """Per-request credential extraction (header > query > cookie)."""

    enabled: bool = True
    secret: Optional[str] = None

    def check(self, headers, query: dict, cookies: dict) -> Optional[dict]:
        if not self.enabled:
            return None
        token = None
        authz = headers.get(AUTHORIZATION_HEADER) or headers.get("Authorization")
        if authz and authz.lower().startswith("bearer "):
            token = authz[7:].strip()
        if token is None:
            token = query.get("token")
        if token is None:
            token = cookies.get(SESSION_COOKIE)
        if token is None:
            raise AuthError.missing_credentials()
        return validate_token(token, self.secret)
