"""Live Hugging Face artifact download (moshi-server/src/utils.rs:53-186).

The reference's ``resolve_or_download`` fetches ``hf://org/repo/file``
(single file) and ``hf-snapshot://org/repo[/glob]`` (repo listing filtered
by a glob, every match downloaded, the snapshot directory returned).  This
environment is zero-egress, so the network path is gated: it runs only when
``DSM_HF_DOWNLOAD=1`` — ``server/config.resolve_path`` tries the local
caches first and falls through here.

The transport is injectable (``api=``) so the full resolution logic —
repo/file splitting, glob-start detection, sibling filtering, snapshot-dir
derivation — is unit-tested offline with a mock (tests/test_hf_download.py);
the default transport is ``huggingface_hub``.
"""

from __future__ import annotations

import fnmatch
import logging
import os
from typing import List, Optional, Protocol

log = logging.getLogger("dsm.hf")

_GLOB_CHARS = ("*", "?", "[")


class HfTransport(Protocol):
    """The three hub operations the resolver needs."""

    def get(self, repo_id: str, filename: str) -> str:
        """Download (or reuse the cached copy of) one file; returns the
        local path."""
        ...

    def list_files(self, repo_id: str) -> List[str]:
        """All file names in the repo (utils.rs repo_info().siblings)."""
        ...


class HubTransport:
    """Default transport backed by huggingface_hub (lazy import so the
    module loads in environments without network or the package)."""

    def get(self, repo_id: str, filename: str) -> str:
        from huggingface_hub import hf_hub_download

        return hf_hub_download(repo_id=repo_id, filename=filename)

    def list_files(self, repo_id: str) -> List[str]:
        from huggingface_hub import HfApi

        return list(HfApi().list_repo_files(repo_id))


def download_enabled() -> bool:
    """The zero-egress gate: off unless DSM_HF_DOWNLOAD=1."""
    return os.environ.get("DSM_HF_DOWNLOAD", "0") not in ("0", "", "false")


def split_hf_file(path: str) -> tuple:
    """``org/repo/sub/dir/file`` -> ("org/repo", "sub/dir/file")
    (utils.rs:55-61)."""
    s = path.split("/")
    if len(s) < 3:
        raise ValueError(f"unexpected format for hf path hf://{path}")
    return f"{s[0]}/{s[1]}", "/".join(s[2:])


def split_snapshot_spec(path: str) -> tuple:
    """``org/repo[/glob]`` -> ("org/repo", glob-or-None) using the
    first-glob-char rule of utils.rs:85-99 (the glob starts at the last
    '/' before the first of ``* ? [``)."""
    glob_start = next(
        (i for i, c in enumerate(path) if c in _GLOB_CHARS), None
    )
    if glob_start is None:
        repo_path, pattern = path, None
    else:
        repo_end = path[:glob_start].rfind("/")
        if repo_end < 0:
            repo_end = glob_start
        repo_path = path[:repo_end]
        pattern = path[repo_end:].lstrip("/")
    parts = repo_path.split("/")
    if len(parts) < 2:
        raise ValueError(
            "unexpected format for hf-snapshot path, expected org/repo: "
            f"hf-snapshot://{path}"
        )
    return f"{parts[0]}/{parts[1]}", pattern


def _glob_match(name: str, pattern: str) -> bool:
    """Glob-crate-compatible match: ``**/`` also matches ZERO directory
    components (fnmatch alone requires at least one — a bare
    ``**/*.safetensors`` would silently skip every repo-root file the
    reference downloads; utils.rs uses glob::Pattern semantics)."""
    if fnmatch.fnmatchcase(name, pattern):
        return True
    return pattern.startswith("**/") and fnmatch.fnmatchcase(
        name, pattern[len("**/"):]
    )


def download_file(path: str, api: Optional[HfTransport] = None) -> str:
    """``hf://`` body -> local path of the downloaded file."""
    api = api or HubTransport()
    repo_id, fname = split_hf_file(path)
    return api.get(repo_id, fname)


def download_snapshot(path: str, api: Optional[HfTransport] = None) -> str:
    """``hf-snapshot://`` body -> local snapshot DIRECTORY, with every
    glob-matching file downloaded (utils.rs:74-186)."""
    api = api or HubTransport()
    repo_id, pattern = split_snapshot_spec(path)
    files = api.list_files(repo_id)
    if pattern is not None:
        files = [f for f in files if _glob_match(f, pattern)]
        if not files:
            log.warning(
                "no files matched the glob pattern %r in hf-snapshot %s",
                pattern, repo_id,
            )
    if not files:
        # Nothing to fetch: return the conventional hub cache dir for the
        # repo (utils.rs:178-186).
        org, repo = repo_id.split("/")
        return os.path.join(
            os.environ.get(
                "HF_HUB_CACHE", os.path.expanduser("~/.cache/huggingface/hub")
            ),
            f"models--{org}--{repo}",
        )
    log.info(
        "downloading %d file(s) from HF snapshot %s (pattern %r)",
        len(files), repo_id, pattern,
    )
    local = None
    for f in files:
        local = api.get(repo_id, f)
    # Walk up from the last file's local path to the snapshot root: one
    # parent per path component of the repo-relative name (utils.rs:165-172).
    depth = files[-1].count("/") + 1
    snapshot_dir = local
    for _ in range(depth):
        snapshot_dir = os.path.dirname(snapshot_dir)
    return snapshot_dir


def resolve_or_download(spec: str, api: Optional[HfTransport] = None) -> Optional[str]:
    """Network leg of config.resolve_path: called on local-cache miss when
    the gate is open.  Returns a local path or None on failure (the caller
    reports the missing artifact)."""
    try:
        if spec.startswith("hf://"):
            return download_file(spec[len("hf://"):], api)
        if spec.startswith("hf-snapshot://"):
            return download_snapshot(spec[len("hf-snapshot://"):], api)
    except Exception as e:  # network/transport errors -> missing artifact
        log.warning("hf download failed for %s: %s", spec, e)
    return None
