"""Gated hf:// / hf-snapshot:// download logic with a mocked transport.

The network gate (DSM_HF_DOWNLOAD) stays closed in this zero-egress
environment; these tests inject a fake transport so the full resolution
logic — repo/file splitting, glob-start detection, sibling filtering,
snapshot-dir derivation, failure fallbacks — runs offline.  Reference
semantics: moshi-server/src/utils.rs:53-186.
"""

import os

import pytest

from dsm_tpu.server import config as CFG
from dsm_tpu.server import hf_download as HF


class FakeApi:
    """Mock transport: records downloads, materializes files under a
    hub-layout snapshot dir."""

    def __init__(self, tmp_path, files):
        self.root = tmp_path
        self.files = files
        self.downloads = []

    def _snapshot_dir(self, repo_id):
        org, repo = repo_id.split("/")
        return os.path.join(
            str(self.root), f"models--{org}--{repo}", "snapshots", "abc123"
        )

    def get(self, repo_id, filename):
        if filename not in self.files:
            raise FileNotFoundError(f"{repo_id}/{filename}")
        self.downloads.append((repo_id, filename))
        path = os.path.join(self._snapshot_dir(repo_id), filename)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("x")
        return path

    def list_files(self, repo_id):
        return list(self.files)


def test_split_hf_file():
    assert HF.split_hf_file("kyutai/stt-1b/model.safetensors") == (
        "kyutai/stt-1b", "model.safetensors"
    )
    # Nested file paths keep their directory structure (utils.rs:58-60
    # joins s[2..]).
    assert HF.split_hf_file("org/repo/sub/dir/f.bin") == (
        "org/repo", "sub/dir/f.bin"
    )
    with pytest.raises(ValueError):
        HF.split_hf_file("org/repo")


def test_split_snapshot_spec():
    # No glob: whole repo, no pattern.
    assert HF.split_snapshot_spec("kyutai/tts-voices") == (
        "kyutai/tts-voices", None
    )
    # Glob after the repo: pattern starts at the last '/' before the first
    # glob char (utils.rs:85-99).
    assert HF.split_snapshot_spec("kyutai/tts-voices/**/*.safetensors") == (
        "kyutai/tts-voices", "**/*.safetensors"
    )
    # Intermediate components between repo and the glob segment are dropped
    # (utils.rs:87-99: repo_path takes everything before the last '/' that
    # precedes the first glob char; repo_id is parts[0]/parts[1]; only the
    # trailing glob segment survives as the pattern).
    assert HF.split_snapshot_spec("org/repo/sub/*.bin") == (
        "org/repo", "*.bin"
    )
    with pytest.raises(ValueError):
        HF.split_snapshot_spec("justonepart")


def test_download_file(tmp_path):
    api = FakeApi(tmp_path, ["model.safetensors"])
    p = HF.download_file("org/repo/model.safetensors", api=api)
    assert os.path.exists(p)
    assert api.downloads == [("org/repo", "model.safetensors")]


def test_download_snapshot_glob_filters_and_returns_dir(tmp_path):
    api = FakeApi(
        tmp_path,
        ["a.safetensors", "sub/b.safetensors", "README.md", "c.bin"],
    )
    d = HF.download_snapshot("org/repo/**/*.safetensors", api=api)
    got = sorted(f for _, f in api.downloads)
    # glob-crate semantics: '**/' matches ZERO OR MORE directory
    # components, so repo-ROOT files match too (fnmatch alone would skip
    # them — hf_download._glob_match adds the zero-component case).
    assert "a.safetensors" in got
    assert "sub/b.safetensors" in got
    assert "README.md" not in got and "c.bin" not in got
    # Snapshot dir derived by walking up the last file's components.
    assert os.path.isdir(d)
    assert d.endswith(os.path.join("snapshots", "abc123"))


def test_download_snapshot_whole_repo(tmp_path):
    api = FakeApi(tmp_path, ["x.bin", "y.bin"])
    d = HF.download_snapshot("org/repo", api=api)
    assert len(api.downloads) == 2
    assert os.path.isdir(d)


def test_download_snapshot_no_match_returns_cache_path(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    api = FakeApi(tmp_path, ["README.md"])
    d = HF.download_snapshot("org/repo/*.nothere", api=api)
    assert d.endswith("models--org--repo")
    assert api.downloads == []


def test_resolve_or_download_error_returns_none(tmp_path):
    api = FakeApi(tmp_path, [])  # get() raises
    assert HF.resolve_or_download("hf://org/repo/missing.bin", api=api) is None


def test_gate_closed_by_default(monkeypatch):
    monkeypatch.delenv("DSM_HF_DOWNLOAD", raising=False)
    assert not HF.download_enabled()
    monkeypatch.setenv("DSM_HF_DOWNLOAD", "0")
    assert not HF.download_enabled()
    monkeypatch.setenv("DSM_HF_DOWNLOAD", "1")
    assert HF.download_enabled()


def test_resolve_path_stays_local_when_gated(tmp_path, monkeypatch):
    """config.resolve_path on a cache miss returns None (missing artifact)
    while the gate is closed — never touches the network path."""
    monkeypatch.delenv("DSM_HF_DOWNLOAD", raising=False)
    monkeypatch.setenv("DSM_HF_CACHE", str(tmp_path))
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    assert CFG.resolve_path("hf://org/repo/missing.safetensors") is None


def test_resolve_path_downloads_when_gated_open(tmp_path, monkeypatch):
    """With the gate open, resolve_path falls through to the (mocked)
    download leg on a local-cache miss."""
    monkeypatch.setenv("DSM_HF_DOWNLOAD", "1")
    monkeypatch.setenv("DSM_HF_CACHE", str(tmp_path / "c"))
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    api = FakeApi(tmp_path, ["m.safetensors"])
    monkeypatch.setattr(
        HF, "HubTransport", lambda: api
    )
    p = CFG.resolve_path("hf://org/repo/m.safetensors")
    assert p and os.path.exists(p)
    assert api.downloads == [("org/repo", "m.safetensors")]
