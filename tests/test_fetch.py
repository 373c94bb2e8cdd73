"""io.fetch — env-gated cached fetcher (reference dnnlib/util.py:382-477)."""

import os

import pytest

from pasta_tpu.io import fetch


def test_local_path_passthrough(tmp_path):
    p = tmp_path / "weights.npz"
    p.write_bytes(b"abc")
    assert fetch.fetch_path(str(p)) == str(p)


def test_missing_local_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        fetch.fetch_path(str(tmp_path / "nope.bin"))


def test_file_url_cached_copy(tmp_path, monkeypatch):
    monkeypatch.setenv("PASTA_CACHE_DIR", str(tmp_path / "cache"))
    src = tmp_path / "detector.bin"
    src.write_bytes(b"\x00\x01\x02")
    url = src.as_uri()
    got = fetch.fetch_path(url)
    assert got != str(src) and os.path.isfile(got)
    with fetch.open_url(url) as f:
        assert f.read() == b"\x00\x01\x02"
    # second fetch hits the cache (same canonical path, still valid after
    # the source disappears — the reference's detector-cache behavior)
    src.unlink()
    assert fetch.fetch_path(url) == got


def test_http_gated_off_by_default(monkeypatch):
    monkeypatch.delenv("PASTA_ALLOW_NETWORK", raising=False)
    with pytest.raises(RuntimeError, match="zero-egress"):
        fetch.fetch_path("https://example.com/weights.pkl")
