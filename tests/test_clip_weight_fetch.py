"""Egress-gated OpenAI CLIP teacher-weight fetch (clip/load.py).

Parity target: the reference's `clip.load` downloads the teacher at call
time (`/root/reference/CLIP/clip/clip.py:30-40` URL+sha table, `_download`
sha256 verification at clip.py:43-70). Here the fetch sits behind the same
BCOS_ALLOW_DOWNLOAD=1 gate as the released B-cos weights
(models/pretrained._maybe_fetch_npz): zero-egress behaviour is unchanged,
file:// URLs exercise the full path without a network.
"""
import hashlib
import urllib.request
import warnings

import numpy as np
import pytest
import torch

import importlib

# the clip package re-exports load() the function; get the MODULE
clip_load = importlib.import_module("bcosification_tpu.clip.load")


@pytest.fixture()
def _clean_env(monkeypatch, tmp_path):
    for var in ("CLIP_WEIGHTS_PATH", "CLIP_WEIGHTS_DIR", "BCOS_ALLOW_DOWNLOAD"):
        monkeypatch.delenv(var, raising=False)
    # the default download cache lives under $HOME — isolate it so a real
    # cached checkpoint on the dev machine can't leak into these tests
    monkeypatch.setenv("HOME", str(tmp_path / "home"))


def _make_release(tmp_path, name="RN50"):
    """torch-save a tiny state dict and lay it out like an OpenAI release:
    .../<sha256>/<name>.pt with the sha as the URL's second-to-last path
    component (what the reference's _download verifies)."""
    raw = tmp_path / "raw.pt"
    torch.save({"w": torch.ones(3, 2), "logit_scale": torch.tensor(2.0)}, raw)
    sha = hashlib.sha256(raw.read_bytes()).hexdigest()
    rel_dir = tmp_path / "release" / sha
    rel_dir.mkdir(parents=True)
    dest = rel_dir / f"{name}.pt"
    dest.write_bytes(raw.read_bytes())
    return f"file://{dest}", sha


def test_zero_egress_by_default(_clean_env, monkeypatch, tmp_path):
    """Without BCOS_ALLOW_DOWNLOAD=1 nothing touches the network and the
    offline warn-and-degrade contract is unchanged."""
    def no_net(*a, **k):
        raise AssertionError("urlopen called without BCOS_ALLOW_DOWNLOAD=1")

    monkeypatch.setattr(urllib.request, "urlopen", no_net)
    with pytest.warns(UserWarning, match="No CLIP checkpoint"):
        assert clip_load.load_state_dict_file("RN50") is None


def test_fetch_verifies_sha_and_caches(_clean_env, monkeypatch, tmp_path):
    url, sha = _make_release(tmp_path)
    monkeypatch.setitem(clip_load._MODEL_URLS, "RN50", url)
    monkeypatch.setenv("BCOS_ALLOW_DOWNLOAD", "1")
    cache = tmp_path / "cache"
    monkeypatch.setenv("CLIP_WEIGHTS_DIR", str(cache))

    sd = clip_load.load_state_dict_file("RN50")
    assert sd is not None
    np.testing.assert_array_equal(sd["w"], np.ones((3, 2), np.float32))
    assert (cache / "RN50.pt").exists()
    assert hashlib.sha256((cache / "RN50.pt").read_bytes()).hexdigest() == sha

    # second resolve uses the cache (no re-fetch: urlopen now raises)
    def no_net(*a, **k):
        raise AssertionError("re-fetched a cached checkpoint")

    monkeypatch.setattr(urllib.request, "urlopen", no_net)
    sd2 = clip_load.load_state_dict_file("RN50")
    assert sd2 is not None and "w" in sd2


def test_sha_mismatch_degrades_to_random_init(_clean_env, monkeypatch, tmp_path):
    url, _ = _make_release(tmp_path)
    # swap in a wrong sha path component: fetch must refuse the file
    parts = url.rsplit("/", 2)
    bad_url = "/".join([parts[0], "0" * 64, parts[2]])
    bad_dir = tmp_path / "release" / ("0" * 64)
    bad_dir.mkdir()
    (bad_dir / "RN50.pt").write_bytes(
        (tmp_path / "raw.pt").read_bytes()
    )
    monkeypatch.setitem(clip_load._MODEL_URLS, "RN50", bad_url)
    monkeypatch.setenv("BCOS_ALLOW_DOWNLOAD", "1")
    monkeypatch.setenv("CLIP_WEIGHTS_DIR", str(tmp_path / "cache2"))
    with pytest.warns(UserWarning, match="sha256 mismatch|download.*failed"):
        assert clip_load.load_state_dict_file("RN50") is None
    assert not (tmp_path / "cache2" / "RN50.pt").exists()


def test_cached_download_readable_without_gate(_clean_env, monkeypatch, tmp_path):
    """A checkpoint fetched once into the default cache must resolve on
    later runs WITHOUT BCOS_ALLOW_DOWNLOAD: reading a local file is not
    egress (r5 review #3 — the cache hit used to sit behind the gate and
    silently degrade to a random-init teacher)."""
    url, _ = _make_release(tmp_path)
    monkeypatch.setitem(clip_load._MODEL_URLS, "RN50", url)
    monkeypatch.setenv("BCOS_ALLOW_DOWNLOAD", "1")
    sd = clip_load.load_state_dict_file("RN50")  # lands in $HOME cache
    assert sd is not None
    cached = clip_load._cache_root() / "RN50.pt"
    assert cached.exists()

    monkeypatch.delenv("BCOS_ALLOW_DOWNLOAD")

    def no_net(*a, **k):
        raise AssertionError("cache hit must not touch the network")

    monkeypatch.setattr(urllib.request, "urlopen", no_net)
    sd2 = clip_load.load_state_dict_file("RN50")
    assert sd2 is not None and "w" in sd2


def test_corrupt_default_cache_self_heals(_clean_env, monkeypatch, tmp_path):
    """A corrupt file in OUR default cache must not crash or silently load:
    with the gate on it is re-downloaded (sha-verified) and the load
    succeeds; with the gate off it degrades to random init with a warning
    (r5 review: the candidate refactor dropped the old self-heal)."""
    url, _ = _make_release(tmp_path)
    monkeypatch.setitem(clip_load._MODEL_URLS, "RN50", url)
    cached = clip_load._cache_root() / "RN50.pt"
    cached.parent.mkdir(parents=True)
    cached.write_bytes(b"not a checkpoint")

    # gate off: degrade, don't raise (the sha pre-check catches it first;
    # the parse-failure self-heal backstops files that hash right but
    # torch.load wrong)
    with pytest.warns(UserWarning, match="sha256 check|unreadable"):
        assert clip_load.load_state_dict_file("RN50") is None
    assert cached.read_bytes() == b"not a checkpoint"  # nothing replaced

    # gate on: verified re-download replaces the corrupt file and loads
    monkeypatch.setenv("BCOS_ALLOW_DOWNLOAD", "1")
    with pytest.warns(UserWarning, match="sha256 check|unreadable"):
        sd = clip_load.load_state_dict_file("RN50")
    assert sd is not None and "w" in sd
    assert cached.read_bytes() != b"not a checkpoint"


def test_corrupt_user_path_raises(_clean_env, monkeypatch, tmp_path):
    """A corrupt USER-supplied checkpoint fails loudly — silently serving a
    random-init teacher after a typo'd CLIP_WEIGHTS_PATH would be worse."""
    bad = tmp_path / "teacher.pt"
    bad.write_bytes(b"garbage")
    monkeypatch.setenv("CLIP_WEIGHTS_PATH", str(bad))
    with pytest.raises(Exception):
        clip_load.load_state_dict_file("RN50")


def test_unknown_name_not_fetched(_clean_env, monkeypatch):
    monkeypatch.setenv("BCOS_ALLOW_DOWNLOAD", "1")

    def no_net(*a, **k):
        raise AssertionError("urlopen called for a name with no URL")

    monkeypatch.setattr(urllib.request, "urlopen", no_net)
    assert clip_load._maybe_fetch_checkpoint("not-a-model") is None


def test_url_table_matches_reference_spec():
    """The name->URL table is the reference's own (CLIP/clip/clip.py:30-40):
    every advertised model resolves, every URL carries its sha256 as the
    second-to-last path component."""
    for name in clip_load.available_models():
        url = clip_load._MODEL_URLS[name]
        sha = url.split("/")[-2]
        assert len(sha) == 64 and all(c in "0123456789abcdef" for c in sha)
        assert url.endswith(".pt")
