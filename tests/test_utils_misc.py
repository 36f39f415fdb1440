"""Coverage for the small utility modules: HF dynamic module import (cache
fallback path) and the logging noise filter
(reference: atlas_patch/utils/hf.py:9-17, logging_utils.py:6-40)."""

import logging

from atlaspatch_tpu.utils.hf import import_module_from_hf
from atlaspatch_tpu.utils.logging_utils import NoiseFilter, install_noise_filter


def test_import_module_from_hf_cache_fallback(tmp_path, monkeypatch):
    """With the hub unreachable, the module loads from the local HF cache
    layout (hub/models--ORG--NAME/snapshots/REV/FILE)."""
    snap = tmp_path / "hub" / "models--acme--toolkit" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    (snap / "helpers.py").write_text("MAGIC = 41\n\ndef answer():\n    return MAGIC + 1\n")
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    # Zero-egress: make the hub download path fail deterministically
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")

    mod = import_module_from_hf("acme/toolkit", "helpers.py")
    assert mod.answer() == 42


def test_import_module_from_hf_missing_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    try:
        import_module_from_hf("acme/absent", "nope.py")
    except Exception:
        pass
    else:
        raise AssertionError("expected a raise when file is nowhere to be found")


def test_noise_filter_drops_known_messages():
    f = NoiseFilter()

    def rec(msg):
        return logging.LogRecord("x", logging.INFO, __file__, 1, msg, None, None)

    assert not f.filter(rec("Computing image embeddings for the provided images"))
    assert not f.filter(rec("... Image embeddings computed ..."))
    assert f.filter(rec("Processing slide 12"))

    root = logging.getLogger()
    before = list(root.filters)
    try:
        install_noise_filter()
        assert any(isinstance(x, NoiseFilter) for x in root.filters)
    finally:
        root.filters = before
