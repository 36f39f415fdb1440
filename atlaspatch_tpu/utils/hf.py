"""Dynamic module import from the HuggingFace Hub
(reference: atlas_patch/utils/hf.py:9-17, used by CONCH v1.5).

Falls back to any file already present in the local HF cache when the hub is
unreachable (zero-egress environments)."""

from __future__ import annotations

import importlib.util
import os
from pathlib import Path
from types import ModuleType


def _cached_hub_file(repo_id: str, filename: str) -> str | None:
    # honor HF_HUB_CACHE (hf_hub_download does); snapshot dirs are commit
    # hashes, so pick the most recently fetched revision, not the
    # lexicographically-last hash — a stale module revision could otherwise
    # be imported against newer weights
    hub = Path(
        os.environ.get("HF_HUB_CACHE")
        or Path(os.environ.get("HF_HOME", Path.home() / ".cache" / "huggingface")) / "hub"
    )
    safe = repo_id.replace("/", "--")
    matches = list((hub / f"models--{safe}").glob(f"snapshots/*/{filename}"))
    if not matches:
        return None
    return str(max(matches, key=lambda p: p.parent.stat().st_mtime))


def import_module_from_hf(repo_id: str, filename: str) -> ModuleType:
    """Download (or locate in cache) a Python file from the Hub and import it."""
    path: str | None
    try:
        from huggingface_hub import hf_hub_download

        path = hf_hub_download(repo_id, filename=filename)
    except Exception:
        path = _cached_hub_file(repo_id, filename)
        if path is None:
            raise
    spec = importlib.util.spec_from_file_location(
        f"{repo_id.replace('/', '_')}_{filename}", path
    )
    if spec is None or spec.loader is None:
        raise RuntimeError(f"Failed to load spec for {repo_id}/{filename}")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module
