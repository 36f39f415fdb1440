"""Feature-list parsing and completed-feature discovery.

Parity with reference semantics (reference: atlas_patch/utils/features.py:10-71):
a feature dataset only counts as existing when its row count matches the
expected patch count, so partial embeddings are transparently regenerated.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import h5py


def parse_feature_list(raw: str, *, choices: list[str]) -> list[str]:
    """Normalize, validate, and deduplicate a space/comma separated list."""
    parts = [p.strip().lower() for p in raw.replace(",", " ").split() if p.strip()]
    if not parts:
        raise ValueError("At least one feature extractor name is required.")
    unknown = [p for p in parts if p not in choices]
    if unknown:
        raise ValueError(
            f"Unknown extractor(s): {', '.join(unknown)}. Available: {', '.join(choices)}"
        )
    seen: set[str] = set()
    dupes: list[str] = []
    unique_parts: list[str] = []
    for p in parts:
        if p in seen:
            dupes.append(p)
            continue
        seen.add(p)
        unique_parts.append(p)
    if dupes:
        raise ValueError(
            f"Duplicate extractor(s) specified: {', '.join(sorted(set(dupes)))}. "
            "Provide each extractor at most once."
        )
    return unique_parts


def get_existing_features(h5_path: str | Path, *, expected_total: int | None = None) -> set[str]:
    """Feature dataset names present (and complete when expected_total given)."""
    try:
        with h5py.File(Path(h5_path), "r") as f:
            if "features" not in f:
                return set()
            names: set[str] = set()
            for name, ds in f["features"].items():
                if expected_total is not None:
                    try:
                        if int(ds.shape[0]) != int(expected_total):
                            continue
                    except Exception:
                        continue
                names.add(str(name).lower())
            return names
    except FileNotFoundError:
        return set()
    except Exception:
        # Unreadable file ⇒ treat as missing so it can be regenerated.
        return set()


def missing_features(
    h5_path: str | Path, required: Sequence[str], *, expected_total: int | None = None
) -> list[str]:
    existing = get_existing_features(h5_path, expected_total=expected_total)
    return [name for name in (r.lower() for r in required) if name not in existing]
