"""Extractor-list parsing and H5 feature-completeness probes.

Same skip/resume semantics as the reference (atlas_patch/utils/features.py:
10-71): a ``features/<name>`` dataset only counts as done when its row count
equals the slide's expected patch total, so interrupted embeddings are
regenerated instead of silently kept partial. All validation errors are plain
``ValueError`` — the CLI layer maps them to user-facing messages.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, Sequence

import h5py


def parse_feature_list(raw: str, *, choices: list[str]) -> list[str]:
    """Split a comma/space separated extractor list; validate against ``choices``.

    Rejects empty input, unknown names, and repeated names (each with a
    message naming the offenders). Matching is case-insensitive; the returned
    names are lowercase in first-seen order.
    """
    names = [tok.lower() for tok in raw.replace(",", " ").split()]
    if not names:
        raise ValueError("At least one feature extractor name is required.")

    # case-insensitive match, but return each choice's CANONICAL casing so
    # registry lookups and dataset names stay exactly as registered
    known = {c.lower(): c for c in choices}
    if unknown := [n for n in names if n not in known]:
        raise ValueError(
            f"Unknown extractor(s): {', '.join(unknown)}. Available: {', '.join(choices)}"
        )
    if dupes := sorted({n for i, n in enumerate(names) if n in names[:i]}):
        raise ValueError(
            f"Duplicate extractor(s) specified: {', '.join(dupes)}. "
            "Provide each extractor at most once."
        )
    return [known[n] for n in names]


def _is_complete(dataset, expected_total: int | None) -> bool:
    if expected_total is None:
        return True
    try:
        return int(dataset.shape[0]) == int(expected_total)
    except Exception:
        return False


def get_existing_features(
    h5_path: str | Path, *, expected_total: int | None = None
) -> set[str]:
    """Lowercased names under ``features/`` — restricted to complete datasets
    (row count == ``expected_total``) when a total is given.

    A missing or unreadable file yields the empty set: callers treat that as
    "nothing done yet" and regenerate.
    """
    try:
        with h5py.File(Path(h5_path), "r") as f:
            group = f.get("features")
            if group is None:
                return set()
            return {
                str(name).lower()
                for name, ds in group.items()
                if _is_complete(ds, expected_total)
            }
    except Exception:
        return set()


def missing_features(
    h5_path: str | Path,
    required: Sequence[str] | Iterable[str],
    *,
    expected_total: int | None = None,
) -> list[str]:
    """Required names (lowercased, order kept) not yet complete in the H5."""
    done = get_existing_features(h5_path, expected_total=expected_total)
    return [name for name in map(str.lower, required) if name not in done]
