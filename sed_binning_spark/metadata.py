"""Provenance metadata tree (reference: sed/core/metadata.py:11-109).

Driver-side nested dict recording every applied operation, with the
reference's duplicate policies: raise / overwrite / merge / append.
Persisted as JSON next to outputs.
"""

from __future__ import annotations

import json
from pathlib import Path

from sed_binning_spark.config import deep_merge

DUPLICATE_POLICIES = ("raise", "overwrite", "merge", "append")


class MetaHandler:
    """Nested-dict metadata store with duplicate-entry policies."""

    def __init__(self, meta: dict | None = None) -> None:
        self._m: dict = dict(meta or {})

    @property
    def metadata(self) -> dict:
        return self._m

    def __getitem__(self, key):
        return self._m[key]

    def __contains__(self, key) -> bool:
        return key in self._m

    def add(self, entry: dict, name: str, duplicate_policy: str = "raise") -> None:
        """Record an operation's metadata under ``name``.

        Policies (matching sed/core/metadata.py:38-85 +
        complete_dictionary, sed/core/config.py:216-232): ``raise`` errors
        on duplicate; ``overwrite`` replaces; ``merge`` fills in MISSING
        keys only (the existing entry wins on conflicts, like the
        reference's complete_dictionary) and refuses to merge a non-dict
        over a dict; ``append`` keeps every version under numbered keys
        (name, name_1, ...). Entries are deep-copied on store so later
        caller-side mutation cannot rewrite recorded provenance.
        """
        import copy

        if duplicate_policy not in DUPLICATE_POLICIES:
            raise ValueError(
                f"duplicate_policy must be one of {DUPLICATE_POLICIES}, got {duplicate_policy!r}",
            )
        entry = copy.deepcopy(entry)
        if name not in self._m:
            self._m[name] = entry
            return
        if duplicate_policy == "raise":
            raise ValueError(
                f"Entry {name!r} already exists in metadata; use a different "
                "duplicate_policy to overwrite, merge, or append.",
            )
        if duplicate_policy == "overwrite":
            self._m[name] = entry
        elif duplicate_policy == "merge":
            if isinstance(self._m[name], dict) and isinstance(entry, dict):
                # existing keys win: merge only ADDS what is missing
                self._m[name] = deep_merge(entry, self._m[name])
            elif isinstance(self._m[name], dict) or isinstance(entry, dict):
                raise ValueError(
                    f"cannot merge entry {name!r}: dict and non-dict",
                )
            else:
                self._m[name] = entry
        elif duplicate_policy == "append":
            i = 1
            while f"{name}_{i}" in self._m:
                i += 1
            self._m[f"{name}_{i}"] = entry

    def to_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self._m, default=_json_default, indent=2))

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"MetaHandler({list(self._m)})"


def _json_default(obj):
    import numpy as np

    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return str(obj)
