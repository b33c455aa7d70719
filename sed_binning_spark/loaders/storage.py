"""Final-table storage + mirroring + dataset utilities (S9/S10/S11).

- S9 combined-parquet save/load of the assembled event table
  (parquet_handler, sed/loader/flash/loader.py:744-837): in Spark the
  "combined parquet" is just a partitioned parquet dataset; save/load are
  thin, but the error contract (load of a missing table raises with the
  reference's guidance) is kept.
- S10 CopyTool (sed/loader/mirrorutil.py:18-120): the reference rsyncs
  network folders to local scratch before reading. On HDFS/S3/alluxio the
  storage layer already does this, so the hook is a deliberate no-op that
  preserves the call site.
- S11 dataset fetcher (sed/dataset/dataset.py:28-416): fetch+unzip of
  example datasets tracked in a user-level JSON registry. urllib-based;
  works with file:// URLs so tests need no network.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import zipfile
from pathlib import Path
from urllib.request import urlopen

from pyspark.sql import DataFrame, SparkSession


# ---------------------------------------------------------------------------
# S9: combined-parquet save/load
# ---------------------------------------------------------------------------
def save_parquet(df: DataFrame, path: str | Path, mode: str = "overwrite") -> None:
    """Persist the assembled event table (save_parquet branch of
    parquet_handler, flash/loader.py:744-837)."""
    df.write.mode(mode).parquet(str(path))


def load_parquet(spark: SparkSession, path: str | Path) -> DataFrame:
    """Load a previously saved event table; missing table raises with the
    reference's guidance (flash/loader.py:796-805).

    The local-existence pre-check applies only to plain paths: a URI
    (s3://, hdfs://, ...) is handed straight to Spark — pathlib would
    mangle the scheme and ``exists()`` tests the DRIVER's filesystem, so
    every remote table would "not exist"."""
    p = str(path)
    if "://" not in p and not Path(p).exists():
        raise FileNotFoundError(
            "The final parquet dataframe could not be found at "
            f"{p}. Set 'save_parquet=True' in a prior run to create it.",
        )
    return spark.read.parquet(p)


# ---------------------------------------------------------------------------
# S10: CopyTool no-op hook
# ---------------------------------------------------------------------------
class CopyTool:
    """Mirror hook (sed/loader/mirrorutil.py): on a distributed filesystem
    the scheduler already reads data-local, so ``copy`` is an identity by
    default. ``use_copy=False`` in the reference's processor maps to this
    default; a custom mirror can subclass and override :meth:`copy`."""

    def __init__(self, source: str | None = None, dest: str | None = None) -> None:
        self.source = source
        self.dest = dest

    def copy(self, source: str, **_kwds) -> str:
        """Return the path to read from (identity: no mirroring needed)."""
        return source

    def cleanup_oldest_scan(self) -> None:  # pragma: no cover - no-op hook
        """The reference's scratch-space eviction; nothing to evict here."""


# ---------------------------------------------------------------------------
# S11: dataset fetcher
# ---------------------------------------------------------------------------
class DatasetFetcher:
    """Example-dataset manager (sed/dataset/dataset.py:28-416): named
    datasets resolve to a URL (file://, http://, https:// — plain urllib,
    no extra dependency), are fetched once into ``data_dir``, checksum-
    verified, unzipped when they are zip archives, and recorded in a JSON
    state file so repeat calls are cache hits.

    Registry values are either a bare URL string or a dict::

        {"url": "https://...", "sha256": "<hex digest>"}

    With ``sha256`` the download is verified before use; a mismatch deletes
    the corrupt file and raises (a truncated mirror must never be recorded
    as a good cache entry). The state file tracks the extracted member list
    of zip datasets, mirroring the reference's subdir/file tracking.
    """

    def __init__(self, data_dir: str | Path, registry: dict | None = None):
        self.data_dir = Path(data_dir)
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.registry = dict(registry or {})
        self._state_file = self.data_dir / "datasets.json"

    def _state(self) -> dict:
        if self._state_file.exists():
            return json.loads(self._state_file.read_text())
        return {}

    def _record(self, name: str, entry: dict) -> None:
        state = self._state()
        state[name] = entry
        self._state_file.write_text(json.dumps(state, indent=2))

    def _spec(self, name: str) -> dict:
        if name not in self.registry:
            raise KeyError(
                f"unknown dataset {name!r}; available: {sorted(self.registry)}",
            )
        spec = self.registry[name]
        if isinstance(spec, str):
            return {"url": spec}
        spec = dict(spec)
        if "url" not in spec:
            raise ValueError(f"dataset {name!r} registry entry has no 'url'")
        return spec

    def get(self, name: str, force_download: bool = False) -> str:
        """Fetch (or reuse) a named dataset; returns its local directory."""
        spec = self._spec(name)
        state = self._state()
        if name in state and not force_download:
            entry = state[name]
            existing = Path(entry["path"])
            # a cache hit must still match the CURRENT registry spec: a
            # registry update (new mirror URL, corrected checksum after a
            # bad upstream archive) invalidates the entry, otherwise users
            # keep computing on the stale download forever
            url_ok = entry.get("url") in (None, spec["url"])
            sha_ok = spec.get("sha256") is None or (
                entry.get("sha256") == spec["sha256"].lower()
            )
            if existing.exists() and url_ok and sha_ok:
                return str(existing)
        url = spec["url"]
        target_dir = self.data_dir / name
        # re-downloads (version bump, checksum change) must not leave the
        # previous archive's extracted members mixed into the directory —
        # a consumer globbing the dataset dir would read old + new data
        if target_dir.exists():
            shutil.rmtree(target_dir)
        target_dir.mkdir(parents=True, exist_ok=True)
        fname = os.path.basename(url.split("?", 1)[0]) or f"{name}.bin"
        target = target_dir / fname
        digest = hashlib.sha256()
        with urlopen(url) as resp, open(target, "wb") as out:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                digest.update(chunk)
                out.write(chunk)
        expected = spec.get("sha256")
        if expected is not None and digest.hexdigest() != expected.lower():
            got = digest.hexdigest()
            target.unlink(missing_ok=True)
            raise ValueError(
                f"checksum mismatch for dataset {name!r} from {url}: "
                f"expected sha256 {expected}, got {got} — download "
                "discarded, not recorded",
            )
        entry = {"path": str(target_dir), "url": url, "sha256": digest.hexdigest()}
        if zipfile.is_zipfile(target):
            with zipfile.ZipFile(target) as zf:
                members = zf.namelist()
                zf.extractall(target_dir)
            target.unlink()
            entry["files"] = sorted(members)
        else:
            entry["files"] = [fname]
        self._record(name, entry)
        return str(target_dir)
