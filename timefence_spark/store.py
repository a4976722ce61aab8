"""Store: build manifests, content hashing, and feature caching.

Provenance: this module is a line-level derivation of the reference
implementation's ``store.py`` (timefence, MIT License) — it is driver-side
filesystem bookkeeping (manifests, content hashes), not engine code, and was
ported nearly verbatim per SURVEY.md §7.1 step 7; parity with reference
store.py:15-161. The one
Spark-specific change: cached feature tables and build outputs may be parquet
*directories* (distributed writes), so content hashing covers both single
files (byte hash) and directories (manifest of part files: relpath, size,
mtime — cheap and stable without re-reading 100 TB).
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

from timefence_spark._constants import CACHE_KEY_LENGTH, DEFAULT_STORE_PATH

_ENGINE_VERSION = "0.1.0"


class Store:
    """Local directory that tracks builds and manifests."""

    def __init__(self, path: str | Path = DEFAULT_STORE_PATH):
        self.path = Path(path)
        self._ensure_dirs()

    def _ensure_dirs(self) -> None:
        (self.path / "builds").mkdir(parents=True, exist_ok=True)
        (self.path / "cache" / "features").mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------
    # Build manifests
    # ------------------------------------------------------------------

    def save_build(self, manifest: dict[str, Any]) -> Path:
        """Save a build manifest; returns its path."""
        build_id = manifest.get("build_id") or datetime.now(timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ"
        )
        build_dir = self.path / "builds" / build_id
        build_dir.mkdir(parents=True, exist_ok=True)
        manifest["build_id"] = build_id
        manifest_path = build_dir / "build.json"
        manifest_path.write_text(json.dumps(manifest, indent=2, default=str))

        output_path = manifest.get("output", {}).get("path")
        if output_path:
            output_abs = Path(output_path).resolve()
            if output_abs.exists():
                import contextlib

                with contextlib.suppress(OSError):
                    (build_dir / output_abs.name).symlink_to(output_abs)
        return manifest_path

    def list_builds(self) -> list[dict[str, Any]]:
        """All builds, newest first."""
        builds_dir = self.path / "builds"
        if not builds_dir.exists():
            return []
        builds = []
        for build_dir in sorted(builds_dir.iterdir(), reverse=True):
            manifest_path = build_dir / "build.json"
            if manifest_path.exists():
                builds.append(json.loads(manifest_path.read_text()))
        return builds

    def get_build(self, build_id: str) -> dict[str, Any] | None:
        manifest_path = self.path / "builds" / build_id / "build.json"
        if manifest_path.exists():
            return json.loads(manifest_path.read_text())
        return None

    # ------------------------------------------------------------------
    # Content hashing
    # ------------------------------------------------------------------

    @staticmethod
    def content_hash(path: str | Path) -> str:
        """SHA-256 of a file's bytes, or of a directory's (relpath, size,
        mtime_ns) manifest for parquet dataset directories."""
        path = Path(path)
        h = hashlib.sha256()
        if path.is_dir():
            for f in sorted(path.rglob("*")):
                if f.is_file():
                    st = f.stat()
                    h.update(
                        f"{f.relative_to(path)}:{st.st_size}:{st.st_mtime_ns}\n".encode()
                    )
            return f"sha256:dir:{h.hexdigest()}"
        with open(path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        return f"sha256:{h.hexdigest()}"

    def cached_content_hash(self, path: str | Path) -> str:
        """content_hash memoized by (path, size, mtime_ns)."""
        path = Path(path).resolve()
        cache_file = self.path / "cache" / "hashes.json"
        cache: dict[str, str] = {}
        if cache_file.exists():
            cache = json.loads(cache_file.read_text())

        st = path.stat()
        cache_key = f"{path}:{st.st_size}:{st.st_mtime_ns}"
        if cache_key in cache:
            return cache[cache_key]
        content_hash = self.content_hash(path)
        cache[cache_key] = content_hash
        cache_file.write_text(json.dumps(cache, indent=2))
        return content_hash

    # ------------------------------------------------------------------
    # Feature-level cache
    # ------------------------------------------------------------------

    def feature_cache_key(
        self,
        definition_hash: str,
        source_content_hash: str | None,
        embargo: str | None,
    ) -> str:
        key_input = (
            f"{definition_hash}:{source_content_hash or ''}:"
            f"{embargo or '0d'}:{_ENGINE_VERSION}"
        )
        return hashlib.sha256(key_input.encode()).hexdigest()[:CACHE_KEY_LENGTH]

    def feature_cache_path(self, feature_name: str, cache_key: str) -> Path:
        return self.path / "cache" / "features" / f"{feature_name}__{cache_key}.parquet"

    def has_feature_cache(self, feature_name: str, cache_key: str) -> bool:
        return self.feature_cache_path(feature_name, cache_key).exists()

    # ------------------------------------------------------------------
    # Build-level cache
    # ------------------------------------------------------------------

    def build_cache_key(
        self,
        label_content_hash: str | None,
        feature_cache_keys: list[str],
        max_lookback: str | None,
        max_staleness: str | None,
        join_mode: str,
        on_missing: str,
        output_spec: str = "",
    ) -> str:
        # output_spec (path + partition layout) is part of the key: a cache
        # hit skips the write, so a request for a different output artifact
        # must be a miss — the reference couldn't hit this (single-file
        # outputs only), a Spark engine with partitioned outputs can.
        key_input = (
            f"{label_content_hash or ''}:"
            f"{sorted(feature_cache_keys)}:"
            f"{max_lookback}:{max_staleness}:{join_mode}:{on_missing}:"
            f"{output_spec}"
        )
        return hashlib.sha256(key_input.encode()).hexdigest()[:CACHE_KEY_LENGTH]

    def find_cached_build(self, build_cache_key: str) -> dict[str, Any] | None:
        for build in self.list_builds():
            if build.get("build_cache_key") == build_cache_key:
                output_path = build.get("output", {}).get("path")
                if output_path and Path(output_path).exists():
                    return build
        return None
