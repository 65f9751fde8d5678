"""Shared scratch-directory helpers for operators that materialize
intermediate tables (streaming sinks, archives, incremental state).

Scratch lives under the system temp dir (not the repo): contents are
deterministic, rebuilt on demand, and safe to wipe between runs.
"""

from __future__ import annotations

import os
import shutil
import tempfile


def scratch_root() -> str:
    root = os.environ.get(
        "SPARK_GRAFT_STREAM_DIR",
        os.path.join(tempfile.gettempdir(), "datapipe_spark_stream"),
    )
    os.makedirs(root, exist_ok=True)
    return root


def fresh_dir(*parts: str) -> str:
    """Deterministic scratch path, wiped on each call."""
    path = os.path.join(scratch_root(), *parts)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path
