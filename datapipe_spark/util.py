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
    # NOTE: defaulting this to /dev/shm (tmpfs) was benched and
    # rejected — A/B at sf0.1 showed no win (74.5 s vs 71.8 s suite
    # wall); the scratch files are small enough that the OS page cache
    # already absorbs them on /tmp. Override via the env var if a host
    # has a genuinely slow temp filesystem.
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


def materialize_and_release(df, *caches):
    """Materialize ``df`` via ``localCheckpoint`` and unpersist the
    mid-query ``caches`` it was built from.

    For operators whose returned plan depends on internally persisted
    intermediates: a plain ``persist`` can never be released (the
    caller consumes the plan later), so it leaks into the session's
    cache for good — measurably slowing every subsequent query.
    ``localCheckpoint`` pins only the (small) result as block-manager
    RDD blocks, which the ContextCleaner frees automatically once the
    DataFrame is unreferenced — unlike plan caches, which live until
    an explicit unpersist. Use when |result| ≪ |inputs| (pair lists,
    labels); the checkpoint write is one extra pass over the result
    rows only.
    """
    out = df.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out
