"""Single-writer lease for the persisted stores (r10 verdict ask #8).

The SCD2 dimension store and the MinHash band index both assume
"single writer per store by contract" (operators/scd2.py module
docstring) — one streaming query owns each artifact, mirroring the
reference's one-connector-per-table deployment
(1-data-ingestion-pipeline/task10-s3-sink-connector-config.json: one
sink task owns the archive prefix). Until r11 that contract was
assumed, never checked: two concurrent writers would interleave
journal writes and corrupt the exactly-once watermark. This module
ENFORCES it with a journaled lease file:

    writer.lease   {"pid": P, "token": T, "acquired": ts}

- A writer entry acquires the lease with an O_EXCL create (atomic on
  POSIX and on the object-store emulations that matter) and releases
  it in a ``finally`` — the hold spans one writer call, matching the
  entry-sized critical sections the journal already defines.
- A second writer finding a LIVE lease raises ``StoreLockedError``
  immediately (fail fast beats blocking a micro-batch pipeline).
- A STALE lease — holder pid dead (single-node check), or lease older
  than ``ttl_seconds`` (the cross-node mechanism at 100 TB, where pid
  liveness is unknowable; writers hold for one entry, so a TTL of
  minutes bounds staleness) — is stolen through a rename: the stealer
  renames the stale lease to a private tombstone first, so exactly
  one of N concurrent stealers wins the rename and proceeds to
  re-acquire; the losers loop and now see the winner's fresh lease.

The lease serializes WRITERS only. Readers never touch it — the
journal already guarantees they see committed state only, and a
reader blocking on a writer lease would reintroduce the r9
reader-sweeps-live-staging hazard in lock form.

In-process reentrancy: a writer entry that calls another writer entry
on the same store (``scd2_compact_closed`` folding queued tombstones
through ``scd2_purge_keys``) re-enters its own lease via a depth
counter instead of deadlocking on its own file. Reentry is per-THREAD
(r11 advisory, low): the genuinely nested calls are same-thread by
construction, while a second thread in the same process (two
concurrent streaming queries in one driver — the most likely real
concurrent-writer shape) is exactly the interleaved-journal hazard
the lease exists to stop, so it raises ``StoreLockedError`` like any
other concurrent writer.

Steal safety (r11 advisory, medium): judging a lease stale and
renaming it away are two steps, and the lease can change hands in
between — the stale holder releases and a NEW writer acquires, so the
rename would kidnap a LIVE lease and admit two writers. The stealer
therefore re-reads the tombstone after the rename and verifies the
token matches the lease it judged stale; on mismatch it restores the
file and retries the loop, so a live lease is never destroyed.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid


class StoreLockedError(RuntimeError):
    """Another live writer holds this store's lease."""


_LEASE = "writer.lease"

# stale horizon for the TTL arm: writer entries hold the lease for one
# call (seconds at test scale, minutes for a 100 TB slice rewrite), so
# an hour-old lease belongs to a crashed holder on any sizing
LEASE_TTL_SECONDS = 3600.0

# the journal-replay mutex (r12 review): roll-forward executes
# filesystem writes and READERS run it too (they never take the writer
# lease), so recovery gets its own short-TTL lock — replay is seconds
# at most, and a crashed recoverer must not stall readers for the
# writer lease's hour horizon
RECOVERY_LOCK = "recovery.lock"
RECOVERY_TTL_SECONDS = 120.0


def _lease_path(store_dir: str, name: str = _LEASE) -> str:
    return store_dir.rstrip("/") + "/" + name


def _pid_alive(pid) -> bool:
    try:
        os.kill(int(pid), 0)
        return True
    except (OSError, TypeError, ValueError):
        return False


# in-process reentrancy bookkeeping: abspath -> [token, depth, thread_id]
_held: dict[str, list] = {}
_held_mu = threading.Lock()


def acquire(
    store_dir: str,
    ttl_seconds: float = LEASE_TTL_SECONDS,
    name: str = _LEASE,
) -> str:
    """Acquire the store's writer lease (or, with ``name=``, another
    named mutex on the store such as the recovery lock); returns the
    lease token to pass to ``release``. Raises ``StoreLockedError`` if
    a live holder exists. Reentrant within the owning THREAD only
    (module docstring)."""
    path = _lease_path(store_dir, name)
    key = f"{os.path.abspath(store_dir)}::{name}"
    tid = threading.get_ident()
    with _held_mu:
        entry = _held.get(key)
        if entry is not None:
            if entry[2] == tid:
                entry[1] += 1
                return entry[0]
            raise StoreLockedError(
                f"store at {store_dir} has a live writer lease held by "
                f"another thread of this process (thread {entry[2]}): "
                "single writer per store by contract — a second "
                "concurrent writer would interleave journal writes. "
                "Nested writer calls re-enter only on the owning thread."
            )
    token = uuid.uuid4().hex
    body = json.dumps(
        {"pid": os.getpid(), "token": token, "acquired": time.time()}
    ).encode()
    for _ in range(8):  # bounded: each loop either acquires or raises
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, body)
            finally:
                os.close(fd)
            with _held_mu:
                _held[key] = [token, 1, tid]
            return token
        except FileExistsError:
            pass
        try:
            with open(path) as f:
                held = json.load(f)
            age = time.time() - os.stat(path).st_mtime
        except (FileNotFoundError, json.JSONDecodeError):
            continue  # holder released (or torn write) mid-check: retry
        if held.get("pid") == os.getpid():
            # a lease naming OUR OWN pid needs the in-process source of
            # truth consulted UNDER the mutex: if another thread holds
            # it, this is the concurrent-thread case (raise); if _held
            # lacks the key, the file is debris from a crashed call in
            # this very process (the file landed but the call died
            # before release) — reclaim immediately, else a crashed
            # writer would lock its own store until TTL
            with _held_mu:
                entry = _held.get(key)
                if entry is not None:
                    if entry[2] == tid:
                        entry[1] += 1
                        return entry[0]
                    raise StoreLockedError(
                        f"store at {store_dir} has a live writer lease "
                        f"held by another thread of this process "
                        f"(thread {entry[2]}): single writer per store "
                        "by contract."
                    )
            stale = True
        else:
            stale = age > ttl_seconds or not _pid_alive(held.get("pid"))
        if not stale:
            raise StoreLockedError(
                f"store at {store_dir} has a live writer lease "
                f"(pid {held.get('pid')}, age {age:.0f}s): single "
                "writer per store by contract — a second writer would "
                "corrupt the exactly-once journal. If the holder is "
                f"known dead, the lease goes stale after "
                f"{ttl_seconds:.0f}s and is stolen automatically."
            )
        # steal: exactly one stealer wins this rename; losers loop and
        # see the winner's fresh lease (or its released absence)
        tomb = f"{path}.stale-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(path, tomb)
        except FileNotFoundError:
            continue
        # TOCTOU guard (module docstring): between the staleness read
        # and the rename, the stale holder may have released and a NEW
        # writer acquired — then the tombstone is the new holder's LIVE
        # lease. Verify the token matches the lease we judged stale;
        # anything else (different token, or a body still mid-write by
        # its creator — the O_EXCL-then-write gap) is restored, not
        # removed. Restore via os.link, NOT rename: link refuses to
        # replace an existing path, so a third writer's fresh lease is
        # never clobbered (rename would silently overwrite it and admit
        # two believed-holders). In that double-race the kidnapped
        # lease stays dropped — the residual hazard of any advisory
        # lock, vastly narrower than the clobber it replaces.
        try:
            with open(tomb) as f:
                tomb_held = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            tomb_held = None
        if tomb_held is None or tomb_held.get("token") != held.get("token"):
            try:
                os.link(tomb, path)
            except OSError:
                pass  # a third writer re-created path first: never clobber
            os.remove(tomb)
            continue
        os.remove(tomb)
    raise StoreLockedError(
        f"store at {store_dir}: could not acquire the writer lease "
        "after repeated steals — lease churn suggests concurrent "
        "writers fighting; refusing to join the fight."
    )


def release(store_dir: str, token: str, name: str = _LEASE) -> None:
    """Release the lease if WE still hold it (a stolen-then-reissued
    lease belongs to the new holder and must not be removed). A
    reentrant hold only drops the file at depth 0."""
    path = _lease_path(store_dir, name)
    key = f"{os.path.abspath(store_dir)}::{name}"
    with _held_mu:
        entry = _held.get(key)
        if entry is not None and entry[0] == token:
            entry[1] -= 1
            if entry[1] > 0:
                return
            del _held[key]
    try:
        with open(path) as f:
            held = json.load(f)
        if held.get("token") == token:
            os.remove(path)
    except (FileNotFoundError, json.JSONDecodeError):
        pass


def guards_writer(fn):
    """Decorator for ``(spark, store_dir, ...)`` writer entries: hold
    the store's writer lease for the duration of the call."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark, store_dir, *args, **kwargs):
        token = acquire(store_dir)
        try:
            return fn(spark, store_dir, *args, **kwargs)
        finally:
            release(store_dir, token)

    return wrapper


class recovery_guard:
    """``with recovery_guard(store_dir):`` — serializes journal
    ROLL-FORWARD across processes and threads (r12 review): recovery
    executes filesystem writes (staged-file moves, whole-dir swaps,
    meta), and two processes replaying one journal concurrently could
    interleave a swap's rename pair destructively (one installs the
    new live dir, the other renames it to ``.old`` and the first's
    trailing rmtree deletes it — a live part gone with the journal
    retired). Writers already serialize on the writer lease, but
    READERS also roll pending journals forward and never take that
    lease, so recovery gets its own mutex. BLOCKING with a bounded
    poll (recovery is fast and rare): a waiter retries until the
    holder releases, the holder's pid dies, or the short TTL lapses —
    then re-checks whether a journal still exists before replaying."""

    def __init__(self, store_dir: str, timeout_seconds: float = 300.0):
        self.store_dir = store_dir
        self.timeout_seconds = timeout_seconds
        self._token: str | None = None

    def __enter__(self):
        deadline = time.time() + self.timeout_seconds
        while True:
            try:
                self._token = acquire(
                    self.store_dir, RECOVERY_TTL_SECONDS, name=RECOVERY_LOCK
                )
                return self
            except StoreLockedError:
                if time.time() > deadline:
                    raise
                time.sleep(0.05)

    def __exit__(self, *exc):
        if self._token is not None:
            release(self.store_dir, self._token, name=RECOVERY_LOCK)
        return False


class writer_lease:
    """``with writer_lease(store_dir):`` — the writer-entry guard."""

    def __init__(self, store_dir: str, ttl_seconds: float = LEASE_TTL_SECONDS):
        self.store_dir = store_dir
        self.ttl_seconds = ttl_seconds
        self._token: str | None = None

    def __enter__(self):
        self._token = acquire(self.store_dir, self.ttl_seconds)
        return self

    def __exit__(self, *exc):
        if self._token is not None:
            release(self.store_dir, self._token)
        return False
