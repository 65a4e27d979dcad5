"""Injectable coordination seam: HOW the index serializes root-meta
read-modify-writes and commits ``meta.json``.

The engine's concurrency story (single ingest writer + concurrent
maintenance + lock-free readers) rests on two primitives that every
writer goes through — ``dbsyncer_spark.index.build.meta_lock`` and
``atomic_write_meta``. Their default implementations are POSIX
(``fcntl.flock`` + rename-with-fsync), which is exactly right for a
driver-host-local index directory but does NOT transfer to NFS or
object-store-mounted deployments (flock is advisory-same-host; rename
atomicity and directory fsync vary) — the r3 VERDICT portability
caveat. This module makes the primitives injectable:

- ``FlockLock`` (default): same-host POSIX exclusive lock.
- ``LeaseFileLock``: an expiring lease file — needs only atomic
  create-if-absent + read-back from the store, with TTL-based steal for
  crashed holders and a settle-and-verify round to arbitrate concurrent
  stealers. The right shape for shared filesystems without flock; on a
  true object store, implement the same two-method interface against a
  catalog/lock service (e.g. a DynamoDB/ZooKeeper-style lease) instead.
- ``PosixRenameCommitter`` (default): json → tmp → fsync → rename →
  dir-fsync (crash-safe on POSIX).

Inject with ``set_lock_provider`` / ``set_meta_committer`` (process-
global, before opening the index). The engine holds the lock only for
pointer flips and staged-file moves (the expensive Spark rewrites run
OUTSIDE it, r4), so the 30 s default TTL is generous — and a heartbeat
renews the lease while held (r4), so even a stalled critical section
does not lose it unless the whole process freezes past the TTL.

Reference analog: DBSyncer serializes writer access per shard with an
in-process ReentrantReadWriteLock (``Shard.java:60-75``); a distributed
engine needs the inter-process equivalent, hence the seam.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
import uuid


class FlockLock:
    """Advisory inter-process exclusive lock via ``fcntl.flock`` —
    same-host POSIX only (the default; documented in ``meta_lock``)."""

    @contextlib.contextmanager
    def lock(self, index_dir: str):
        import fcntl  # lazy: POSIX-only; keeps the module importable elsewhere

        os.makedirs(index_dir, exist_ok=True)
        with open(os.path.join(index_dir, "meta.lock"), "w") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(fh, fcntl.LOCK_UN)


class LeaseFileLock:
    """Expiring lease-file lock for filesystems without flock semantics.

    Acquire = atomically create ``meta.lease`` (O_CREAT|O_EXCL) holding
    ``{token, ts}``. A live foreign lease (age <= ttl) is polled; an
    EXPIRED one is stolen by rename-replacing it. Because two stealers
    can replace back-to-back, every acquisition path ends with a
    settle-and-verify round: sleep ``settle_s``, re-read, and only the
    holder whose token survived owns the lock — the loser goes around.
    For that arbitration to be sound, ``settle_s`` must EXCEED a
    contender's worst-case steal latency (tmp write + fsync + rename):
    a second stealer that read the expired lease before our replace can
    still be mid-fsync when we verify, and its later rename would give
    two holders. The default is therefore ``ttl_s / 10`` (seconds-order
    for the 30 s default TTL, far above fsync latency on the slow
    shared filesystems this lock targets) — lower it only if the
    store's write+fsync tail is known to be shorter (r4 ADVICE).
    Release deletes the lease only if the token is still ours (a steal
    after OUR expiry must not be clobbered: the slow holder's release
    becomes a no-op and the work it committed past its TTL is the
    operator's signal to raise ``ttl_s``).

    While held, a daemon heartbeat refreshes ``ts`` every
    ``renew_every_s`` (default ttl/3) so a critical section longer than
    the TTL keeps the lease live instead of getting stolen mid-flip; the
    renewal rewrite is atomic (tmp + rename) and stops the moment the
    on-disk token is no longer ours. A heartbeat that stalls (fsync
    hang, VM pause) re-checks lease freshness AFTER the stall-prone tmp
    write and stands down rather than rename over a lease a contender
    may have legitimately stolen; it then settle-verifies its own
    renewal like ``_acquire`` does a steal. The residual unsafe window
    is a stall inside the rename syscall itself — irreducible without a
    store-side CAS. Pass ``renew_every_s=0`` to disable renewal
    and restore the plain ttl-must-exceed-section contract. Timestamps
    use wall clock (``time.time``) — hosts sharing a lease must be
    NTP-sane within the TTL, the standard lease caveat."""

    def __init__(self, ttl_s: float = 30.0, poll_s: float = 0.05,
                 settle_s: float | None = None, renew_every_s: float | None = None):
        self.ttl_s = ttl_s
        self.poll_s = poll_s
        # must exceed a contender's tmp-write+fsync+rename tail — see
        # class docstring; ttl/10 keeps it seconds-order by default
        self.settle_s = ttl_s / 10.0 if settle_s is None else settle_s
        self.renew_every_s = ttl_s / 3.0 if renew_every_s is None else renew_every_s

    def _read(self, path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (FileNotFoundError, ValueError):
            return None  # absent, or torn mid-write: caller retries

    def _write_json(self, path: str, payload: dict) -> None:
        with open(path, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())

    @contextlib.contextmanager
    def lock(self, index_dir: str):
        os.makedirs(index_dir, exist_ok=True)
        path = os.path.join(index_dir, "meta.lease")
        token = uuid.uuid4().hex
        self._acquire(path, token)
        stop = threading.Event()
        beat = None
        if self.renew_every_s and self.renew_every_s > 0:
            beat = threading.Thread(
                target=self._renew_loop, args=(path, token, stop), daemon=True
            )
            beat.start()
        try:
            yield
        finally:
            stop.set()
            if beat is not None:
                # bounded join: a heartbeat wedged in fsync on a hung
                # filesystem must not pin the holder in the with-block
                # forever. If it is still alive past the timeout we
                # proceed to release; a late renewal waking after that
                # re-checks stop + on-disk token ownership right before
                # its rename (see _renew_loop) and stands down, so it
                # cannot recreate a dead lease or clobber a successor —
                # up to the re-read-to-rename gap, the documented
                # CAS-less caveat.
                beat.join(timeout=self.renew_every_s + 1.0)
            self._release(path, token)

    def _renew_loop(self, path: str, token: str, stop: threading.Event) -> None:
        while not stop.wait(self.renew_every_s):
            cur = self._read(path)
            if cur is None or cur.get("token") != token:
                return  # lost the lease (stall past TTL): stand down
            expiry = float(cur.get("ts", 0)) + self.ttl_s
            if time.time() >= expiry:
                # already expired at read time: a contender may be
                # mid-steal — renewing could clobber their live lease
                return
            tmp = f"{path}.renew-{token}"
            self._write_json(tmp, {**cur, "ts": time.time()})
            # the tmp-file fsync above is the stall-prone step (slow
            # shared fs / VM pause): after it, re-verify EVERYTHING
            # before renaming — still within the ttl, not told to stop
            # (a wedge past lock-exit's bounded join means release
            # already ran: renewing now would recreate a dead lease, or
            # clobber a successor's live one), and the on-disk token is
            # still ours (a contender may have legitimately stolen an
            # expired lease during the stall, or a successor may have
            # O_EXCL-acquired after our release). The residual unsafe
            # window is the re-read-to-rename gap with no I/O in it —
            # same class as _acquire's steal replace; irreducible
            # without a store-side CAS, and settle-and-verify (below)
            # arbitrates when the OTHER side replaced after us.
            if stop.is_set() or time.time() >= expiry - self.settle_s:
                with contextlib.suppress(OSError):
                    os.remove(tmp)
                return  # released or too close to expiry: stand down
            # the ownership re-read is I/O on the possibly-hung store —
            # checked last, after the free short-circuits above
            ondisk = self._read(path)
            if (
                ondisk is None
                or ondisk.get("token") != token
            ):
                with contextlib.suppress(OSError):
                    os.remove(tmp)
                return  # not safely ours anymore: stand down
            os.replace(tmp, path)
            if self.settle_s:
                time.sleep(self.settle_s)
                cur = self._read(path)
                if cur is None or cur.get("token") != token:
                    return  # a concurrent stealer won the settle round

    def _acquire(self, path: str, token: str) -> None:
        while True:
            created = False
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    json.dump({"token": token, "ts": time.time()}, f)
                    f.flush()
                    os.fsync(f.fileno())
                created = True
            except FileExistsError:
                cur = self._read(path)
                if cur is None:
                    # vanished or torn between exists and read — retry
                    time.sleep(self.poll_s)
                    continue
                if time.time() - float(cur.get("ts", 0)) <= self.ttl_s:
                    time.sleep(self.poll_s)  # live holder — wait
                    continue
                # expired: steal via tmp + rename (atomic replace)
                tmp = f"{path}.steal-{token}"
                self._write_json(tmp, {
                    "token": token, "ts": time.time(),
                    "stolen_from": cur.get("token"),
                })
                os.replace(tmp, path)
            # settle-and-verify: a concurrent stealer may have replaced
            # right after us; only the surviving token owns the lock
            if not created or self.settle_s:
                time.sleep(self.settle_s)
            cur = self._read(path)
            if cur is not None and cur.get("token") == token:
                return

    def _release(self, path: str, token: str) -> None:
        cur = self._read(path)
        if cur is None or cur.get("token") != token:
            return  # stolen (or already gone) — no-op
        if time.time() - float(cur.get("ts", 0)) > self.ttl_s:
            # OUR lease already expired: a stealer may be mid-replace
            # between this read and an unlink — removing could delete
            # THEIR freshly-written live lease and let a third process
            # O_EXCL-create while they hold (review r4 TOCTOU). Leave
            # the expired file; the next acquirer steals it. (A live
            # lease can't be stolen, so the unlink below is safe up to
            # cross-host clock skew — the documented lease caveat.)
            return
        try:
            os.remove(path)
        except FileNotFoundError:
            pass


class InMemoryCasStore:
    """Reference implementation of the conditional-put (CAS) store
    interface ``CasLeaseLock`` needs — a thread-safe versioned KV. Each
    successful write bumps an opaque monotone version; conditional
    operations succeed only when the caller's expected version still
    matches. This is exactly the primitive real object stores expose:

    - ``put_if_absent``  = S3 ``If-None-Match: *`` conditional PUT /
      GCS ``ifGenerationMatch=0`` / DynamoDB ``attribute_not_exists``
    - ``put_if_version`` = S3 ``If-Match: <etag>`` conditional PUT /
      GCS ``ifGenerationMatch=<generation>`` / DynamoDB conditional
      update on a version attribute / etcd compare-and-swap
    - ``delete_if_version`` = the conditional DELETE analogs

    An adapter to one of those services implements these three methods
    (plus ``get``) and the whole lease protocol transfers unchanged.
    ``delay_before_commit``: optional test hook — called as
    ``(op_name, key)`` before a conditional write takes the store lock,
    to script race interleavings deterministically."""

    def __init__(self, delay_before_commit=None):
        self._kv: dict[str, tuple[dict, int]] = {}
        self._mu = threading.Lock()
        self._next = 0
        self.delay_before_commit = delay_before_commit

    def get(self, key: str):
        """-> (value, version) or None."""
        with self._mu:
            got = self._kv.get(key)
            return (dict(got[0]), got[1]) if got else None

    def _commit(self, key: str, value: dict) -> int:
        self._next += 1
        self._kv[key] = (dict(value), self._next)
        return self._next

    def put_if_absent(self, key: str, value: dict):
        """-> new version, or None if the key exists."""
        if self.delay_before_commit:
            self.delay_before_commit("put_if_absent", key)
        with self._mu:
            if key in self._kv:
                return None
            return self._commit(key, value)

    def put_if_version(self, key: str, value: dict, expected: int):
        """-> new version, or None if the key's version moved (or the
        key vanished) since ``expected`` was read — the CAS reject that
        makes concurrent steals race-free."""
        if self.delay_before_commit:
            self.delay_before_commit("put_if_version", key)
        with self._mu:
            got = self._kv.get(key)
            if got is None or got[1] != expected:
                return None
            return self._commit(key, value)

    def delete_if_version(self, key: str, expected: int) -> bool:
        with self._mu:
            got = self._kv.get(key)
            if got is None or got[1] != expected:
                return False
            del self._kv[key]
            return True


class CasLeaseLock:
    """Expiring lease over a conditional-put store — the third lock
    backend (r4 VERDICT #4), closing ``LeaseFileLock``'s residual
    windows. Rename-based stealing has an irreducible no-I/O
    read-to-replace gap (two stealers can both believe they won;
    settle-and-verify only arbitrates when the timing assumptions hold —
    r4 ADVICE showed a slow write can outlive any fixed settle window).
    With CAS there is no gap to arbitrate: every transition — steal,
    renewal, release — is conditioned on the exact version the holder
    last observed, so the store itself rejects the loser:

    - acquire: ``put_if_absent``; a live foreign lease is polled; an
      expired one is replaced with ``put_if_version(expected=read
      version)`` — of N concurrent stealers exactly one CAS succeeds.
    - renewal heartbeat: ``put_if_version(expected=our version)`` — a
      legitimate steal of our expired lease moved the version, so a
      stalled renewal CANNOT clobber the successor (the lease lock's
      stand-down heuristics become store-enforced).
    - release: ``delete_if_version(our version)`` — no expiry TOCTOU:
      deleting our own expired-but-unstolen lease is safe because any
      in-flight stealer's CAS expected that same version and now fails
      over to a fresh ``put_if_absent``.

    The store is injected (see ``InMemoryCasStore`` for the interface
    and its S3/GCS/DynamoDB mapping); ``key_of`` maps an index dir to
    its lease key (override when one store serves many indexes). Wall-
    clock TTL caveats still apply (NTP-sane hosts), but correctness of
    mutual exclusion no longer depends on clocks or settle timing —
    clocks only bound how fast a crashed holder's lease is reclaimed."""

    def __init__(self, store, ttl_s: float = 30.0, poll_s: float = 0.05,
                 renew_every_s: float | None = None):
        self.store = store
        self.ttl_s = ttl_s
        self.poll_s = poll_s
        self.renew_every_s = ttl_s / 3.0 if renew_every_s is None else renew_every_s

    @staticmethod
    def key_of(index_dir: str) -> str:
        return os.path.join(index_dir, "meta.lease")

    @contextlib.contextmanager
    def lock(self, index_dir: str):
        key = self.key_of(index_dir)
        token = uuid.uuid4().hex
        state = {"ver": self._acquire(key, token)}
        stop = threading.Event()
        beat = None
        if self.renew_every_s and self.renew_every_s > 0:
            beat = threading.Thread(
                target=self._renew_loop, args=(key, token, state, stop),
                daemon=True,
            )
            beat.start()
        try:
            yield
        finally:
            stop.set()
            if beat is not None:
                beat.join(timeout=self.renew_every_s + 1.0)
            # release: read-then-conditional-delete. The read pins the
            # exact (token, version) we delete; any interleaved steal of
            # an expired lease moves the version and the delete becomes
            # a store-enforced no-op — unlike the rename lock, this
            # needs no expiry heuristic to be TOCTOU-safe
            cur = self.store.get(key)
            if cur is not None and cur[0].get("token") == token:
                self.store.delete_if_version(key, cur[1])

    def _acquire(self, key: str, token: str) -> int:
        while True:
            ver = self.store.put_if_absent(
                key, {"token": token, "ts": time.time()}
            )
            if ver is not None:
                return ver
            cur = self.store.get(key)
            if cur is None:
                continue  # deleted between the put and the get — retry
            val, cur_ver = cur
            if time.time() - float(val.get("ts", 0)) <= self.ttl_s:
                time.sleep(self.poll_s)  # live holder — wait
                continue
            ver = self.store.put_if_version(
                key,
                {"token": token, "ts": time.time(),
                 "stolen_from": val.get("token")},
                cur_ver,
            )
            if ver is not None:
                return ver  # our CAS won; every concurrent stealer lost
            # version moved: someone else stole (or the holder renewed/
            # released) — loop and re-evaluate from the fresh state

    def _renew_loop(self, key: str, token: str, state: dict,
                    stop: threading.Event) -> None:
        while not stop.wait(self.renew_every_s):
            if stop.is_set():
                return
            ver = self.store.put_if_version(
                key, {"token": token, "ts": time.time()}, state["ver"]
            )
            if ver is None:
                return  # version moved: stolen after expiry — stand down
            state["ver"] = ver


class PosixRenameCommitter:
    """Default root-meta commit: json to a tmp file, fsync, atomic
    rename, directory fsync (see ``atomic_write_meta`` — r3 crash
    analysis). Subclass/replace for stores without rename atomicity
    (e.g. write-new-object + pointer swap in a catalog)."""

    def load(self, index_dir: str) -> dict | None:
        """Read root meta as the first half of a lock-held
        read-modify-write (``read_meta_for_update``); None = not built
        yet. The plain committer just reads the file — fenced backends
        override this to pin a version alongside."""
        root = os.path.join(index_dir, "meta.json")
        if not os.path.exists(root):
            return None
        with open(root) as f:
            return json.load(f)

    def commit(self, index_dir: str, meta: dict) -> None:
        root = os.path.join(index_dir, "meta.json")
        tmp = root + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, root)
        try:
            dfd = os.open(index_dir, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass  # directory fsync unsupported on some filesystems


class StaleMetaCommit(RuntimeError):
    """A fenced commit lost: the store's fence version moved between
    this writer's ``load()`` and its ``commit()`` — a successor already
    committed (the classic paused-holder/zombie-writer schedule). The
    caller's mutation was computed from a stale snapshot and MUST NOT
    be retried blindly; re-enter the read-modify-write from a fresh
    ``read_meta_for_update``."""


class CasFencedCommitter:
    """Version-fenced root-meta commits over the same conditional-put
    store interface ``CasLeaseLock`` uses — the second half of the
    object-store concurrency story.

    A lease lock (even the CAS one) guarantees at most one LIVE holder,
    but it cannot stop a holder that already entered the critical
    section, paused past its TTL (GC stall, VM freeze), and woke after
    a successor stole the lease and committed: the zombie's
    ``atomic_write_meta`` still lands and silently erases the
    successor's update. The fence closes exactly that window at the
    store instead of at the clock:

    - ``load()`` (every lock-held read-modify-write calls it via
      ``read_meta_for_update``) reads the fence record and PINS its
      version (creating it with ``put_if_absent`` on first contact);
    - ``commit()`` first advances the fence with
      ``put_if_version(expected=pinned)`` and only then delegates the
      data-plane write to the inner committer (default
      ``PosixRenameCommitter``). The zombie's commit carries the stale
      pinned version, the store rejects it, and the lost update becomes
      a loud ``StaleMetaCommit`` with nothing written.

    Crash between fence-advance and inner write: meta is simply
    unchanged (the fence is a counter, not a content hash) — the
    writer's unpublished segment dirs are reclaimed by the orphan
    sweep, same as any pre-publish crash. Store mapping is the
    ``InMemoryCasStore`` table (S3 ``If-Match`` / GCS
    ``ifGenerationMatch`` / DynamoDB conditional update). Writers are
    serialized by the meta lock, so per-index pins need no finer
    granularity than this process-global map.

    Pins are a per-index LIFO STACK, not a single slot: each
    ``commit()`` consumes the pin of ITS OWN ``load()``. A single
    shared slot would let an interleaved inner load/commit cycle on the
    same index (e.g. reentry through a TTL-stolen lease) re-pin the
    outer writer to the ADVANCED version, so the outer stale commit
    would pass the fence — the exact lost update the fence exists to
    reject (r5 review). With the stack the outer commit carries its own
    stale pin and dies loudly as ``StaleMetaCommit``. Consequence:
    every commit must be preceded by its own ``read_meta_for_update``
    (which is the documented RMW contract and how every engine path
    behaves); aborted RMWs (load without commit — e.g. a no-op
    ``maybe_merge``) leave a dead entry behind, bounded by the cap."""

    _PIN_STACK_CAP = 8

    def __init__(self, store, inner=None):
        self.store = store
        self.inner = inner if inner is not None else PosixRenameCommitter()
        self._pins: dict[str, list[int]] = {}
        self._mu = threading.Lock()

    @staticmethod
    def key_of(index_dir: str) -> str:
        return os.path.join(index_dir, "meta.fence")

    def load(self, index_dir: str) -> dict | None:
        key = self.key_of(index_dir)
        cur = self.store.get(key)
        if cur is None:
            ver = self.store.put_if_absent(key, {"init": time.time()})
            if ver is None:  # lost the init race — someone else created it
                cur = self.store.get(key)
                if cur is None:  # created AND deleted underneath — retry
                    return self.load(index_dir)
                ver = cur[1]
        else:
            ver = cur[1]
        with self._mu:
            st = self._pins.setdefault(index_dir, [])
            st.append(ver)
            if len(st) > self._PIN_STACK_CAP:  # abandoned-RMW leftovers
                del st[0]
        return self.inner.load(index_dir)

    def commit(self, index_dir: str, meta: dict) -> None:
        key = self.key_of(index_dir)
        with self._mu:
            st = self._pins.get(index_dir)
            pinned = st.pop() if st else None
        if pinned is None:
            raise RuntimeError(
                "CasFencedCommitter.commit without a prior load() — route "
                "read-modify-writes through read_meta_for_update so the "
                "fence version is pinned at read time"
            )
        new_ver = self.store.put_if_version(
            key, {"committed": time.time()}, pinned
        )
        if new_ver is None:
            raise StaleMetaCommit(
                f"meta fence for {index_dir} moved past version {pinned}: "
                "a successor committed while this writer was paused — "
                "its snapshot is stale and was NOT written"
            )
        self.inner.commit(index_dir, meta)


_lock_provider = FlockLock()
_meta_committer = PosixRenameCommitter()


def set_lock_provider(provider) -> None:
    """Process-global injection of the meta-lock implementation (an
    object with ``lock(index_dir)`` returning a context manager). Call
    before any index writer runs; every writer in the process shares it."""
    global _lock_provider
    _lock_provider = provider


def get_lock_provider():
    return _lock_provider


def set_meta_committer(committer) -> None:
    """Process-global injection of the root-meta commit implementation
    (an object with ``commit(index_dir, meta)``)."""
    global _meta_committer
    _meta_committer = committer


def get_meta_committer():
    return _meta_committer
