"""Injectable lock/commit seam (r3 VERDICT #5 / next-round #8): lease
expiry + steal semantics, mutual exclusion, and that build.meta_lock /
atomic_write_meta actually route through the injected implementations."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest

from dbsyncer_spark.index import coordination as co
from dbsyncer_spark.index.build import atomic_write_meta, meta_lock


def test_lease_roundtrip(tmp_path):
    d = str(tmp_path)
    lk = co.LeaseFileLock(ttl_s=5.0, settle_s=0.0)
    with lk.lock(d):
        lease = json.load(open(os.path.join(d, "meta.lease")))
        assert lease["token"]
    assert not os.path.exists(os.path.join(d, "meta.lease"))


def test_lease_mutual_exclusion(tmp_path):
    d = str(tmp_path)
    lk = co.LeaseFileLock(ttl_s=10.0, poll_s=0.005, settle_s=0.002)
    inside = []
    errors = []

    def worker(i):
        try:
            for _ in range(5):
                with lk.lock(d):
                    inside.append(i)
                    assert len(inside) == 1, "two holders inside the lease"
                    time.sleep(0.003)
                    inside.pop()
        except AssertionError as e:  # surfaced below
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors


def test_lease_expiry_steal(tmp_path):
    d = str(tmp_path)
    path = os.path.join(d, "meta.lease")
    # a crashed holder left an EXPIRED lease behind
    with open(path, "w") as f:
        json.dump({"token": "dead-holder", "ts": time.time() - 100}, f)
    lk = co.LeaseFileLock(ttl_s=1.0, settle_s=0.0)
    t0 = time.time()
    with lk.lock(d):
        cur = json.load(open(path))
        assert cur["token"] != "dead-holder"
        assert cur.get("stolen_from") == "dead-holder"
    assert time.time() - t0 < 1.0, "steal must not wait a full TTL"


def test_lease_blocks_until_foreign_expiry(tmp_path):
    d = str(tmp_path)
    path = os.path.join(d, "meta.lease")
    with open(path, "w") as f:
        json.dump({"token": "live-holder", "ts": time.time()}, f)
    lk = co.LeaseFileLock(ttl_s=0.4, poll_s=0.02, settle_s=0.0)
    t0 = time.time()
    with lk.lock(d):
        waited = time.time() - t0
    assert waited >= 0.3, f"acquired a LIVE foreign lease after {waited}s"


def test_slow_holder_release_is_noop_after_steal(tmp_path):
    d = str(tmp_path)
    path = os.path.join(d, "meta.lease")
    lk = co.LeaseFileLock(ttl_s=5.0, settle_s=0.0)
    lk._acquire(path, "slow-holder")
    # the slow holder's lease expired and a thief replaced it
    with open(path, "w") as f:
        json.dump({"token": "thief", "ts": time.time()}, f)
    lk._release(path, "slow-holder")
    assert json.load(open(path))["token"] == "thief", \
        "release after a steal must not clobber the thief's lease"


def test_lease_renewal_survives_long_critical_section(tmp_path):
    """A critical section LONGER than the TTL keeps the lock: the
    heartbeat (ttl/3) refreshes ts, so a polling contender never steals
    a held lease (the r4 renewal fix for the ttl-bounds-section caveat)."""
    d = str(tmp_path)
    path = os.path.join(d, "meta.lease")
    # generous ttl vs renew cadence: each heartbeat fsyncs, and shared-
    # host disk latency can spike past 200 ms (see bench notes) — a
    # sub-second ttl races the scheduler, not the property under test
    lk = co.LeaseFileLock(ttl_s=1.5, poll_s=0.05, settle_s=0.0,
                          renew_every_s=0.2)
    acquired = []

    def contender():
        with lk.lock(d):
            acquired.append(time.time())

    th = threading.Thread(target=contender)
    released_at = None
    with lk.lock(d):
        th.start()
        time.sleep(3.5)  # > 2x TTL inside the section
        assert not acquired, "contender stole a renewed (live) lease"
        assert time.time() - json.load(open(path))["ts"] <= 1.5, \
            "heartbeat did not refresh the lease ts"
        released_at = time.time()
    th.join()
    assert acquired and acquired[0] >= released_at


def test_lease_renewal_disabled_restores_ttl_contract(tmp_path):
    """renew_every_s=0 opts out: a section longer than the TTL is
    stealable again (the documented pre-renewal contract)."""
    d = str(tmp_path)
    lk = co.LeaseFileLock(ttl_s=0.2, poll_s=0.01, settle_s=0.0, renew_every_s=0)
    stolen = []

    def contender():
        with lk.lock(d):
            stolen.append(time.time())

    th = threading.Thread(target=contender)
    with lk.lock(d):
        th.start()
        time.sleep(0.6)
        assert stolen, "expired un-renewed lease was not stolen"
    th.join()


def test_meta_lock_and_commit_route_through_injected_seam(tmp_path):
    d = str(tmp_path)
    committed = []

    class RecordingCommitter(co.PosixRenameCommitter):
        def commit(self, index_dir, meta):
            committed.append(dict(meta))
            super().commit(index_dir, meta)

    old_lock, old_commit = co.get_lock_provider(), co.get_meta_committer()
    co.set_lock_provider(co.LeaseFileLock(ttl_s=5.0, settle_s=0.0))
    co.set_meta_committer(RecordingCommitter())
    try:
        with meta_lock(d):
            assert os.path.exists(os.path.join(d, "meta.lease")), \
                "meta_lock must use the injected lease provider"
            atomic_write_meta(d, {"segments": {}, "params": {"x": 1}})
    finally:
        co.set_lock_provider(old_lock)
        co.set_meta_committer(old_commit)
    assert committed and committed[0]["params"] == {"x": 1}
    assert json.load(open(os.path.join(d, "meta.json")))["params"] == {"x": 1}
    # defaults restored: flock path works again
    with meta_lock(d):
        assert os.path.exists(os.path.join(d, "meta.lock"))


def test_release_after_own_expiry_leaves_lease(tmp_path):
    """review r4 TOCTOU: a holder releasing PAST its TTL must not unlink
    (a stealer may be mid-replace); the expired file is left for the
    next acquirer to steal."""
    d = str(tmp_path)
    path = os.path.join(d, "meta.lease")
    lk = co.LeaseFileLock(ttl_s=0.2, settle_s=0.0)
    lk._acquire(path, "slow")
    time.sleep(0.3)  # lease expires while "working"
    lk._release(path, "slow")
    assert os.path.exists(path), "expired-own-lease release must be a no-op"
    # and the next acquirer steals it cleanly
    with lk.lock(d):
        assert json.load(open(path))["token"] != "slow"


def test_renew_stands_down_after_stall_past_expiry(tmp_path):
    """A heartbeat that stalls past the lease expiry INSIDE the tmp-file
    write (the fsync is the stall-prone step) must NOT rename over the
    lease — a contender may have legitimately stolen it during the
    stall. The post-write freshness re-check stands down instead."""
    d = str(tmp_path)
    path = os.path.join(d, "meta.lease")
    lk = co.LeaseFileLock(ttl_s=0.3, poll_s=0.01, settle_s=0.0,
                          renew_every_s=0.05)
    orig_write = lk._write_json

    def stalling_write(p, payload):
        orig_write(p, payload)
        if ".renew-" in p:
            time.sleep(0.5)  # stall past ttl_s AFTER writing the tmp

    lk._write_json = stalling_write
    lk._acquire(path, "holder")
    stop = threading.Event()
    beat = threading.Thread(
        target=lk._renew_loop, args=(path, "holder", stop), daemon=True)
    beat.start()
    time.sleep(0.15)  # let one heartbeat enter the stall window
    # a contender steals the (by now expired) lease mid-stall
    time.sleep(0.3)
    lk._write_json = orig_write  # thief's own writes are not stalled
    lk._acquire(path, "thief")
    beat.join(timeout=2.0)
    assert not beat.is_alive(), "heartbeat must stand down, not loop"
    cur = json.load(open(path))
    assert cur["token"] == "thief", \
        "stalled renewal must not clobber a stolen live lease"
    assert not os.path.exists(f"{path}.renew-holder"), \
        "abandoned renewal tmp file must be cleaned up"


def test_renew_stands_down_on_expired_read(tmp_path):
    """A heartbeat waking to an ALREADY-expired own lease must stand
    down without renewing: a stealer may be mid-replace."""
    d = str(tmp_path)
    path = os.path.join(d, "meta.lease")
    lk = co.LeaseFileLock(ttl_s=0.1, settle_s=0.0, renew_every_s=0.25)
    lk._acquire(path, "holder")
    stop = threading.Event()
    beat = threading.Thread(
        target=lk._renew_loop, args=(path, "holder", stop), daemon=True)
    beat.start()  # first wake at t=0.25 > ttl=0.1: lease already expired
    beat.join(timeout=2.0)
    assert not beat.is_alive()
    assert json.load(open(path))["ts"] + 0.1 < time.time(), \
        "expired lease must not have been renewed"


def test_wedged_renewal_cannot_clobber_successor(tmp_path):
    """review r4 second pass: a heartbeat wedged in its tmp write past
    lock-exit's bounded join (but well before the TTL) must not rename
    after release + a successor's O_EXCL acquire — the pre-rename
    re-read sees the successor's token and stands down."""
    d = str(tmp_path)
    path = os.path.join(d, "meta.lease")
    lk = co.LeaseFileLock(ttl_s=10.0, poll_s=0.01, settle_s=0.0,
                          renew_every_s=0.05)
    join_timeout = lk.renew_every_s + 1.0  # LeaseFileLock.lock's bound
    orig_write = lk._write_json

    def stalling_write(p, payload):
        orig_write(p, payload)
        if ".renew-" in p:
            time.sleep(join_timeout + 0.55)  # wedge past the bounded join

    lk._write_json = stalling_write
    t0 = time.time()
    with lk.lock(d):
        time.sleep(0.2)  # let the heartbeat enter the wedge
    exited = time.time() - t0
    # bounded path is >= 0.2 + join_timeout by construction; generous
    # slack for shared-host scheduling/fsync noise (must still exit
    # well before the wedge ends)
    assert exited < join_timeout + 0.5, f"lock exit not bounded: {exited:.2f}s"
    lk._write_json = orig_write
    # release ran (token was ours and fresh) -> lease gone; successor
    # acquires immediately
    lk._acquire(path, "successor")
    # wait past the wedge's end for the heartbeat to resume + stand down
    time.sleep(join_timeout + 1.0)
    assert json.load(open(path))["token"] == "successor", \
        "wedged renewal clobbered the successor's live lease"
    assert not any(f.startswith("meta.lease.renew-")
                   for f in os.listdir(d)), "renewal tmp not cleaned up"


def test_settle_default_scales_with_ttl():
    """r4 ADVICE: the settle-and-verify window must exceed a contender's
    steal write+fsync tail; a fixed 20 ms default was smaller than slow
    shared-fs fsync latency. Default is ttl/10, explicit values win."""
    assert co.LeaseFileLock(ttl_s=30.0).settle_s == 3.0
    assert co.LeaseFileLock(ttl_s=1.0).settle_s == 0.1
    assert co.LeaseFileLock(ttl_s=30.0, settle_s=0.5).settle_s == 0.5
    assert co.LeaseFileLock(ttl_s=30.0, settle_s=0.0).settle_s == 0.0


# ---------------------------------------------------------------------------
# CAS backend (r4 VERDICT #4): the steal race rename-based leases cannot
# close, demonstrated failing under LeaseFileLock timing assumptions and
# store-rejected under CasLeaseLock on the SAME schedule.
# ---------------------------------------------------------------------------

class _SlowStealLease(co.LeaseFileLock):
    """LeaseFileLock whose STEAL tmp-write takes ``delay`` seconds — the
    slow-shared-fs contender of the r4 ADVICE scenario."""

    def __init__(self, delay: float, **kw):
        super().__init__(**kw)
        self._delay = delay

    def _write_json(self, path, payload):
        if ".steal-" in path:
            time.sleep(self._delay)
        super()._write_json(path, payload)


def _overlap_of(lock_a, lock_b, d: str, hold_s: float) -> int:
    """Run two named contenders through lk.lock(d); return the max
    number of simultaneous holders observed."""
    state = {"cur": 0, "max": 0}
    mu = threading.Lock()
    errs: list = []

    def run(lk):
        try:
            with lk.lock(d):
                with mu:
                    state["cur"] += 1
                    state["max"] = max(state["max"], state["cur"])
                time.sleep(hold_s)
                with mu:
                    state["cur"] -= 1
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    ta = threading.Thread(target=run, args=(lock_a,), name="A")
    tb = threading.Thread(target=run, args=(lock_b,), name="B")
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errs, errs
    return state["max"]


def _schedule() -> dict:
    """One shared schedule: both contenders read the same EXPIRED lease,
    A's steal write commits at ~0.15 s, B's slow write at ~1.0 s — after
    A's settle-verify has already passed."""
    return {"A": 0.15, "B": 1.0}


def test_lease_steal_race_double_holds_without_cas(tmp_path):
    """The documented rename-lock hazard, reproduced deterministically:
    B's steal write outlives A's settle window (settle_s=0.1 < B's 1.0 s
    write), so BOTH contenders verify their own token and hold at once.
    This is the exact failure mode the CAS backend closes — kept as a
    characterization test so the hazard stays documented-by-execution
    (with the r4-ADVICE default settle_s=ttl/10 this needs a write
    slower than the window; any fixed window has such a write)."""
    d = str(tmp_path)
    with open(os.path.join(d, "meta.lease"), "w") as f:
        json.dump({"token": "crashed", "ts": time.time() - 999}, f)
    sched = _schedule()
    a = _SlowStealLease(sched["A"], ttl_s=2.0, settle_s=0.1, renew_every_s=0)
    b = _SlowStealLease(sched["B"], ttl_s=2.0, settle_s=0.1, renew_every_s=0)
    assert _overlap_of(a, b, d, hold_s=1.6) == 2, \
        "schedule no longer reproduces the rename-steal double-hold"


class _CountingStore(co.InMemoryCasStore):
    def __init__(self, delay_before_commit=None):
        super().__init__(delay_before_commit)
        self.cas_rejects = 0

    def put_if_version(self, key, value, expected):
        got = super().put_if_version(key, value, expected)
        if got is None:
            self.cas_rejects += 1
        return got


def test_cas_backend_single_holder_on_same_schedule(tmp_path):
    """Same interleaving, CAS store: B's slow conditional put carries
    the version it read BEFORE A's steal committed, so the store rejects
    it — exactly one holder, no settle heuristics involved."""
    d = str(tmp_path)
    sched = _schedule()

    def delay(op, key):
        if op == "put_if_version":
            time.sleep(sched.get(threading.current_thread().name, 0.0))

    store = _CountingStore(delay_before_commit=delay)
    key = co.CasLeaseLock.key_of(d)
    assert store.put_if_absent(
        key, {"token": "crashed", "ts": time.time() - 999}) is not None
    a = co.CasLeaseLock(store, ttl_s=2.0, poll_s=0.05, renew_every_s=0)
    b = co.CasLeaseLock(store, ttl_s=2.0, poll_s=0.05, renew_every_s=0)
    assert _overlap_of(a, b, d, hold_s=1.6) == 1
    assert store.cas_rejects >= 1, \
        "B never hit the stale-version reject the schedule scripts"
    assert store.get(key) is None, "release left the lease behind"


def test_cas_lock_basics_and_renewal(tmp_path):
    """Functional pass: mutual exclusion under contention, crashed-holder
    steal after TTL, heartbeat renewal keeping a long section alive, and
    engine integration through the injectable seam."""
    d = str(tmp_path)
    store = co.InMemoryCasStore()
    key = co.CasLeaseLock.key_of(d)
    # crashed holder: expired lease is stolen after at most ~ttl
    assert store.put_if_absent(
        key, {"token": "crashed", "ts": time.time() - 999}) is not None
    lk = co.CasLeaseLock(store, ttl_s=0.3, poll_s=0.02)
    t0 = time.time()
    with lk.lock(d):
        assert store.get(key)[0]["token"] != "crashed"
    assert time.time() - t0 < 2.0
    # renewal: hold far past the TTL; a contender must NOT get in
    lk_fast = co.CasLeaseLock(store, ttl_s=0.2, poll_s=0.01,
                              renew_every_s=0.05)
    got_in = threading.Event()

    def contender():
        with co.CasLeaseLock(store, ttl_s=0.2, poll_s=0.01).lock(d):
            got_in.set()

    with lk_fast.lock(d):
        t = threading.Thread(target=contender, daemon=True)
        t.start()
        time.sleep(0.8)  # 4x TTL — without renewal the lease gets stolen
        assert not got_in.is_set(), "contender entered while held"
    t.join(timeout=2.0)
    assert got_in.is_set(), "contender starved after release"
    # seam integration: the engine's meta_lock/atomic_write_meta go
    # through the injected provider
    prev = co.get_lock_provider()
    co.set_lock_provider(co.CasLeaseLock(store, ttl_s=5.0))
    try:
        with meta_lock(d):
            atomic_write_meta(d, {"params": {}, "segments": {}})
        assert json.load(open(os.path.join(d, "meta.json"))) == {
            "params": {}, "segments": {}}
        assert store.get(key) is None
    finally:
        co.set_lock_provider(prev)


# ---------------------------------------------------------------------------
# CasFencedCommitter: version-fenced commits (the zombie-writer close-out)
# ---------------------------------------------------------------------------


def test_fenced_commit_normal_cycle(tmp_path):
    d = str(tmp_path)
    store = co.InMemoryCasStore()
    c = co.CasFencedCommitter(store)
    assert c.load(d) is None  # not built yet — still pins the fence
    c.commit(d, {"segments": {}, "params": {"v": 1}})
    assert c.load(d)["params"] == {"v": 1}
    c.commit(d, {"segments": {}, "params": {"v": 2}})
    assert json.load(open(os.path.join(d, "meta.json")))["params"] == {"v": 2}


def test_fenced_commit_requires_load(tmp_path):
    c = co.CasFencedCommitter(co.InMemoryCasStore())
    with pytest.raises(RuntimeError, match="prior load"):
        c.commit(str(tmp_path), {"segments": {}})


def test_fenced_commit_rejects_zombie_writer(tmp_path):
    """The schedule no lock can stop: writer A enters the critical
    section and pauses; its lease expires; successor B steals, runs its
    own read-modify-write, commits; A wakes and commits its stale
    mutation. Under the plain committer A's write lands and erases B's
    (characterized below); under the fence the store rejects A and B's
    meta survives."""
    d = str(tmp_path)
    store = co.InMemoryCasStore()
    c = co.CasFencedCommitter(store)
    c.load(d)
    c.commit(d, {"segments": {}, "params": {}, "owner": "init"})

    a = co.CasFencedCommitter(store)   # zombie writer (own process/pins)
    b = co.CasFencedCommitter(store)   # successor
    meta_a = dict(a.load(d) or {}, owner="A")   # A reads, then pauses
    meta_b = dict(b.load(d) or {}, owner="B")   # B steals + commits
    b.commit(d, meta_b)
    with pytest.raises(co.StaleMetaCommit):     # A wakes — store-rejected
        a.commit(d, meta_a)
    assert json.load(open(os.path.join(d, "meta.json")))["owner"] == "B"
    # characterization: the unfenced default committer CANNOT stop A
    co.PosixRenameCommitter().commit(d, meta_a)
    assert json.load(open(os.path.join(d, "meta.json")))["owner"] == "A"


def test_fenced_commit_through_engine_seam(tmp_path):
    """write_meta_locked routes its read through committer.load, so the
    fence pins at read time and a successor's interleaved commit turns
    the stale write into StaleMetaCommit with nothing written."""
    from dbsyncer_spark.index.build import write_meta_locked

    d = str(tmp_path)
    store = co.InMemoryCasStore()
    prev = co.get_meta_committer()
    co.set_meta_committer(co.CasFencedCommitter(store))
    try:
        with meta_lock(d):
            co.get_meta_committer().load(d)
            atomic_write_meta(d, {"segments": {}, "params": {}, "n": 0})

        def steal_then_mutate(fresh):
            # while the engine's RMW holds its snapshot, a successor
            # (different pins) lands its own fenced commit
            succ = co.CasFencedCommitter(store)
            succ.load(d)
            succ.commit(d, {"segments": {}, "params": {}, "n": 99})
            return dict(fresh, n=fresh["n"] + 1)

        with pytest.raises(co.StaleMetaCommit):
            write_meta_locked(d, steal_then_mutate)
        assert json.load(open(os.path.join(d, "meta.json")))["n"] == 99, \
            "the zombie's stale mutation overwrote the successor"
        # and a clean retry from a fresh read succeeds
        write_meta_locked(d, lambda m: dict(m, n=m["n"] + 1))
        assert json.load(open(os.path.join(d, "meta.json")))["n"] == 100
    finally:
        co.set_meta_committer(prev)


def test_fenced_commit_same_instance_interleave(tmp_path):
    """Same committer INSTANCE, nested load/commit cycle on the same
    index (the shape reentry through a TTL-stolen lease would produce):
    with a single shared pin slot the inner cycle re-pins the outer
    writer to the advanced fence version and the outer stale commit
    PASSES the fence — the exact lost update the fence exists to
    reject. The per-index pin stack makes the outer commit carry its
    own pin and die loudly (r5 review)."""
    d = str(tmp_path)
    store = co.InMemoryCasStore()
    c = co.CasFencedCommitter(store)
    c.load(d)
    c.commit(d, {"segments": {}, "params": {}, "owner": "init"})
    outer = dict(c.load(d) or {}, owner="outer")  # outer RMW begins
    inner = dict(c.load(d) or {}, owner="inner")  # nested cycle lands
    c.commit(d, inner)
    with pytest.raises(co.StaleMetaCommit):
        c.commit(d, outer)
    assert json.load(open(os.path.join(d, "meta.json")))["owner"] == "inner"


def test_fenced_commit_aborted_rmw_pins_stay_bounded(tmp_path):
    """load-without-commit is a normal engine path (a no-op maybe_merge
    aborts its RMW); the dead pins it leaves must stay bounded and must
    not poison the next proper cycle."""
    d = str(tmp_path)
    c = co.CasFencedCommitter(co.InMemoryCasStore())
    for _ in range(50):
        c.load(d)
    assert len(c._pins[d]) <= c._PIN_STACK_CAP
    c.commit(d, {"segments": {}, "params": {}, "n": 1})
    assert json.load(open(os.path.join(d, "meta.json")))["n"] == 1


def test_commit_only_committer_still_loads(tmp_path):
    """A committer installed through the documented commit-only seam
    (the pre-r5 contract exposed only ``commit``) must not crash every
    lock-held read: read_meta_for_update falls back to the default
    POSIX read when the object has no ``load`` (r5 review)."""
    from dbsyncer_spark.index.build import read_meta_for_update

    class CommitOnly:
        def commit(self, index_dir, meta):
            co.PosixRenameCommitter().commit(index_dir, meta)

    d = str(tmp_path)
    prev = co.get_meta_committer()
    co.set_meta_committer(CommitOnly())
    try:
        assert read_meta_for_update(d) is None
        atomic_write_meta(d, {"segments": {}, "params": {}, "n": 7})
        assert read_meta_for_update(d)["n"] == 7
    finally:
        co.set_meta_committer(prev)
