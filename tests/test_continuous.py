"""Continuous-batching engine: token-parity with the static engine, slot
reuse, streaming chunk callbacks."""

import threading
import time

import jax
import pytest

from rwkv_tts_tpu.config import EngineConfig, RwkvConfig, TtsArgs
from rwkv_tts_tpu.models import rwkv7
from rwkv_tts_tpu.runtime.continuous import ContinuousEngine
from rwkv_tts_tpu.runtime.engine import TtsEngine

CFG = RwkvConfig(
    n_layer=2, n_embd=128, head_size=64, vocab_size=77923,
    padded_vocab_size=78080, decay_lora=32, a_lora=32, v_lora=16,
    gate_lora=32, dtype="float32", param_dtype="float32",
)
ECFG = EngineConfig(prefill_buckets=(32, 64), max_semantic_tokens=20,
                    batch_size=3)


@pytest.fixture(scope="module")
def params():
    return rwkv7.init_params(CFG, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def static_engine(params):
    return TtsEngine(params, CFG, ECFG, use_pallas=False)


@pytest.fixture()
def cont(params):
    eng = ContinuousEngine(params, CFG, ECFG, use_pallas=False, block=8,
                           slots=3)
    yield eng
    eng.stop()


def test_normal_mode_matches_static_engine(params, static_engine, cont):
    """A request must produce the IDENTICAL token sequence whether it runs
    through the static per-batch engine or the continuous slot engine —
    same RNG fold-in discipline, same stage semantics."""
    args = TtsArgs(text="parity check", seed=123, max_tokens=20)
    want = static_engine.generate(args)
    got = cont.generate(args)
    assert got.global_tokens == want.global_tokens
    assert got.semantic_tokens == want.semantic_tokens


def test_zero_shot_matches_static_engine(params, static_engine, cont):
    args = TtsArgs(text="clone parity", seed=5, zero_shot=True,
                   max_tokens=20, ref_global_tokens=[3] * 32,
                   ref_semantic_tokens=[1, 2])
    want = static_engine.generate(args)
    got = cont.generate(args)
    assert got.global_tokens == want.global_tokens
    assert got.semantic_tokens == want.semantic_tokens


def test_concurrent_mixed_requests(static_engine, cont):
    """More requests than slots, mixed modes, all correct."""
    reqs = [TtsArgs(text=f"request number {i}", seed=i, max_tokens=12)
            for i in range(4)]
    reqs.append(TtsArgs(text="zs req", seed=99, zero_shot=True, max_tokens=12,
                        ref_global_tokens=[7] * 32, ref_semantic_tokens=[1]))
    results = {}
    done = threading.Event()

    def make_cb(i):
        def cb(res):
            results[i] = res
            if len(results) == len(reqs):
                done.set()
        return cb

    for i, r in enumerate(reqs):
        cont.submit(r, make_cb(i))
    assert done.wait(120), f"only {len(results)}/{len(reqs)} finished"

    for i, r in enumerate(reqs):
        want = static_engine.generate(r)
        assert results[i].global_tokens == want.global_tokens, f"req {i}"
        assert results[i].semantic_tokens == want.semantic_tokens, f"req {i}"


def test_chunk_callbacks_stream_all_tokens(cont):
    args = TtsArgs(text="stream me", seed=17, max_tokens=16)
    chunks = []
    res_box = []
    done = threading.Event()
    cont.submit(args, lambda r: (res_box.append(r), done.set()),
                chunk_cb=lambda req, toks: chunks.append(list(toks)))
    assert done.wait(120)
    streamed = [t for c in chunks for t in c]
    assert streamed == res_box[0].semantic_tokens
    # streaming delivered in multiple partial chunks for a 16-token output
    # with block=8 (at least 2)
    assert len(chunks) >= 1


def test_long_prompt_admission(params, static_engine, cont):
    """Prompts longer than the largest prefill bucket must admit via chunked
    prefill (previously would crash the decode thread)."""
    args = TtsArgs(text="long " * 60, seed=21, max_tokens=10)   # > 64-bucket
    want = static_engine.generate(args)
    got = cont.generate(args)
    assert got.global_tokens == want.global_tokens
    assert got.semantic_tokens == want.semantic_tokens


def test_bucketed_decode_matches_static_engine(params, static_engine):
    """Occupancy bucketing (decode_block_bucketed): with 8 slots and
    buckets (2, 4), a single request runs in the 2-slot compiled prefix
    and a 3-way burst in the 4-slot one — token streams must be identical
    to the static engine either way, and slots above the bucket must
    survive untouched."""
    eng = ContinuousEngine(params, CFG, ECFG, use_pallas=False, block=8,
                           slots=8, buckets=(2, 4))
    try:
        args = TtsArgs(text="bucket parity", seed=77, max_tokens=20)
        want = static_engine.generate(args)
        got = eng.generate(args)
        assert got.global_tokens == want.global_tokens
        assert got.semantic_tokens == want.semantic_tokens

        # concurrent burst of three → bucket 4
        reqs = [TtsArgs(text=f"burst {i}", seed=100 + i, max_tokens=16)
                for i in range(3)]
        wants = [static_engine.generate(r) for r in reqs]
        events, results = [], {}

        def mk(i):
            ev = threading.Event()
            events.append(ev)

            def cb(res):
                results[i] = res
                ev.set()
            return cb

        for i, r in enumerate(reqs):
            eng.submit(r, mk(i))
        for ev in events:
            assert ev.wait(120)
        for i, w in enumerate(wants):
            assert results[i].global_tokens == w.global_tokens
            assert results[i].semantic_tokens == w.semantic_tokens
    finally:
        eng.stop()


def test_bucket_selection_grows_and_shrinks(params):
    """The driver picks the smallest bucket covering the highest live
    slot; sequential requests after a burst drain back to the small
    bucket (slot 0 is reused once free)."""
    eng = ContinuousEngine(params, CFG, ECFG, use_pallas=False, block=8,
                           slots=8, buckets=(2, 4))
    try:
        for seed in (1, 2):
            res = eng.generate(
                TtsArgs(text="shrink", seed=seed, max_tokens=12))
            assert len(res.global_tokens) == 32
        # after drain all slots are free again → next request lands in
        # slot 0 and the 2-bucket
        with eng._lock:
            assert not eng._live
    finally:
        eng.stop()


def test_compaction_relocates_straggler(params, static_engine):
    """Slot compaction: a long request admitted into a high slot is moved
    into a low free slot once its burst-mates retire (so the decode bucket
    shrinks with occupancy), and its token stream is IDENTICAL to the
    static engine — relocation moves per-slot values (keys, counters,
    state) wholesale, never re-deriving anything from the slot index."""
    eng = ContinuousEngine(params, CFG, ECFG, use_pallas=False, block=4,
                           slots=8, buckets=(2, 4))
    try:
        short = [TtsArgs(text=f"short {i}", seed=200 + i, max_tokens=2)
                 for i in range(2)]
        long = TtsArgs(text="the long straggler", seed=300, max_tokens=20)
        wants = [static_engine.generate(r) for r in short + [long]]

        results = {}
        done = threading.Event()

        def mk(i):
            def cb(res):
                results[i] = res
                if len(results) == 3:
                    done.set()
            return cb

        # enqueue all three before starting the loop (submit() would start
        # it on the first request) so they admit as ONE burst → slots
        # 0, 1, 2; the straggler lands in slot 2 (> bucket 2)
        for i, r in enumerate(short + [long]):
            eng._queue.put([r, mk(i), None, time.perf_counter(), False])
        eng.start()
        assert done.wait(300), f"only {len(results)}/3 finished"
        assert eng.stats["relocations"] >= 1, \
            "straggler was never relocated into the small bucket"
        for i, w in enumerate(wants):
            assert results[i].global_tokens == w.global_tokens, f"req {i}"
            assert results[i].semantic_tokens == w.semantic_tokens, f"req {i}"
    finally:
        eng.stop()


def test_limit_zero_token_identical(params, static_engine, cont):
    """max_tokens=0 must emit ZERO semantic tokens in both engines (the
    continuous retire path used to emit one before idling)."""
    req = TtsArgs(text="limit zero", seed=3, max_tokens=0)
    want = static_engine.generate(req)
    got = cont.generate(req, timeout=300.0)
    assert want.semantic_tokens == [] and got.semantic_tokens == []
    assert got.global_tokens == want.global_tokens


def test_compaction_soak_random_traffic(params, static_engine):
    """Randomized admission order, mixed lengths and modes, mid-flight
    cancels — under small buckets so compaction fires repeatedly. Every
    surviving request must be token-identical to the static engine (the
    invariant compaction, bucketing and the pipelined loop must jointly
    preserve)."""
    import random

    rng = random.Random(42)
    eng = ContinuousEngine(params, CFG, ECFG, use_pallas=False, block=4,
                           slots=8, buckets=(2, 4))
    try:
        reqs = []
        for i in range(12):
            if i % 5 == 2:
                reqs.append(TtsArgs(
                    text=f"zs soak {i}", seed=500 + i, zero_shot=True,
                    max_tokens=rng.choice([2, 6, 12, 20]),
                    ref_global_tokens=[i % 32] * 32,
                    ref_semantic_tokens=[1, 2, 3]))
            else:
                reqs.append(TtsArgs(text=f"soak request {i}", seed=500 + i,
                                    max_tokens=rng.choice([2, 6, 12, 20])))
        results = {}
        done = threading.Event()
        expected = len(reqs)

        def mk(i):
            def cb(res):
                results[i] = res
                if len(results) == expected:
                    done.set()
            return cb

        cancel_idx = {3, 8}
        for i, r in enumerate(reqs):
            eng.submit(r, mk(i))
            if i in cancel_idx:
                eng.cancel(r)       # may race completion; both are fine
            if i % 3 == 0:
                import time
                time.sleep(0.05)    # stagger admissions across blocks
        assert done.wait(600), f"only {len(results)}/{expected} finished"

        from rwkv_tts_tpu.runtime.continuous import RequestCancelled
        for i, r in enumerate(reqs):
            got = results[i]
            if isinstance(got, RequestCancelled):
                assert i in cancel_idx
                continue
            assert not isinstance(got, Exception), f"req {i}: {got!r}"
            want = static_engine.generate(r)
            assert got.global_tokens == want.global_tokens, f"req {i}"
            assert got.semantic_tokens == want.semantic_tokens, f"req {i}"
    finally:
        eng.stop()


def test_cancel_retires_slot(params, cont):
    """cancel() fires RequestCancelled and frees the slot for new work."""
    from rwkv_tts_tpu.runtime.continuous import RequestCancelled

    done = threading.Event()
    box = {}

    def cb(res):
        box["res"] = res
        done.set()

    req = TtsArgs(text="a long cancelled request", seed=4, max_tokens=20)
    cont.submit(req, cb)
    assert cont.cancel(req) or done.wait(60.0)  # raced completion is fine
    assert done.wait(120.0)
    if isinstance(box["res"], Exception):
        assert isinstance(box["res"], RequestCancelled)
    # the engine still serves fresh requests afterwards
    res = cont.generate(TtsArgs(text="after cancel", seed=5, max_tokens=8),
                        timeout=300.0)
    assert len(res.global_tokens) == 32


def test_concurrent_first_submits_single_driver(params):
    """Regression (r5): start() must be atomic. Before the fix, two
    near-simultaneous FIRST submits from different threads (the event
    loop serving /api/tts + a stream producer) could each spawn a decode
    driver; the two drivers interleaved _admit over the shared free list
    and silently clobbered each other's _live entries — lost requests
    that never fired their callbacks. Hammer the cold-start window from
    8 threads and require every request to complete with exactly one
    decode thread alive."""
    eng = ContinuousEngine(params, CFG, ECFG, use_pallas=False, block=8,
                           slots=3)
    try:
        n = 8
        done = threading.Event()
        results, lock = [], threading.Lock()

        def cb(res):
            with lock:
                results.append(res)
                if len(results) == n:
                    done.set()

        barrier = threading.Barrier(n)

        def submit_one(i):
            args = TtsArgs(text=f"racer {i}", seed=i, max_tokens=8)
            barrier.wait()          # maximize concurrent start() calls
            eng.submit(args, cb)

        threads = [threading.Thread(target=submit_one, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        drivers = [t for t in threading.enumerate()
                   if t.name == "continuous-decode" and t.is_alive()]
        assert len(drivers) == 1, f"{len(drivers)} decode drivers spawned"
        assert done.wait(600.0), f"only {len(results)}/{n} completed"
        assert all(not isinstance(r, Exception) for r in results)
    finally:
        eng.stop()


def test_cancel_before_admission_never_decodes(params):
    """A request cancelled while still in the admission queue (the
    non-streaming /api/tts timeout path under backlog, r5) is dropped at
    admission with RequestCancelled instead of spending a device slot."""
    from rwkv_tts_tpu.runtime.continuous import RequestCancelled

    eng = ContinuousEngine(params, CFG, ECFG, use_pallas=False, block=8,
                           slots=1)   # one slot: the 2nd submit must queue
    try:
        blocker_done = threading.Event()
        victim_done = threading.Event()
        box = {}

        blocker = TtsArgs(text="slot occupant", seed=1, max_tokens=20)
        victim = TtsArgs(text="queued then cancelled", seed=2, max_tokens=20)
        eng.submit(blocker, lambda r: blocker_done.set())
        eng.submit(victim,
                   lambda r: (box.__setitem__("res", r), victim_done.set()))
        assert eng.cancel(victim)       # not live yet → queued-cancel path
        assert victim_done.wait(300.0)
        assert isinstance(box["res"], RequestCancelled)
        assert blocker_done.wait(300.0)
        assert not eng._queued          # registry drained, not leaked
    finally:
        eng.stop()


def test_crashed_loop_fast_fails_submits(params):
    """A dead decode loop must fast-fail new submits, not strand them in
    a queue nothing drains until the caller's timeout."""
    eng = ContinuousEngine(params, CFG, ECFG, use_pallas=False, block=8,
                           slots=3)
    try:
        eng._crashed = RuntimeError("boom")   # what _run() records on crash
        with pytest.raises(RuntimeError, match="offline"):
            eng.submit(TtsArgs(text="x", seed=1), lambda r: None)
    finally:
        eng._crashed = None
        eng.stop()


def test_warmup_then_token_identical(params, static_engine, cont):
    """warmup() sweeps every burst bucket with throwaway requests; the
    engine must come out clean — subsequent real requests land in reused
    slots and still match the static engine token-for-token."""
    cont.warmup()                      # sweeps bursts 1, 2, 3 (B=3)
    assert cont._crashed is None
    with cont._lock:
        assert not cont._live          # all warmup slots retired
    args = TtsArgs(text="after warmup", seed=321, max_tokens=20)
    want = static_engine.generate(args)
    got = cont.generate(args)
    assert got.global_tokens == want.global_tokens
    assert got.semantic_tokens == want.semantic_tokens
