"""Serving front-end: micro-batcher semantics, engine parity with the
one-shot CLI, and the HTTP endpoint end to end (stdlib client, CPU mesh)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from zeroshotvideoclassification_tpu.serve.batcher import MicroBatcher


# ------------------------------------------------------------ batcher -------

def test_microbatcher_coalesces_and_preserves_order():
    gate = threading.Event()
    calls = []

    def process(items):
        calls.append(list(items))
        if not gate.is_set():
            gate.wait(timeout=10)
        return [x * 10 for x in items]

    b = MicroBatcher(process, max_batch=8, max_wait_s=0.05)
    try:
        f0 = b.submit(1)  # occupies the worker (blocked on the gate)
        time.sleep(0.2)
        futs = [b.submit(i) for i in (2, 3, 4, 5)]  # queue while blocked
        gate.set()
        assert f0.result(timeout=10) == 10
        assert [f.result(timeout=10) for f in futs] == [20, 30, 40, 50]
        # batch 1 = the lone first item; batch 2 = the four queued together
        assert calls[0] == [1] and calls[1] == [2, 3, 4, 5]
        s = b.stats()
        assert s["requests"] == 5 and s["batches"] == 2
    finally:
        b.shutdown()


def test_microbatcher_respects_max_batch():
    done = []

    def process(items):
        done.append(len(items))
        return list(items)

    b = MicroBatcher(process, max_batch=3, max_wait_s=0.2)
    try:
        futs = [b.submit(i) for i in range(7)]
        assert [f.result(timeout=10) for f in futs] == list(range(7))
        assert max(done) <= 3 and sum(done) == 7
    finally:
        b.shutdown()


def test_microbatcher_propagates_errors_per_batch():
    def process(items):
        raise ValueError("boom")

    b = MicroBatcher(process, max_batch=4, max_wait_s=0.01)
    try:
        f = b.submit(1)
        with pytest.raises(ValueError, match="boom"):
            f.result(timeout=10)
    finally:
        b.shutdown()


def test_microbatcher_shutdown_fails_pending_futures():
    """Items enqueued but never collected must not leave their request
    threads blocked for the full result timeout: shutdown() drains the queue
    and fails the futures."""
    gate = threading.Event()

    def process(items):
        gate.wait(timeout=10)
        return list(items)

    b = MicroBatcher(process, max_batch=1, max_wait_s=0.01)
    f0 = b.submit(1)  # worker blocks on the gate processing this one
    time.sleep(0.2)
    pending = [b.submit(i) for i in (2, 3)]  # stuck in the queue
    b.shutdown(timeout=0.2)  # worker still blocked -> join times out
    for f in pending:
        with pytest.raises(RuntimeError, match="shut down"):
            f.result(timeout=5)
    gate.set()  # release the worker; the in-flight item still completes
    assert f0.result(timeout=10) == 1


def test_microbatcher_drain_shutdown_finishes_accepted_requests():
    """shutdown(drain=True) — the SIGTERM path — must resolve every
    already-accepted request normally instead of failing it, then refuse
    new submits. Covers both the plain and the two-stage batcher."""
    def slow(items):
        time.sleep(0.05)
        return [x + 100 for x in items]

    for stage2 in (None, lambda mid: [x * 2 for x in mid]):
        b = MicroBatcher(slow, max_batch=2, max_wait_s=0.001, stage2=stage2)
        futs = [b.submit(i) for i in range(7)]  # most still queued
        b.shutdown(drain=True, drain_timeout=20)
        want = [(i + 100) * (2 if stage2 else 1) for i in range(7)]
        assert [f.result(timeout=1) for f in futs] == want
        with pytest.raises(RuntimeError, match="shut down"):
            b.submit(99)


def test_serve_cli_sigterm_graceful_exit():
    """SIGTERM on the serving CLI exits 0 through the drain path (stop
    accepting -> finish accepted work -> stop), not via a signal kill —
    the rolling-restart contract of serve_forever."""
    import signal
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from zeroshotvideoclassification_tpu.cli.serve import main\n"
        "main(['--synthetic_word2vec',\n"
        "      '--classes', 'kayaking', 'surfing', 'archery',\n"
        "      '--network', 'r3d_18', '--clip_len', '2', '--size', '32',\n"
        "      '--n_clips', '1', '--max_batch', '8', '--no-warmup',\n"
        "      '--port', '0', '--compute_dtype', 'float32'])\n"
        "print('CLEAN EXIT', flush=True)\n")
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True)
    try:
        # serve_forever prints 'listening on ...' only AFTER the SIGTERM
        # handler is installed, so waiting for it removes the race where an
        # early signal hits the default disposition (rc=-15). Read stderr
        # on a thread: a bare readline() would block past any deadline if
        # the child stalled without closing the pipe.
        ready = threading.Event()
        lines = []

        def watch_stderr():
            for line in proc.stderr:
                lines.append(line)
                if line.startswith("listening on"):
                    ready.set()

        watcher = threading.Thread(target=watch_stderr, daemon=True)
        watcher.start()
        deadline = time.monotonic() + 300
        while not ready.is_set() and time.monotonic() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server died rc={proc.returncode}: {lines}")
            time.sleep(0.1)
        assert ready.is_set(), f"server never came up: {lines}"
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=120)
        assert proc.returncode == 0, (out, err)
        assert "CLEAN EXIT" in out  # main() returned; not killed mid-flight
    finally:
        if proc.poll() is None:
            proc.kill()


def test_batcher_rejects_unbounded_pipeline():
    """stage2 with pipeline_depth < 1 would build a Queue(maxsize=0) —
    UNBOUNDED in Python, the opposite of the documented backpressure."""
    with pytest.raises(ValueError, match="pipeline_depth"):
        MicroBatcher(lambda i: list(i), stage2=lambda m: m, pipeline_depth=0)


def test_service_wait_inflight_blocks_until_responses_written():
    """The graceful-exit path must be able to wait for handler threads to
    WRITE their responses (they are daemon threads — process exit would
    otherwise cut a response between its future resolving and the socket
    write). wait_inflight returns False while a request is mid-handler and
    True once it finished."""
    from zeroshotvideoclassification_tpu.serve.server import ZeroShotService

    svc = ZeroShotService.__new__(ZeroShotService)  # counters only
    svc._inflight_cv = threading.Condition()
    svc._inflight = 0
    svc.n_http = 0
    assert svc.wait_inflight(timeout=0.05)  # idle: already quiesced
    svc._enter_http()
    assert not svc.wait_inflight(timeout=0.1)  # mid-request: times out
    t = threading.Thread(target=lambda: (time.sleep(0.2), svc._exit_http()))
    t.start()
    assert svc.wait_inflight(timeout=5.0)  # wakes on the response finishing
    t.join()
    assert svc.n_http == 1


def test_submit_accepted_is_always_drained_not_failed():
    """The accepting check and the submitted-counter increment are atomic:
    a drain shutdown racing submit() either rejects the request outright or
    resolves it normally — never fails an accepted future. Hammer the race
    window with many submitter threads against one drain."""
    b = MicroBatcher(lambda items: [x * 10 for x in items],
                     max_batch=8, max_wait_s=0.001)
    results, rejected = [], []
    start = threading.Event()

    def submitter(i):
        start.wait()
        try:
            fut = b.submit(i)
        except RuntimeError:
            rejected.append(i)
            return
        results.append(fut.result(timeout=10))  # accepted -> must resolve

    threads = [threading.Thread(target=submitter, args=(i,))
               for i in range(32)]
    for t in threads:
        t.start()
    start.set()
    b.shutdown(drain=True, drain_timeout=20)
    for t in threads:
        t.join(timeout=20)
    assert len(results) + len(rejected) == 32
    assert all(r % 10 == 0 for r in results)


def test_microbatcher_two_stage_pipeline_overlaps():
    """With stage2 set, stage 1 of batch N+1 runs while stage 2 still holds
    batch N — the host decodes ahead of the device."""
    stage1_started = []
    s2_gate = threading.Event()

    def pack(items):
        stage1_started.append((list(items), time.monotonic()))
        return list(items)

    def dispatch(mid):
        if not s2_gate.is_set():
            s2_gate.wait(timeout=10)
        return [x * 10 for x in mid]

    b = MicroBatcher(pack, max_batch=1, max_wait_s=0.001, stage2=dispatch)
    try:
        f1 = b.submit(1)  # stage 2 blocks on the gate holding this batch
        time.sleep(0.2)
        f2 = b.submit(2)  # stage 1 must run NOW, before f1 resolves
        deadline = time.monotonic() + 5
        while len(stage1_started) < 2 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert len(stage1_started) == 2, "stage 1 did not run ahead"
        assert not f1.done()  # device stage still gated
        s2_gate.set()
        assert f1.result(timeout=10) == 10
        assert f2.result(timeout=10) == 20
    finally:
        b.shutdown()


def test_microbatcher_stage2_error_fails_only_its_batch():
    def dispatch(mid):
        if mid == [13]:
            raise ValueError("unlucky")
        return [x * 10 for x in mid]

    b = MicroBatcher(lambda items: list(items), max_batch=1,
                     max_wait_s=0.001, stage2=dispatch)
    try:
        bad = b.submit(13)
        good = b.submit(2)
        with pytest.raises(ValueError, match="unlucky"):
            bad.result(timeout=10)
        assert good.result(timeout=10) == 20
    finally:
        b.shutdown()


def test_microbatcher_shutdown_during_long_pack_resolves_future():
    """A pack (stage 1) that outlives shutdown's join timeout must not leave
    its futures hanging: the post-put stop re-check drains them (liveness
    contract — the future resolves either way, never blocks to the caller's
    600 s timeout)."""
    release = threading.Event()

    def pack(items):
        release.wait(timeout=10)
        return list(items)

    b = MicroBatcher(pack, max_batch=1, max_wait_s=0.001,
                     stage2=lambda mid: [x * 10 for x in mid])
    f = b.submit(1)
    time.sleep(0.2)  # stage 1 is inside pack
    t = threading.Thread(target=lambda: b.shutdown(timeout=0.2))
    t.start()
    time.sleep(0.4)  # shutdown's drain ran while pack was still going
    release.set()
    t.join(timeout=5)
    try:
        r = f.result(timeout=5)  # the contract: resolves, never hangs
    except RuntimeError as e:
        assert "shut down" in str(e)
    else:
        assert r == 10  # stage 2 happened to still be alive — also fine


def test_microbatcher_stats_latency_percentiles():
    b = MicroBatcher(lambda items: list(items), max_batch=4,
                     max_wait_s=0.001)
    try:
        futs = [b.submit(i) for i in range(8)]
        for f in futs:
            f.result(timeout=10)
        s = b.stats()
        assert s["latency_p50_ms"] > 0.0
        assert s["latency_p95_ms"] >= s["latency_p50_ms"]
        assert s["latency_max_ms"] >= s["latency_p95_ms"]
    finally:
        b.shutdown()


# ----------------------------------------------------- engine + server ------

@pytest.fixture(scope="module")
def serving(tmp_path_factory):
    """One engine + HTTP server for the module (model init is the slow
    part on this 1-core host); 4 npy fixture videos + synthetic vectors."""
    from zeroshotvideoclassification_tpu.serve import (
        InferenceEngine,
        start_server,
    )
    from zeroshotvideoclassification_tpu.text import classes2embedding
    from zeroshotvideoclassification_tpu.text.word2vec import (
        SyntheticWordVectors,
    )

    import cv2

    tmp = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        p = tmp / f"clip{i}.npy"
        np.save(p, rng.integers(0, 256, (12, 64, 86, 3), dtype=np.uint8))
        paths.append(str(p))
    frame_dir = tmp / "vid0"
    (frame_dir / "images").mkdir(parents=True)
    for i in range(6):
        cv2.imwrite(str(frame_dir / "images" / ("img_%05d.jpg" % (i + 1))),
                    rng.integers(0, 256, (64, 86, 3), dtype=np.uint8))
    classes = ["playing guitar", "riding a horse", "washing dishes"]
    class_embed = classes2embedding("kinetics", classes,
                                    SyntheticWordVectors())
    engine = InferenceEngine(
        classes, class_embed, network="r3d_18", head="mlp", weights=None,
        n_clips=2, clip_len=2, size=32, max_batch=4,
        compute_dtype="float32")
    server, service = start_server(engine, port=0, max_wait_s=0.3)
    yield {"engine": engine, "server": server, "service": service,
           "paths": paths, "frame_dir": str(frame_dir),
           "classes": classes, "class_embed": class_embed,
           "tmp": str(tmp), "port": server.server_address[1]}
    server.shutdown()
    service.close()
    engine.close()  # the decode pool's workers are non-daemon threads


def test_engine_matches_oneshot_cli(serving):
    """The always-on engine must score exactly like the one-shot CLI path
    (same checkpoint semantics, loaders, TSN windows, ranking)."""
    import argparse

    from zeroshotvideoclassification_tpu.cli.infer import classify_videos

    args = argparse.Namespace(
        network="r3d_18", head="mlp", weights=None, n_clips=2, clip_len=2,
        size=32, bs=4, top_k=5, compute_dtype="float32")
    want = classify_videos(serving["paths"], serving["classes"],
                           serving["class_embed"], args)
    got = serving["engine"].classify(serving["paths"])
    for g, w in zip(got, want):
        assert g["top_class"] == w["top_class"]
        np.testing.assert_allclose(
            [t["similarity"] for t in g["topk"]],
            [t["similarity"] for t in w["topk"]], atol=1e-5)


def test_service_coalesces_concurrent_requests(serving):
    service, engine = serving["service"], serving["engine"]
    # warm the compiled shape so the batching window isn't eaten by compile
    service.classify([serving["paths"][0]])
    before = engine.n_dispatches
    results = service.classify(serving["paths"])  # 4 submits, one window
    assert len(results) == 4
    assert all("top_class" in r for r in results)
    assert engine.n_dispatches == before + 1  # ONE device dispatch for all 4


def test_mixed_loader_request_is_one_dispatch(serving):
    """frame-dir and .npy sources in ONE request must share a single padded
    forward (the 'auto' per-path decoder), not one dispatch per loader kind."""
    engine = serving["engine"]
    mixed = [serving["frame_dir"], serving["paths"][0], serving["paths"][1]]
    engine.classify(mixed)  # warm the compiled shape
    before = engine.n_dispatches
    results = engine.classify(mixed)
    assert engine.n_dispatches == before + 1
    assert [r["video"] for r in results] == mixed
    assert all("top_class" in r for r in results)


def test_bucketed_dispatch_shapes(serving):
    """A lone request must pad to the smallest ladder shape, not straight to
    max_batch: with max_batch=16 the ladder is [8, 16], so one clip costs a
    bs-8 forward (half the knee shape's padding FLOPs at this scale)."""
    from zeroshotvideoclassification_tpu.serve import InferenceEngine

    engine = InferenceEngine(
        serving["classes"], serving["class_embed"], network="r3d_18",
        head="mlp", weights=None, n_clips=1, clip_len=2, size=32,
        max_batch=16, compute_dtype="float32")
    assert engine.batch_buckets == [8, 16]
    engine.classify([serving["paths"][0]])
    assert engine.bucket_dispatches == {8: 1, 16: 0}
    assert engine.stats()["batch_buckets"] == {"8": 1, "16": 0}
    engine.close()
    # the module fixture's max_batch=4 collapses the ladder to one bucket,
    # rounded up to tile the data mesh axis (8 virtual devices under tests)
    fixture_engine = serving["engine"]
    ns = fixture_engine.n_shards
    assert fixture_engine.batch_buckets == [-(-4 // ns) * ns]


def test_engine_spmd_over_local_devices(serving):
    """The engine serves SPMD: a 'data' mesh over every local device (8
    virtual CPU devices under tests), bucket shapes tiling the axis. The
    engine==CLI parity test doubles as the numerical check that the sharded
    forward matches the unsharded one."""
    import jax

    engine = serving["engine"]
    assert engine.n_shards == len(jax.devices())
    assert engine.stats()["data_shards"] == engine.n_shards
    assert all(b % engine.n_shards == 0 for b in engine.batch_buckets)


def test_engine_empty_request(serving):
    """classify([]) / embed_paths([]) return empty results, not
    StopIteration (HostPipeline yields no batches for an empty table)."""
    engine = serving["engine"]
    before = engine.n_dispatches
    assert engine.classify([]) == []
    emb, ok = engine.embed_paths([])
    assert emb.shape == (0, serving["class_embed"].shape[1])
    assert ok.shape == (0,)
    assert engine.n_dispatches == before  # no device work for nothing


def test_engine_warmup_compiles_ladder_without_counting(serving):
    """warmup() drives every bucket shape through the real program but
    leaves the stats counters untouched."""
    from zeroshotvideoclassification_tpu.serve import InferenceEngine

    engine = InferenceEngine(
        serving["classes"], serving["class_embed"], network="r3d_18",
        head="mlp", weights=None, n_clips=1, clip_len=2, size=32,
        max_batch=16, compute_dtype="float32")
    engine.warmup()
    assert engine.n_dispatches == 0
    assert engine.bucket_dispatches == {8: 0, 16: 0}
    # post-warmup requests still work and count normally
    engine.classify([serving["paths"][0]])
    assert engine.bucket_dispatches == {8: 1, 16: 0}
    engine.close()
    # warmup survives a ladder whose smallest bucket exceeds max_batch
    # (rounded up to tile the mesh): the fixture engine has max_batch=4
    before = dict(serving["engine"].bucket_dispatches)
    serving["engine"].warmup()
    assert serving["engine"].bucket_dispatches == before


def test_batcher_submit_shutdown_race_fails_future():
    """A submit whose put lands after shutdown's drain must not leave the
    future pending forever: submit re-checks stop AFTER the put and drains.
    Reproduce the interleaving by making submit's pre-check see 'running'
    while the batcher is in fact already shut down (drain done)."""
    from unittest import mock

    b = MicroBatcher(lambda items: list(items), max_batch=4, max_wait_s=0.01)
    b.shutdown()
    with mock.patch.object(b._stop, "is_set", side_effect=[False, True]):
        fut = b.submit(1)
    assert fut.done()
    with pytest.raises(RuntimeError, match="shut down"):
        fut.result(timeout=1)
    # and the public path raises immediately once stop is observable
    with pytest.raises(RuntimeError, match="shut down"):
        b.submit(2)


def test_data_root_confinement(serving):
    """With data_root set, /classify rejects paths resolving outside it
    BEFORE touching the filesystem; paths inside still classify."""
    from zeroshotvideoclassification_tpu.serve import start_server

    server, service = start_server(serving["engine"], port=0,
                                   max_wait_s=0.01,
                                   data_root=serving["tmp"])
    try:
        port = server.server_address[1]

        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/classify",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        with pytest.raises(urllib.error.HTTPError) as exc:
            post({"video": "/etc/passwd"})
        assert exc.value.code == 400
        assert json.loads(exc.value.read())["error"] == \
            "path outside --data_root"
        # traversal through the root must not escape it
        with pytest.raises(urllib.error.HTTPError) as exc:
            post({"video": serving["tmp"] + "/../escape.npy"})
        assert exc.value.code == 400
        # a symlink INSIDE the root pointing OUTSIDE resolves outside -> 400
        import os

        link = os.path.join(serving["tmp"], "sneaky.npy")
        if not os.path.exists(link):
            os.symlink("/etc/hosts", link)
        with pytest.raises(urllib.error.HTTPError) as exc:
            post({"video": link})
        assert exc.value.code == 400
        ok = post({"video": serving["paths"][0]})
        assert ok["top_class"] in serving["classes"]
        # the response echoes the request's own path string
        assert ok["video"] == serving["paths"][0]
    finally:
        server.shutdown()
        service.close()


def test_reload_hot_swaps_weights(serving, tmp_path):
    """POST /reload swaps the scoring state in place: same compiled ladder,
    different params, measurably different embeddings."""
    import jax

    from zeroshotvideoclassification_tpu.serve import InferenceEngine
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        make_optimizer,
    )
    from zeroshotvideoclassification_tpu.models import get_network

    engine = InferenceEngine(
        serving["classes"], serving["class_embed"], network="r3d_18",
        head="mlp", weights=None, n_clips=1, clip_len=2, size=32,
        max_batch=8, compute_dtype="float32")
    before, _ = engine.embed_paths([serving["paths"][0]])

    # a differently-seeded checkpoint to reload
    from zeroshotvideoclassification_tpu.train.checkpoint import (
        save_checkpoint,
    )

    cfg = engine.config
    model = get_network(cfg)
    ts2 = create_train_state(model, make_optimizer(cfg.lr),
                             jax.random.PRNGKey(7))
    ckpt = str(tmp_path / "other.npz")
    save_checkpoint(ckpt, ts2, epoch=1, accuracy=1.0)

    out = engine.reload(ckpt)
    assert out == {"reloaded": ckpt, "epoch": 1, "accuracy": 1.0}
    assert engine.stats()["weights"] == ckpt
    after, _ = engine.embed_paths([serving["paths"][0]])
    assert not np.allclose(before, after)  # really the new params
    # no new compile needed: both embed_paths hit the SAME already-built
    # bucket shape (the ladder keys on shapes, not params)
    assert engine.bucket_dispatches[engine.batch_buckets[0]] == 2

    # strict-load contract: reload refuses anything that is not a full
    # framework checkpoint — the live model must never go (part-)random
    with pytest.raises(ValueError):
        engine.reload("")  # would silently serve random-init otherwise
    bogus = str(tmp_path / "bogus.npz")
    np.savez(bogus, not_a_checkpoint=np.zeros(3))
    with pytest.raises((KeyError, ValueError)):
        engine.reload(bogus)
    # a VALID checkpoint of a DIFFERENT network must be refused too
    other_cfg = cfg.replace(network="mc3_18")
    ts3 = create_train_state(get_network(other_cfg), make_optimizer(cfg.lr),
                             jax.random.PRNGKey(3))
    wrong = str(tmp_path / "wrong_net.npz")
    save_checkpoint(wrong, ts3, epoch=1, accuracy=1.0)
    with pytest.raises(ValueError):
        engine.reload(wrong)
    # every refusal left the live scoring state untouched
    assert engine.stats()["weights"] == ckpt
    again, _ = engine.embed_paths([serving["paths"][0]])
    assert np.allclose(after, again)
    engine.close()


def test_reload_endpoint_confined_by_data_root(serving):
    """/reload honors the same --data_root admission as /classify."""
    from zeroshotvideoclassification_tpu.serve import start_server

    server, service = start_server(serving["engine"], port=0,
                                   max_wait_s=0.01,
                                   data_root=serving["tmp"])
    try:
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload",
            data=json.dumps({"weights": "/etc/passwd"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
        assert json.loads(exc.value.read())["error"] == \
            "path outside --data_root"
    finally:
        server.shutdown()
        service.close()


def test_rank_pads_to_ladder_shapes(serving):
    """The ranking matmul must reuse the dispatch ladder's padded shapes:
    requests of different sizes within one bucket may compile
    cosine_distances at most once (a fresh deployment must not pay one
    tiny XLA compile per distinct request size)."""
    from zeroshotvideoclassification_tpu.ops.cdist import cosine_distances

    engine = serving["engine"]
    paths = serving["paths"]
    engine.classify(paths[:1])  # warm the bucket's rank shape
    before = cosine_distances._cache_size()
    r2 = engine.classify(paths[:2])
    r3 = engine.classify(paths[:3])
    assert cosine_distances._cache_size() == before
    assert len(r2) == 2 and len(r3) == 3
    assert all("top_class" in r for r in r2 + r3)


def test_reload_swap_is_atomic_under_concurrent_classify(serving, tmp_path):
    """Dispatches racing a reload always see ONE checkpoint's (params,
    model_state) pair — every result must equal pre-swap or post-swap
    scoring, never a mix (engine holds a single scoring tuple)."""
    import concurrent.futures

    import jax

    from zeroshotvideoclassification_tpu.models import get_network
    from zeroshotvideoclassification_tpu.serve import InferenceEngine
    from zeroshotvideoclassification_tpu.train import (
        create_train_state,
        make_optimizer,
    )
    from zeroshotvideoclassification_tpu.train.checkpoint import (
        save_checkpoint,
    )

    engine = InferenceEngine(
        serving["classes"], serving["class_embed"], network="r3d_18",
        head="mlp", weights=None, n_clips=1, clip_len=2, size=32,
        max_batch=8, compute_dtype="float32")
    path = serving["paths"][0]
    before, _ = engine.embed_paths([path])

    cfg = engine.config
    ts2 = create_train_state(get_network(cfg), make_optimizer(cfg.lr),
                             jax.random.PRNGKey(11))
    ckpt = str(tmp_path / "swap.npz")
    save_checkpoint(ckpt, ts2, epoch=2, accuracy=0.5)

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        classifies = [ex.submit(engine.embed_paths, [path])
                      for _ in range(6)]
        swap = ex.submit(engine.reload, ckpt)
        embs = [f.result()[0] for f in classifies]
        swap.result()
    after, _ = engine.embed_paths([path])
    assert not np.allclose(before, after)
    for e in embs:  # old or new scoring, never a torn mixture
        assert np.allclose(e, before, atol=1e-5) or \
            np.allclose(e, after, atol=1e-5)
    engine.close()


def test_reload_endpoint_refuses_bad_weights(serving, tmp_path):
    """/reload answers bad requests with JSON errors (never a dead
    connection) and the serving state survives every refusal."""
    port = serving["port"]

    def post_reload(weights):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/reload",
            data=json.dumps({"weights": weights}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        return exc.value.code, json.loads(exc.value.read())

    code, body = post_reload("")  # would mean random-init — refused early
    assert code == 400 and "checkpoint path" in body["error"]
    code, body = post_reload("none")
    assert code == 400

    bogus = str(tmp_path / "not_a_ckpt.npz")
    np.savez(bogus, junk=np.zeros(3))
    code, body = post_reload(bogus)  # strict load raises -> 500 JSON
    assert code == 500 and "error" in body

    code, body = post_reload(str(tmp_path / "missing.npz"))
    assert code == 500 and "FileNotFoundError" in body["error"]

    # the handler thread survived all of it
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz") as r:
        assert json.load(r)["status"] == "ok"


def test_pipeline_depth_zero_single_stage(serving):
    """--pipeline_depth 0 serves single-stage (lowest host memory): the
    HTTP path still classifies correctly."""
    from zeroshotvideoclassification_tpu.serve import start_server

    server, service = start_server(serving["engine"], port=0,
                                   max_wait_s=0.01, pipeline_depth=0)
    try:
        assert service.batcher.stage2 is None
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify",
            data=json.dumps({"video": serving["paths"][0]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["top_class"] in serving["classes"]
    finally:
        server.shutdown()
        service.close()


def test_symlinked_npy_resolves_to_extensionless_blob(tmp_path):
    """detect_loader sniffs npy magic bytes: a resolved path that lost its
    .npy extension (serving decodes realpaths) still takes the npy loader."""
    import numpy as _np

    from zeroshotvideoclassification_tpu.data.decode import detect_loader

    blob = tmp_path / "ab12"  # extensionless
    _np.save(blob.with_suffix(".npy"), _np.zeros((4, 8, 8, 3), _np.uint8))
    (blob.with_suffix(".npy")).rename(blob)
    assert detect_loader(str(blob)) == "npy"
    assert detect_loader("/nonexistent/x") == "video"


def test_data_root_filesystem_root_allows_everything(serving):
    """--data_root / must not reject every path (the '//' prefix bug):
    root-anchored confinement degenerates to realpath-normalization."""
    from zeroshotvideoclassification_tpu.serve.server import ZeroShotService

    svc = ZeroShotService(serving["engine"], data_root="/")
    try:
        assert svc.admit(serving["paths"][0]) is not None
        assert svc.admit("/etc/hosts") == "/etc/hosts"
    finally:
        svc.close()


def test_http_endpoints(serving):
    port = serving["port"]

    def get(path):
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return json.loads(r.read())

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    h = get("/healthz")
    assert h["status"] == "ok" and h["classes"] == 3

    one = post("/classify", {"video": serving["paths"][0]})
    assert one["top_class"] in serving["classes"]

    many = post("/classify", {"videos": serving["paths"][:2]})
    assert len(many["results"]) == 2

    missing = post("/classify", {"video": "/nope/missing.npy"})
    assert missing.get("error") == "decode failed"

    s = get("/stats")
    assert s["engine"]["dispatches"] >= 1
    assert s["batcher"]["requests"] >= 3

    # malformed request -> 400, server stays alive
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/classify", data=b"{}",
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 400
    assert get("/healthz")["status"] == "ok"
