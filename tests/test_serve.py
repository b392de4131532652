"""Dynamic-batching serving: protocol round trip, coalescing, errors."""

import json
import os
import threading

import numpy as np
import pytest

import jax

from pointnet_autoencoder_tpu.inference import InferenceSession
from pointnet_autoencoder_tpu.models.registry import get_model_spec
from pointnet_autoencoder_tpu.serve import PointClient, PointServer
from pointnet_autoencoder_tpu.train.checkpoint import CheckpointManager

NUM_POINT = 64


@pytest.fixture(scope="module")
def session(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    spec = get_model_spec("model")
    _, variables = spec.init_variables(jax.random.PRNGKey(0), NUM_POINT)
    bundle = os.path.join(str(tmp), "bundle")
    os.makedirs(bundle)
    mgr = CheckpointManager(str(tmp))
    mgr.save_tree(os.path.join(bundle, "variables.ckpt"),
                  jax.device_get(variables))
    with open(os.path.join(bundle, "bundle_meta.json"), "w") as f:
        json.dump({"format": "pcae-bundle-v1", "model": "model",
                   "num_point": NUM_POINT}, f)
    return InferenceSession.from_bundle(bundle, batch_size=4)


@pytest.fixture()
def server(session):
    srv = PointServer(session, port=0, max_delay_ms=1.0).start()
    yield srv
    srv.stop()


def _clouds(n, seed=0):
    return np.random.RandomState(seed).randn(
        n, NUM_POINT, 3).astype(np.float32)


def test_roundtrip_matches_direct_session(server, session):
    with PointClient("127.0.0.1", server.port) as c:
        info = c.ping()
        assert info["model"] == "model" and info["num_point"] == NUM_POINT

        pts = _clouds(3)
        np.testing.assert_allclose(
            c.reconstruct(pts), session.reconstruct(pts), rtol=1e-6)
        np.testing.assert_allclose(
            c.embed(pts), session.embed(pts), rtol=1e-6)
        # single-shape (N, 3) form keeps its rank
        one = c.reconstruct(pts[0])
        assert one.shape == (NUM_POINT, 3)
        np.testing.assert_allclose(one, session.reconstruct(pts[0]),
                                   rtol=1e-6)
        # decode(embed(x)) == reconstruct(x)
        np.testing.assert_allclose(
            c.decode(c.embed(pts)), c.reconstruct(pts), rtol=1e-6)
        stats = c.stats()
        assert stats["batches"] >= 1 and stats["mean_batch_ms"] > 0.0


def test_concurrent_requests_are_batched(session):
    srv = PointServer(session, port=0, max_delay_ms=250.0).start()
    try:
        pts = _clouds(4, seed=1)
        want = session.reconstruct(pts)
        results = [None] * 4
        barrier = threading.Barrier(4)

        def worker(i):
            with PointClient("127.0.0.1", srv.port) as c:
                barrier.wait()
                results[i] = c.reconstruct(pts[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(4):
            np.testing.assert_allclose(results[i], want[i], rtol=1e-6)

        with PointClient("127.0.0.1", srv.port) as c:
            stats = c.stats()
        assert stats["requests"] == 4
        # 4 co-arriving singles inside a 250 ms window must coalesce
        assert stats["batches"] < 4
        assert stats["mean_batch_occupancy"] > 1.0
    finally:
        srv.stop()


def test_errors_keep_connection_alive(server, session):
    with PointClient("127.0.0.1", server.port) as c:
        with pytest.raises(RuntimeError, match="expected"):
            c.reconstruct(np.zeros((2, NUM_POINT + 1, 3), np.float32))
        from pointnet_autoencoder_tpu.serve import recv_message, send_message

        send_message(c._sock, {"op": "nonsense"})
        resp, _ = recv_message(c._sock)
        assert not resp["ok"] and "unknown op" in resp["error"]
        # connection still serves after both errors
        pts = _clouds(1, seed=2)
        np.testing.assert_allclose(
            c.reconstruct(pts), session.reconstruct(pts), rtol=1e-6)


def test_mixed_ops_group_correctly(server, session):
    pts = _clouds(2, seed=3)
    out = {}

    def rec():
        with PointClient("127.0.0.1", server.port) as c:
            out["rec"] = c.reconstruct(pts)

    def emb():
        with PointClient("127.0.0.1", server.port) as c:
            out["emb"] = c.embed(pts)

    threads = [threading.Thread(target=f) for f in (rec, emb)] * 1
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    np.testing.assert_allclose(out["rec"], session.reconstruct(pts),
                               rtol=1e-6)
    np.testing.assert_allclose(out["emb"], session.embed(pts), rtol=1e-6)


def test_server_over_pipelined_session(session):
    """PointServer accepts the 2-stage pipeline-parallel session (what
    cli.serve --pipeline_parallel builds): results equal the unpipelined
    session across all three ops."""
    from pointnet_autoencoder_tpu.parallel.pp import PipelinedSession

    pp = PipelinedSession(session, num_microbatches=2)
    srv = PointServer(pp, port=0, max_delay_ms=1.0).start()
    try:
        with PointClient("127.0.0.1", srv.port) as c:
            assert c.ping()["model"] == "model"
            pts = _clouds(3, seed=5)
            np.testing.assert_allclose(
                c.reconstruct(pts), session.reconstruct(pts),
                rtol=1e-5, atol=1e-6)
            emb = c.embed(pts)
            np.testing.assert_allclose(emb, session.embed(pts),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(c.decode(emb), session.decode(emb),
                                       rtol=1e-5, atol=1e-6)
    finally:
        srv.stop()


def test_oversized_request_splits_across_batches(server, session):
    # 7 shapes > compiled batch 4: the session splits internally; results
    # must still be exact and in order.
    pts = _clouds(7, seed=4)
    with PointClient("127.0.0.1", server.port) as c:
        np.testing.assert_allclose(
            c.reconstruct(pts), session.reconstruct(pts), rtol=1e-6)


def test_request_larger_than_pending_bound_admits_when_idle(session):
    """A request bigger than max_pending_shapes can never satisfy
    inflight + b <= bound, so 'retry later' would loop forever; an idle
    server must admit it anyway (the session chunks internally)."""
    srv = PointServer(session, port=0, max_delay_ms=1.0,
                      max_pending_shapes=2).start()
    try:
        pts = _clouds(7, seed=21)
        with PointClient("127.0.0.1", srv.port) as c:
            np.testing.assert_allclose(
                c.reconstruct(pts), session.reconstruct(pts), rtol=1e-6)
            assert c.stats()["rejected"] == 0
    finally:
        srv.stop()


def test_connection_bound_refuses_excess_and_recovers(session):
    """Past max_connections the server must refuse new connections with an
    error frame (bounded threads under a connection flood) and accept
    again once one closes."""
    srv = PointServer(session, port=0, max_delay_ms=1.0,
                      max_connections=1).start()
    try:
        c1 = PointClient("127.0.0.1", srv.port)
        assert c1.ping()["ok"]
        c2 = PointClient("127.0.0.1", srv.port)
        with pytest.raises(RuntimeError, match="too many connections"):
            c2.ping()
        c2.close()
        c1.close()
        # The slot frees once the server notices the close.
        deadline = threading.Event()
        for _ in range(100):
            try:
                with PointClient("127.0.0.1", srv.port) as c3:
                    assert c3.ping()["ok"]
                break
            except RuntimeError:
                deadline.wait(0.05)
        else:
            pytest.fail("connection slot never freed")
    finally:
        srv.stop()


def test_mean_batch_ms_excludes_failed_batches():
    """A batch whose session call raises counts in 'batches' but must not
    dilute mean_batch_ms (it contributed no service time)."""
    calls = {"n": 0}

    class FlakySession:
        batch_size = 4
        num_point = NUM_POINT
        model_name = "model"

        def reconstruct(self, pts):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected device failure")
            return np.zeros_like(np.asarray(pts))

        def embed(self, pts):
            return np.zeros((np.asarray(pts).shape[0], 16), np.float32)

        def decode(self, emb):
            return np.zeros((np.asarray(emb).shape[0], NUM_POINT, 3),
                            np.float32)

    srv = PointServer(FlakySession(), port=0, max_delay_ms=1.0)
    srv.start(warmup=False)
    try:
        with PointClient("127.0.0.1", srv.port) as c:
            with pytest.raises(RuntimeError, match="injected"):
                c.reconstruct(_clouds(1, seed=22)[0])
            c.reconstruct(_clouds(1, seed=23)[0])  # succeeds
            stats = c.stats()
            assert stats["batches"] == 2 and stats["batches_timed"] == 1
            assert stats["mean_batch_ms"] > 0.0
    finally:
        srv.stop()


def test_start_warms_all_served_programs():
    """start() must compile-and-execute every served program BEFORE the
    socket accepts traffic: against a cold backend the first dispatch
    compiles for longer than the default client timeout, so an unwarmed
    server times out every client whose request lands in the first batch
    (observed live on the TPU tunnel -- serve.py:warmup docstring)."""

    calls = []

    class StubSession:
        batch_size = 4
        num_point = NUM_POINT
        model_name = "model"

        def reconstruct(self, pts):
            calls.append(("reconstruct", np.asarray(pts).shape))
            return np.zeros_like(np.asarray(pts))

        def embed(self, pts):
            calls.append(("embed", np.asarray(pts).shape))
            return np.zeros((np.asarray(pts).shape[0], 16), np.float32)

        def decode(self, emb):
            calls.append(("decode", np.asarray(emb).shape))
            return np.zeros((np.asarray(emb).shape[0], NUM_POINT, 3),
                            np.float32)

    srv = PointServer(StubSession(), port=0)
    srv.start()
    try:
        assert [op for op, _ in calls] == ["reconstruct", "embed", "decode"]
    finally:
        srv.stop()

    calls.clear()
    srv2 = PointServer(StubSession(), port=0)
    srv2.start(warmup=False)
    try:
        assert calls == []
    finally:
        srv2.stop()


def test_overload_rejects_fast_and_recovers(session):
    """Past max_pending_shapes the server must fail NEW requests
    immediately ('server overloaded') instead of queueing without bound,
    while already-admitted requests complete once the device frees up."""
    gate = threading.Event()
    gate.set()  # open during warmup

    class GatedSession:
        batch_size = session.batch_size
        num_point = session.num_point
        model_name = session.model_name

        def reconstruct(self, pts):
            gate.wait(timeout=30.0)
            return session.reconstruct(pts)

        embed = staticmethod(session.embed)
        decode = staticmethod(session.decode)

    srv = PointServer(GatedSession(), port=0, max_delay_ms=1.0,
                      max_pending_shapes=4).start()
    try:
        gate.clear()  # block the batcher mid-dispatch from here on
        pts = _clouds(4, seed=11)
        result = [None]

        def admitted():
            with PointClient("127.0.0.1", srv.port) as c:
                result[0] = c.reconstruct(pts)

        t = threading.Thread(target=admitted)
        t.start()
        # Wait until the 4 shapes are admitted (inflight == max_pending).
        for _ in range(200):
            with PointClient("127.0.0.1", srv.port) as c:
                if c.stats()["shapes"] >= 4:
                    break
            threading.Event().wait(0.02)
        with PointClient("127.0.0.1", srv.port) as c:
            with pytest.raises(RuntimeError, match="overloaded"):
                c.reconstruct(pts[:1])
            assert c.stats()["rejected"] == 1
        gate.set()  # free the device; the admitted request completes
        t.join(timeout=30.0)
        assert not t.is_alive()
        np.testing.assert_allclose(result[0], session.reconstruct(pts),
                                   rtol=1e-6)
        # Capacity is released after completion: new requests admit again.
        with PointClient("127.0.0.1", srv.port) as c:
            assert c.reconstruct(pts[:1]).shape == (1, NUM_POINT, 3)
    finally:
        gate.set()
        srv.stop()


def test_malformed_frames_do_not_kill_the_server(server, session):
    """Garbage on the wire (oversized headers, invalid JSON, absurd or
    negative shapes, truncated frames) must error or drop THAT connection
    only; the server keeps serving well-formed clients."""
    import socket
    import struct

    def raw(payload: bytes) -> bytes:
        """One framed message with the given header bytes."""
        return struct.pack(">I", len(payload)) + payload

    attacks = [
        struct.pack(">I", 1 << 20),                      # oversized header
        raw(b"this is not json"),                        # invalid JSON
        raw(b'{"op": "reconstruct", "shape": [999999999, 999999]}'),
        raw(b'{"op": "reconstruct", "shape": [-4, 64, 3]}'),
        raw(b'{"op": "embed", "shape": [1]}') + b"\x00",  # short payload
        b"\xff\xff",                                      # truncated length
        raw(b"[1, 2, 3]"),                                # non-dict header
        raw(b'"hello"'),                                  # non-dict header
        raw(b'{"op": "reconstruct", "shape": ["a", 3]}'),  # non-int dims
        raw(b'{"op": "reconstruct", "shape": [true, 64, 3]}'),  # bool dims
        # dims whose product overflows int64 (must not wrap negative)
        raw(b'{"op": "reconstruct", '
            b'"shape": [4611686018427387904, 4611686018427387904]}'),
    ]
    for attack in attacks:
        s = socket.create_connection(("127.0.0.1", server.port), timeout=10)
        try:
            s.sendall(attack)
            s.shutdown(socket.SHUT_WR)
            s.settimeout(10)
            try:
                s.recv(1 << 16)  # error frame or clean close; never a hang
            except OSError:
                pass
        finally:
            s.close()
    # A well-formed client still gets exact service.
    pts = _clouds(2, seed=31)
    with PointClient("127.0.0.1", server.port) as c:
        np.testing.assert_allclose(
            c.reconstruct(pts), session.reconstruct(pts), rtol=1e-6)
        assert c.ping()["ok"]


def test_request_stop_unblocks_waiting_clients(session):
    """request_stop (the SIGTERM path in cli.serve) must fail waiting
    clients with a clean 'server shutting down' error instead of leaving
    them blocked on a dead socket."""
    gate = threading.Event()
    gate.set()  # open during warmup

    class GatedSession:
        batch_size = session.batch_size
        num_point = session.num_point
        model_name = session.model_name

        def reconstruct(self, pts):
            gate.wait(timeout=30.0)
            return session.reconstruct(pts)

        embed = staticmethod(session.embed)
        decode = staticmethod(session.decode)

    srv = PointServer(GatedSession(), port=0, max_delay_ms=1.0).start()
    try:
        gate.clear()  # batcher will block mid-dispatch
        err = [None]

        def blocked_client():
            with PointClient("127.0.0.1", srv.port) as c:
                try:
                    c.reconstruct(_clouds(1, seed=13)[0])
                except RuntimeError as e:
                    err[0] = str(e)

        t = threading.Thread(target=blocked_client)
        t.start()
        # Wait until the request is admitted, then request shutdown.
        for _ in range(200):
            with PointClient("127.0.0.1", srv.port) as c:
                if c.stats()["shapes"] >= 1:
                    break
            threading.Event().wait(0.02)
        srv.request_stop()
        t.join(timeout=10.0)
        assert not t.is_alive()
        assert err[0] is not None and "shutting down" in err[0]
    finally:
        gate.set()
        srv.stop()


def test_interleaved_ops_batch_with_their_own_kind(session):
    """Mixed reconstruct/embed arrivals must NOT split a group at every
    op boundary: per-op pending queues coalesce each kind (a single FIFO
    degrades to occupancy ~1 under a strict op interleave)."""
    srv = PointServer(session, port=0, max_delay_ms=300.0).start()
    try:
        pts = _clouds(6, seed=9)
        results = [None] * 6
        barrier = threading.Barrier(6)

        def worker(i):
            with PointClient("127.0.0.1", srv.port) as c:
                barrier.wait()
                if i % 2 == 0:
                    results[i] = ("rec", c.reconstruct(pts[i]))
                else:
                    results[i] = ("emb", c.embed(pts[i]))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)

        want_rec = session.reconstruct(pts)
        want_emb = session.embed(pts)
        for i in range(6):
            kind, out = results[i]
            want = want_rec[i] if kind == "rec" else want_emb[i]
            np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

        with PointClient("127.0.0.1", srv.port) as c:
            stats = c.stats()
        assert stats["requests"] == 6 and stats["batched_shapes"] == 6
        # 3+3 mixed singles in a 300 ms window: one batch per op kind
        # (at most 3 if the window split), never the 5-6 of an
        # op-boundary-splitting FIFO.
        assert stats["batches"] <= 3
        assert stats["mean_batch_occupancy"] >= 2.0
    finally:
        srv.stop()


def test_decode_wrong_embedding_dim_rejected_cleanly(server):
    """Warmup learns the embedding width; a wrong-width decode request
    gets a protocol-level error (not a flax shape traceback) and the
    connection stays usable."""
    with PointClient("127.0.0.1", server.port) as c:
        with pytest.raises(RuntimeError, match="expected .* embeddings"):
            c.decode(np.zeros((2, 7), np.float32))
        out = c.reconstruct(np.zeros((NUM_POINT, 3), np.float32))
        assert out.shape == (NUM_POINT, 3)


def test_stalled_midframe_client_is_dropped_and_slot_reclaimed(session):
    """A client that sends a frame header and then stalls must be dropped
    after io_timeout_s instead of pinning its connection slot forever:
    with max_connections=1, the slot frees up for a real client. (With
    timeout-less sockets, max_connections half-frame connections were a
    permanent denial of service.)"""
    import socket
    import struct
    import time

    srv = PointServer(session, port=0, max_delay_ms=1.0,
                      max_connections=1, io_timeout_s=0.5).start()
    try:
        staller = socket.create_connection(("127.0.0.1", srv.port))
        header = json.dumps(
            {"op": "reconstruct", "shape": [1, NUM_POINT, 3]}).encode()
        # Header promises a float32 payload that never arrives.
        staller.sendall(struct.pack(">I", len(header)) + header)
        staller.settimeout(10.0)
        assert staller.recv(1) == b""  # server closed the stalled conn
        staller.close()
        # The slot is reclaimed: a fresh client gets served.
        deadline = time.time() + 10.0
        while True:
            try:
                with PointClient("127.0.0.1", srv.port, timeout=5.0) as c:
                    c.ping()
                break
            except (RuntimeError, OSError):
                if time.time() > deadline:
                    raise
                time.sleep(0.1)
    finally:
        srv.stop()


def test_decode_groups_key_on_embedding_width(session):
    """Before warmup learns _emb_dim (start(warmup=False)), decode
    requests with different embedding widths must never share one
    np.concatenate group — groups key on (op, per-item shape)."""
    from pointnet_autoencoder_tpu.serve import _Pending

    srv = PointServer(session, port=0, max_delay_ms=1.0)
    a = _Pending("decode", np.zeros((1, 8), np.float32))
    b = _Pending("decode", np.zeros((1, 16), np.float32))
    srv._queue.put(a)
    srv._queue.put(b)
    first = srv._collect()
    assert {p.data.shape[1] for p in first} == {8}
    second = srv._collect()
    assert {p.data.shape[1] for p in second} == {16}


def test_batcher_survives_unexpected_exception(session):
    """The sole batcher thread must outlive any per-iteration failure:
    an exception outside the dispatch call fails that group (if any) and
    the loop continues, instead of silently wedging the server."""
    srv = PointServer(session, port=0, max_delay_ms=1.0)
    calls = {"n": 0}
    orig = srv._collect

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected batcher failure")
        return orig()

    srv._collect = flaky  # patched before the batcher thread exists
    srv.start()
    try:
        with PointClient("127.0.0.1", srv.port) as c:
            out = c.reconstruct(_clouds(1, seed=31)[0])
            assert out.shape == (NUM_POINT, 3)
            assert c.stats()["errors"] >= 1
    finally:
        srv.stop()
