"""Serve a trained model over TCP with dynamic batching.

    python -m pointnet_autoencoder_tpu.cli.serve \\
        --model model --model_path serving/bundle --num_point 2048 \\
        --host 0.0.0.0 --port 7433

``--model_path`` accepts a training checkpoint (model.ckpt /
best_model_epoch_NNN.ckpt), a serving bundle (cli/export.py), or an
imported reference checkpoint (cli/import_tf.py). Protocol and client
(``PointClient``) are in pointnet_autoencoder_tpu/serve.py; concurrent
requests are coalesced into full device batches (see that module's
docstring). The reference has no serving surface at all (its test.py is
an interactive per-shape loop, test.py:79-93).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="model")
    p.add_argument("--model_path", required=True)
    p.add_argument("--num_point", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=32,
                   help="Compiled device batch = packing limit")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7433)
    p.add_argument("--max_delay_ms", type=float, default=2.0,
                   help="How long a partial batch waits for co-riders")
    p.add_argument("--max_pending_shapes", type=int, default=None,
                   help="Backpressure bound: shapes admitted but not yet "
                        "answered; past it requests fail fast with "
                        "'server overloaded' [default: 64 batches' worth]")
    p.add_argument("--max_connections", type=int, default=256,
                   help="Concurrent-connection bound (one thread each); "
                        "excess connections are refused with an error "
                        "frame [default: 256]")
    p.add_argument("--io_timeout", type=float, default=30.0,
                   help="Per-socket read/write deadline in seconds; a "
                        "client stalled mid-frame is dropped after this "
                        "long instead of pinning a connection slot "
                        "[default: 30]")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 serving: bf16 matmuls + bf16-stored "
                        "weights (BN stats stay f32). Matches the training "
                        "default's compute class; ~2-9%% faster forwards at "
                        "large batch with half the weight bytes. Off by "
                        "default (f32, HIGHEST-precision matmuls)")
    p.add_argument("--data_parallel", type=int, default=None,
                   help="Shard server batches over N devices")
    p.add_argument("--pipeline_parallel", action="store_true",
                   help="Two-stage encoder|decoder pipeline on the first "
                        "two devices (parallel/pp.py); exclusive with "
                        "--data_parallel")
    p.add_argument("--num_microbatches", type=int, default=4,
                   help="Microbatches per batch under --pipeline_parallel")
    p.add_argument("--compilation_cache_dir", default=None,
                   help="Persistent XLA compilation cache: a restarted "
                        "server reloads its compiled programs, cutting the "
                        "warmup that otherwise recompiles every served op")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.compilation_cache_dir:
        from pointnet_autoencoder_tpu.utils.backend import (
            enable_compilation_cache,
        )

        enable_compilation_cache(args.compilation_cache_dir)
    from pointnet_autoencoder_tpu.inference import InferenceSession
    from pointnet_autoencoder_tpu.serve import PointServer

    import os

    if os.path.exists(os.path.join(args.model_path, "bundle_meta.json")):
        session = InferenceSession.from_bundle(
            args.model_path, batch_size=args.batch_size,
            data_parallel=args.data_parallel, bf16=args.bf16)
    else:
        session = InferenceSession(
            args.model, args.model_path, args.num_point,
            batch_size=args.batch_size, data_parallel=args.data_parallel,
            bf16=args.bf16)
    if args.pipeline_parallel:
        if args.data_parallel:
            raise SystemExit(
                "--pipeline_parallel is exclusive with --data_parallel")
        from pointnet_autoencoder_tpu.parallel.pp import PipelinedSession

        session = PipelinedSession(
            session, num_microbatches=args.num_microbatches)
    server = PointServer(session, host=args.host, port=args.port,
                         max_delay_ms=args.max_delay_ms,
                         max_pending_shapes=args.max_pending_shapes,
                         max_connections=args.max_connections,
                         io_timeout_s=args.io_timeout)
    print("warming up compiled programs (first compile can take minutes "
          "on a cold backend)...", flush=True)
    server.start()  # warmup runs before the socket binds
    print(f"serving {session.model_name} (num_point={session.num_point}, "
          f"batch={args.batch_size}) on {args.host}:{server.port}",
          flush=True)
    # SIGTERM (systemd/k8s stop, TPU preemption) drains cleanly: queued
    # requests get 'server shutting down' errors instead of dead sockets.
    import signal

    signal.signal(signal.SIGTERM, lambda s, f: server.request_stop())
    server.serve_forever()
    print("server stopped", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
