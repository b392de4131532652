"""InferenceSession tests: checkpoint restore, batching, chamfer metric."""

import os

import jax
import numpy as np
import pytest

from pointnet_autoencoder_tpu.config import TrainConfig
from pointnet_autoencoder_tpu.data import synthetic
from pointnet_autoencoder_tpu.data.shapenet_part import PartDataset
from pointnet_autoencoder_tpu.inference import InferenceSession

NUM_POINT = 64


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("fix")
    synthetic.write_fixture(str(root), shapes_per_category=48,
                            points_per_shape=80, seed=0)
    log_dir = str(tmp_path_factory.mktemp("log"))
    from pointnet_autoencoder_tpu.train.loop import Trainer

    cfg = TrainConfig(model="model", category="Chair", log_dir=log_dir,
                      num_point=NUM_POINT, max_epoch=1, batch_size=8,
                      data_path=str(root), seed=0, log_every=100)
    trainer = Trainer(cfg)
    trainer.train()
    ckpt = trainer.ckpt.latest()
    assert ckpt is not None
    return str(root), ckpt


def test_session_reconstruct_shapes(trained):
    root, ckpt = trained
    sess = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    pts, _ = ds[0]
    # Single cloud.
    rec = sess.reconstruct(pts)
    assert rec.shape == (NUM_POINT, 3)
    # Batch not divisible by the compiled batch size (padding path).
    batch = np.stack([ds[i][0] for i in range(6)])
    recs = sess.reconstruct(batch)
    assert recs.shape == (6, NUM_POINT, 3)
    # Padded results must equal unpadded per-shape results.
    np.testing.assert_allclose(recs[0], sess.reconstruct(batch[0]),
                               rtol=1e-5, atol=1e-5)


def test_session_embed_and_chamfer(trained):
    root, ckpt = trained
    sess = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    pts, _ = ds[0]
    emb = sess.embed(pts)
    assert emb.shape == (1024,)
    cd = sess.chamfer(pts[None], pts[None])
    np.testing.assert_allclose(cd, 0.0, atol=1e-6)
    # F-score: 1 on identical clouds, 0 far away; threshold is a traced
    # argument (no retrace across tau values).
    np.testing.assert_allclose(sess.fscore(pts[None], pts[None]), 1.0)
    np.testing.assert_allclose(
        sess.fscore(pts[None] + 50.0, pts[None], threshold=0.05), 0.0)


def test_session_data_parallel_matches_single_device(trained):
    """Sharded serving (variables replicated, batches split over the
    'data' axis) must reproduce single-device results across the whole
    public surface — the serving-side counterpart of the DP-equivalence
    training tests in test_parallel.py."""
    root, ckpt = trained
    n_dev = len(jax.devices())
    assert n_dev == 8  # conftest forces the 8-device CPU backend
    ref = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    dp = InferenceSession("model", ckpt, NUM_POINT, batch_size=8,
                          data_parallel=n_dev)
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    batch = np.stack([ds[i][0] for i in range(6)])  # ragged for both
    np.testing.assert_allclose(dp.reconstruct(batch),
                               ref.reconstruct(batch),
                               rtol=1e-5, atol=1e-5)
    emb_dp, emb_ref = dp.embed(batch), ref.embed(batch)
    np.testing.assert_allclose(emb_dp, emb_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dp.decode(emb_dp), ref.decode(emb_ref),
                               rtol=1e-5, atol=1e-5)
    # chamfer: sharded when divisible, replicated fallback when not.
    full = np.concatenate([batch, batch[:n_dev - len(batch)]])
    np.testing.assert_allclose(dp.chamfer(full, full),
                               np.zeros(n_dev), atol=1e-6)
    np.testing.assert_allclose(dp.chamfer(batch[:1], batch[:1]),
                               np.zeros(1), atol=1e-6)
    # evaluate(): each dataset access re-resamples points (reference
    # semantics), so give each session its own identically-seeded dataset
    # to make the two runs see the same clouds.
    ds_a = PartDataset(root, npoints=NUM_POINT, split="test",
                       class_choice=["Chair"], seed=7)
    ds_b = PartDataset(root, npoints=NUM_POINT, split="test",
                       class_choice=["Chair"], seed=7)
    _, per_dp = dp.evaluate(ds_a, num_shapes=10)
    _, per_ref = ref.evaluate(ds_b, num_shapes=10)
    np.testing.assert_allclose(per_dp, per_ref, rtol=1e-5, atol=1e-5)


def test_session_model_parallel_matches_single_device(trained):
    """DP x TP serving: restored decoder FC weights sharded column/row
    over 'model' must reproduce single-device reconstruction/decoding."""
    from jax.sharding import PartitionSpec as P

    root, ckpt = trained
    ref = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    tp = InferenceSession("model", ckpt, NUM_POINT, batch_size=8,
                          data_parallel=4, model_parallel=2)
    k = tp._variables["params"]["decoder"]["fc1"]["dense"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    batch = np.stack([ds[i][0] for i in range(6)])
    np.testing.assert_allclose(tp.reconstruct(batch),
                               ref.reconstruct(batch),
                               rtol=1e-5, atol=1e-5)
    emb = ref.embed(batch)
    np.testing.assert_allclose(tp.decode(emb), ref.decode(emb),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_session_matches_unpipelined(trained):
    """2-stage serving pipeline (encoder|neck on device 0, decoder on
    device 1, microbatched) must reproduce the unpipelined forward — the
    eval-mode split is exact because BN uses moving statistics."""
    from pointnet_autoencoder_tpu.parallel.pp import PipelinedSession

    root, ckpt = trained
    ref = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    pp = PipelinedSession(ref, num_microbatches=2)
    # The stages really live on different devices.
    d0 = jax.tree_util.tree_leaves(pp._enc_vars)[0].devices()
    d1 = jax.tree_util.tree_leaves(pp._dec_vars)[0].devices()
    assert d0 != d1

    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    batch = np.stack([ds[i][0] for i in range(5)])  # ragged vs microbatch
    np.testing.assert_allclose(pp.reconstruct(batch),
                               ref.reconstruct(batch),
                               rtol=1e-5, atol=1e-6)
    # Single-cloud surface too.
    np.testing.assert_allclose(pp.reconstruct(batch[0]),
                               ref.reconstruct(batch[0]),
                               rtol=1e-5, atol=1e-6)

    # Stage-only surfaces: embed runs stage 0 alone, decode stage 1 alone.
    emb = pp.embed(batch)
    np.testing.assert_allclose(emb, ref.embed(batch), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(pp.decode(emb), ref.decode(emb),
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="divide"):
        PipelinedSession(ref, num_microbatches=3)
    with pytest.raises(ValueError, match="2 stage devices"):
        PipelinedSession(ref, devices=jax.devices()[:3])


def test_session_data_parallel_rejects_indivisible_batch(trained):
    root, ckpt = trained
    with pytest.raises(ValueError, match="divisible"):
        InferenceSession("model", ckpt, NUM_POINT, batch_size=6,
                         data_parallel=4)


def test_session_decode_from_latent(trained):
    """decode() must be exactly the decoder stage of the full forward:
    decode(embed(x)) == reconstruct(x), and interpolated latents decode to
    finite clouds of the right shape (the latent-space serving surface —
    no reference analog)."""
    root, ckpt = trained
    sess = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    batch = np.stack([ds[i][0] for i in range(2)])
    emb = sess.embed(batch)
    np.testing.assert_allclose(sess.decode(emb), sess.reconstruct(batch),
                               rtol=1e-5, atol=1e-5)
    # Single latent in, single cloud out.
    one = sess.decode(emb[0])
    assert one.shape == (NUM_POINT, 3)
    # A latent neither endpoint produced still decodes to a valid cloud.
    mid = sess.decode(0.5 * (emb[0] + emb[1]))
    assert mid.shape == (NUM_POINT, 3) and np.all(np.isfinite(mid))
    with pytest.raises(ValueError):
        sess.decode(np.zeros((2, 3, 4), np.float32))


def test_session_evaluate(trained):
    root, ckpt = trained
    sess = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    mean_cd, per_shape = sess.evaluate(ds, num_shapes=5, seed=0)
    assert per_shape.shape == (5,)
    assert np.isfinite(mean_cd) and mean_cd > 0
    np.testing.assert_allclose(mean_cd, per_shape.mean(), rtol=1e-6)


def test_session_rejects_wrong_shape(trained):
    _, ckpt = trained
    sess = InferenceSession("model", ckpt, NUM_POINT, batch_size=2)
    with pytest.raises(ValueError):
        sess.reconstruct(np.zeros((10, 3), np.float32))


def test_session_restores_momentum_checkpoint(trained, tmp_path):
    """A checkpoint written with --optimizer momentum (reference
    train.py:117-120) must restore: the optimizer slot layout differs from
    Adam's, and round 1 hardcoded an Adam abstract tree."""
    root, _ = trained
    log_dir = str(tmp_path / "log_momentum")
    from pointnet_autoencoder_tpu.train.loop import Trainer

    cfg = TrainConfig(model="model", category="Chair", log_dir=log_dir,
                      num_point=NUM_POINT, max_epoch=1, batch_size=8,
                      data_path=root, seed=0, log_every=100,
                      optimizer="momentum")
    trainer = Trainer(cfg)
    trainer.train()
    ckpt = trainer.ckpt.latest()
    assert ckpt is not None

    sess = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    rec = sess.reconstruct(ds[0][0])
    assert rec.shape == (NUM_POINT, 3)
    assert np.all(np.isfinite(rec))
    # Restored params must match the trainer's final params (proves the
    # restore used the right tree rather than silently reinitializing).
    trained_kernel = np.asarray(jax.device_get(
        trainer.state.params["encoder"]["conv1"]["dense"]["kernel"]))
    restored_kernel = np.asarray(
        sess._variables["params"]["encoder"]["conv1"]["dense"]["kernel"])
    np.testing.assert_array_equal(trained_kernel, restored_kernel)

    # Fallback path: with no config.json next to the checkpoint the session
    # must still find the momentum layout by trial.
    import shutil
    bare = tmp_path / "bare"
    bare.mkdir()
    shutil.copytree(ckpt, bare / os.path.basename(ckpt))
    sess2 = InferenceSession("model", str(bare / os.path.basename(ckpt)),
                             NUM_POINT, batch_size=4)
    np.testing.assert_array_equal(
        restored_kernel,
        np.asarray(sess2._variables["params"]["encoder"]["conv1"]["dense"]
                   ["kernel"]))


def test_session_restores_bf16_diet_checkpoint(trained, tmp_path):
    """A checkpoint written with --bf16_params --bf16_moments must restore
    for inference: bf16 master params and the (count, inner) bf16_moments
    opt-state wrapper both change the stored tree vs the plain-Adam
    abstract (round-5 regression — cli.test failed on such checkpoints)."""
    root, _ = trained
    log_dir = str(tmp_path / "log_diet")
    from pointnet_autoencoder_tpu.train.loop import Trainer

    cfg = TrainConfig(model="model", category="Chair", log_dir=log_dir,
                      num_point=NUM_POINT, max_epoch=1, batch_size=8,
                      data_path=root, seed=0, log_every=100,
                      bf16_params=True, bf16_moments=True)
    trainer = Trainer(cfg)
    trainer.train()
    ckpt = trainer.ckpt.latest()
    assert ckpt is not None

    sess = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    rec = sess.reconstruct(ds[0][0])
    assert rec.shape == (NUM_POINT, 3)
    assert np.all(np.isfinite(rec))
    # The bf16-stored kernel upcasts into the session's f32 template
    # losslessly (bf16 embeds exactly in f32).
    trained_kernel = np.asarray(jax.device_get(
        trainer.state.params["encoder"]["conv1"]["dense"]["kernel"]
    ).astype(np.float32))
    restored_kernel = np.asarray(
        sess._variables["params"]["encoder"]["conv1"]["dense"]["kernel"])
    assert restored_kernel.dtype == np.float32
    np.testing.assert_array_equal(trained_kernel, restored_kernel)

    # Fallback path: no config.json → the diet layout is found by trial.
    import shutil
    bare = tmp_path / "bare_diet"
    bare.mkdir()
    shutil.copytree(ckpt, bare / os.path.basename(ckpt))
    sess2 = InferenceSession("model", str(bare / os.path.basename(ckpt)),
                             NUM_POINT, batch_size=4)
    np.testing.assert_array_equal(
        restored_kernel,
        np.asarray(sess2._variables["params"]["encoder"]["conv1"]["dense"]
                   ["kernel"]))


def test_bundle_export_roundtrip(trained, tmp_path):
    """Params-only serving bundle: export from a training checkpoint, load
    via from_bundle and via the export CLI, identical reconstructions, and
    materially smaller than the training checkpoint on disk."""
    root, ckpt = trained
    sess = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    pts, _ = ds[0]

    bundle = sess.export_bundle(str(tmp_path / "bundle"))
    sess2 = InferenceSession.from_bundle(bundle, batch_size=4)
    assert sess2.model_name == "model" and sess2.num_point == NUM_POINT
    np.testing.assert_array_equal(sess.reconstruct(pts),
                                  sess2.reconstruct(pts))

    def du(path):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(path) for f in fs)

    assert du(bundle) < 0.6 * du(ckpt)  # no optimizer slots

    from pointnet_autoencoder_tpu.cli.export import main as export_main
    out2 = export_main(["--model", "model", "--model_path", ckpt,
                        "--num_point", str(NUM_POINT), "--batch_size", "4",
                        "--out", str(tmp_path / "bundle_cli")])
    sess3 = InferenceSession.from_bundle(out2, batch_size=4)
    np.testing.assert_array_equal(sess.reconstruct(pts),
                                  sess3.reconstruct(pts))

    # Overwriting an existing *bundle* is allowed (variables.ckpt is an
    # orbax checkpoint); a mistyped --out whose variables.ckpt is an
    # unrelated directory is refused instead of silently rmtree'd.
    sess.export_bundle(bundle)
    unrelated = tmp_path / "precious" / "variables.ckpt"
    unrelated.mkdir(parents=True)
    (unrelated / "data.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        sess.export_bundle(str(tmp_path / "precious"))
    assert (unrelated / "data.txt").read_text() == "do not delete"


def test_wrong_model_restore_diagnoses_family_mismatch(trained):
    """Restoring a checkpoint under the wrong --model must say the model
    family mismatches, not bury the cause in optimizer-layout errors
    (each decoder family has its own variable tree)."""
    _root, ckpt = trained  # trained with --model model
    with pytest.raises(ValueError, match="different\\s+--model"):
        InferenceSession("model_hierachy", ckpt, NUM_POINT, batch_size=2)


def test_wrong_num_point_restore_diagnoses_shape_mismatch(trained):
    """Same model family but a different --num_point must be diagnosed as
    a shape (num_point) mismatch, not a model-family one."""
    _root, ckpt = trained  # trained at NUM_POINT
    with pytest.raises(ValueError, match="different\\s+--num_point"):
        InferenceSession("model", ckpt, NUM_POINT * 2, batch_size=2)


def test_session_bf16_mode(trained):
    """bf16 serving (round-4, --bf16 on cli.serve): bf16 matmuls with
    bf16-STORED weights. Reconstructions stay within bf16 tolerance of the
    f32 session; decode(embed(x)) == reconstruct(x) holds inside the mode;
    weights really are stored bf16 (half the HBM); a bundle exported from
    a bf16 session reopens in either mode (bundles stay f32 on disk)."""
    import jax.numpy as jnp

    root, ckpt = trained
    sess32 = InferenceSession("model", ckpt, NUM_POINT, batch_size=4)
    sess16 = InferenceSession("model", ckpt, NUM_POINT, batch_size=4,
                              bf16=True)
    kernel = sess16.variables["params"]["decoder"]["fc3"]["dense"]["kernel"]
    assert kernel.dtype == jnp.bfloat16
    stats = sess16.variables["batch_stats"]["encoder"]["conv1"]["bn"]["mean"]
    assert stats.dtype == jnp.float32

    ds = PartDataset(root, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    batch = np.stack([ds[i][0] for i in range(4)])
    r32 = sess32.reconstruct(batch)
    r16 = sess16.reconstruct(batch)
    scale = float(np.abs(r32).max())
    assert float(np.abs(r16 - r32).max()) < 0.02 * max(scale, 1.0)
    # Internal consistency of the mode (the serving contract).
    np.testing.assert_allclose(sess16.decode(sess16.embed(batch)), r16,
                               rtol=1e-5, atol=1e-5)

    out = sess16.export_bundle(os.path.join(os.path.dirname(ckpt),
                                            "bf16_bundle"))
    re32 = InferenceSession.from_bundle(out, batch_size=4)
    re16 = InferenceSession.from_bundle(out, batch_size=4, bf16=True)
    np.testing.assert_allclose(re16.reconstruct(batch), r16,
                               rtol=1e-5, atol=1e-5)
    assert float(np.abs(re32.reconstruct(batch) - r32).max()) \
        < 0.02 * max(scale, 1.0)


def test_serve_cli_bf16_flag():
    from pointnet_autoencoder_tpu.cli import serve as serve_cli

    args = serve_cli.build_parser().parse_args(
        ["--model_path", "x", "--bf16"])
    assert args.bf16 is True
    assert serve_cli.build_parser().parse_args(
        ["--model_path", "x"]).bf16 is False
