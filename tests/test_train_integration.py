"""Integration: end-to-end classification slice (SURVEY.md §4).

Train a tiny ViT on synthetic separable data over the fake 8-device CPU
mesh, checkpoint, resume, evaluate.
"""

import itertools

import jax
import numpy as np
import pytest

from arsvt_tpu.data.synthetic import synthetic_classification_batches
from arsvt_tpu.parallel.mesh import MeshConfig, make_mesh
from arsvt_tpu.parallel.sharding import shard_batch, shard_params
from arsvt_tpu.train.config import TRAIN_PRESETS
from arsvt_tpu.train.train_step import make_classifier_step_fns
from arsvt_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def cpu_mesh():
    return make_mesh(MeshConfig(), platform="cpu")


def test_train_reduces_loss_and_checkpoints(tmp_path, cpu_mesh):
    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=24,
        checkpoint_every=12,
        checkpoint_dir=str(tmp_path / "ckpt"),
        eval_every=10**9,
        log_every=8,
    )
    tr = Trainer(cfg, mesh=cpu_mesh)
    batches = synthetic_classification_batches(
        batch_size=cfg.batch_size, image_size=32, seed=0
    )
    first_batch = shard_batch(next(batches), cpu_mesh)
    tr.init_state()
    _, first_metrics = tr.train_step(
        {k: v for k, v in tr.state.items()}, first_batch, tr.base_rng
    )
    first_loss = float(first_metrics["loss"])

    tr.init_state()  # fresh state (previous was donated)
    last = tr.fit(batches)
    assert last["loss"] < first_loss

    # resume restores exact step and equivalent eval numbers
    def eval_batches():
        return itertools.islice(
            synthetic_classification_batches(
                batch_size=cfg.batch_size, image_size=32, seed=9
            ),
            2,
        )

    e1 = tr.evaluate(eval_batches())
    tr2 = Trainer(cfg, mesh=cpu_mesh)
    assert tr2.maybe_resume() == 24
    e2 = tr2.evaluate(eval_batches())
    assert e1["accuracy"] == e2["accuracy"]
    np.testing.assert_allclose(e1["loss"], e2["loss"], rtol=1e-6)


def test_checkpoint_config_mismatch_rejected(tmp_path, cpu_mesh):
    from arsvt_tpu.train.checkpoint import CheckpointManager

    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=2, checkpoint_every=2,
        checkpoint_dir=str(tmp_path / "ckpt2"), log_every=10**9,
    )
    tr = Trainer(cfg, mesh=cpu_mesh)
    tr.fit(
        synthetic_classification_batches(
            batch_size=cfg.batch_size, image_size=32, seed=0
        )
    )
    # a different architecture must refuse the checkpoint (the reference's
    # silent strict=False bug, SURVEY.md §3.4)
    bad_cfg = cfg.with_overrides(preset="deit_test_8_32")
    bad_tr = Trainer(bad_cfg, mesh=cpu_mesh)
    bad_tr.init_state()
    mgr = CheckpointManager(bad_cfg.checkpoint_dir, bad_cfg)
    with pytest.raises(ValueError, match="different model config"):
        mgr.restore(bad_tr.state)
    mgr.close()


def test_dp_grad_equivalence(cpu_mesh):
    """pmean-over-mesh == single-device large batch (SURVEY.md §4)."""
    cfg = TRAIN_PRESETS["smoke"].with_overrides(bf16=False)
    init_fn, train_step, _ = make_classifier_step_fns(cfg, mesh=None)
    batch = next(
        synthetic_classification_batches(batch_size=16, image_size=32, seed=3)
    )
    rng = jax.random.PRNGKey(0)

    state1 = init_fn(jax.random.fold_in(rng, 0xA11))
    state1, m1 = train_step(state1, batch, rng)

    init_fn2, train_step2, _ = make_classifier_step_fns(cfg, mesh=cpu_mesh)
    state2 = init_fn2(jax.random.fold_in(rng, 0xA11))
    sharded = shard_batch(batch, cpu_mesh)
    state2, m2 = train_step2(state2, sharded, rng)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    p1 = jax.tree_util.tree_leaves(state1["params"])
    p2 = jax.tree_util.tree_leaves(state2["params"])
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="DP-sharded update differs from single-device update",
        )


def test_streaming_classifier():
    from arsvt_tpu.evaluation.classify import StreamingClassifier
    from arsvt_tpu.models.classifier import init_image_classifier
    from arsvt_tpu.models.registry import get_preset
    import jax.numpy as jnp

    cfg = get_preset("vit_test_8_32")
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, 6)
    clf = StreamingClassifier(params, cfg, 6, compute_dtype=jnp.float32)
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    idx, name, probs = clf(img)
    assert 0 <= idx < 6
    assert name in (
        "glass", "paper", "cardboard", "plastic", "metal", "trash"
    )
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    stats = clf.latency_stats()
    assert stats["n"] == 1 and stats["p50_ms"] > 0


def test_jitted_step_loss_matches_unjitted():
    """SURVEY §4: jitted train-step loss parity vs un-jitted computation."""
    import jax.numpy as jnp

    from arsvt_tpu.models.classifier import apply_image_classifier
    from arsvt_tpu.objectives.classification import softmax_cross_entropy
    from arsvt_tpu.train.config import TRAIN_PRESETS, resolve_backbone

    cfg = TRAIN_PRESETS["smoke"].with_overrides(bf16=False)
    init_fn, train_step, _ = make_classifier_step_fns(cfg, mesh=None)
    state = init_fn(jax.random.PRNGKey(0xA11))
    batch = next(
        synthetic_classification_batches(batch_size=8, image_size=32, seed=1)
    )
    # compute the manual (un-jitted) value FIRST: train_step donates the
    # state, invalidating its buffers afterwards
    bb = resolve_backbone(cfg)
    logits = apply_image_classifier(
        state["params"], jnp.asarray(batch["image"]), bb, cfg.num_classes,
        train=True, rng=jax.random.fold_in(jax.random.PRNGKey(0), 0),
    )
    manual = float(softmax_cross_entropy(
        logits, jnp.asarray(batch["label"]), num_classes=cfg.num_classes
    ))
    _, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]), manual, rtol=1e-5)


def test_plateau_state_survives_resume(tmp_path, cpu_mesh):
    """VERDICT round-1 weak #6: best/bad_epochs counters must resume."""
    from arsvt_tpu.train.optim import PlateauState

    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=4, checkpoint_every=4, schedule="plateau",
        checkpoint_dir=str(tmp_path / "ck"), eval_every=10**9,
        log_every=10**9,
    )
    tr = Trainer(cfg, mesh=cpu_mesh)
    tr.init_state()
    tr.plateau = PlateauState(scale=0.49, best=1.23, bad_epochs=1)
    tr.fit(synthetic_classification_batches(
        batch_size=cfg.batch_size, image_size=32, seed=0))

    tr2 = Trainer(cfg, mesh=cpu_mesh)
    assert tr2.maybe_resume() == 4
    assert tr2.plateau.scale == 0.49
    assert tr2.plateau.best == 1.23
    assert tr2.plateau.bad_epochs == 1


def test_distillation_trains(tmp_path, cpu_mesh):
    """DeiT distillation path (the reference's flags are dead code,
    train.py:1382-1384): teacher checkpoint -> hard & soft student steps."""
    tcfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=6, checkpoint_every=6, eval_every=10**9,
        log_every=10**9, checkpoint_dir=str(tmp_path / "teacher"),
    )
    teacher = Trainer(tcfg, mesh=cpu_mesh)
    teacher.fit(synthetic_classification_batches(
        batch_size=tcfg.batch_size, image_size=32, seed=0))

    for mode in ("hard", "soft"):
        scfg = tcfg.with_overrides(
            preset="deit_test_8_32", distillation=mode,
            distill_teacher=str(tmp_path / "teacher"),
            checkpoint_dir=str(tmp_path / f"student_{mode}"),
            total_steps=4, checkpoint_every=10**9,
            # soft also exercises the teacher as an explicit jit argument
            # INSIDE the scanned microbatch step (accum + distillation)
            grad_accum=2 if mode == "soft" else 1,
        )
        st = Trainer(scfg, mesh=cpu_mesh)
        last = st.fit(synthetic_classification_batches(
            batch_size=scfg.batch_size, image_size=32, seed=1))
        assert np.isfinite(last["loss"])
        assert "loss_distill" in last and np.isfinite(last["loss_distill"])


def test_distillation_validation_errors():
    cfg = TRAIN_PRESETS["smoke"].with_overrides(distillation="hard")
    with pytest.raises(ValueError, match="DeiT"):
        make_classifier_step_fns(cfg)  # vit_test_8_32 has no DIST token
    with pytest.raises(ValueError, match="distill_teacher"):
        make_classifier_step_fns(cfg.with_overrides(preset="deit_test_8_32"))


def test_fused_adamw_step_wiring(cpu_mesh):
    """cfg.fused_adamw=True drives the whole train step (classifier); the
    state stays optax-chain-shaped so checkpoints interoperate (math parity
    is pinned in test_config_optim.py::test_fused_adamw_matches_optax)."""
    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=3, fused_adamw=True
    )
    init_fn, train_step, _ = make_classifier_step_fns(cfg, mesh=cpu_mesh)
    state = init_fn(jax.random.PRNGKey(0))
    batches = synthetic_classification_batches(
        batch_size=cfg.batch_size, image_size=32, seed=0
    )
    rng = jax.random.PRNGKey(1)
    for batch in itertools.islice(batches, 3):
        state, metrics = train_step(state, shard_batch(batch, cpu_mesh), rng)
    assert int(state["step"]) == 3
    assert np.isfinite(float(metrics["loss"]))


def test_fused_adamw_checkpoint_interop(tmp_path, cpu_mesh):
    """State layout parity claim (optim.py): a checkpoint written under the
    fused AdamW path restores and continues under the optax chain, and
    vice versa — the optimizer state tree is identical."""
    base = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=4, checkpoint_every=2, eval_every=10**9,
        log_every=10**9,
    )
    for first, then in ((True, False), (False, True)):
        ckdir = str(tmp_path / f"ck_{int(first)}")
        cfg = base.with_overrides(fused_adamw=first, checkpoint_dir=ckdir)
        tr = Trainer(cfg, mesh=cpu_mesh)
        tr.init_state()
        batches = synthetic_classification_batches(
            batch_size=cfg.batch_size, image_size=32, seed=3
        )
        for batch in itertools.islice(batches, 2):
            b = shard_batch(batch, cpu_mesh)
            tr.state, m = tr.train_step(tr.state, b, jax.random.PRNGKey(1))
        tr.ckpt.save(2, jax.device_get(tr.state))
        tr.ckpt.wait()

        tr2 = Trainer(cfg.with_overrides(fused_adamw=then), mesh=cpu_mesh)
        assert tr2.maybe_resume() == 2
        for batch in itertools.islice(batches, 2):
            b = shard_batch(batch, cpu_mesh)
            tr2.state, m = tr2.train_step(
                tr2.state, b, jax.random.PRNGKey(1)
            )
        assert int(tr2.state["step"]) == 4
        assert np.isfinite(float(m["loss"]))


def test_grad_accum_equivalence_classifier():
    """grad_accum=4 == accum=1 exactly (per-sample-mean loss decomposes;
    augment/mixup/dropout off so the per-microbatch rng fold is unused)."""
    cfg = TRAIN_PRESETS["smoke"].with_overrides(bf16=False)
    batch = next(
        synthetic_classification_batches(batch_size=16, image_size=32, seed=3)
    )
    rng = jax.random.PRNGKey(0)

    init_fn, step1, _ = make_classifier_step_fns(cfg, mesh=None)
    s1 = init_fn(jax.random.fold_in(rng, 0xA11))
    s1, m1 = step1(s1, batch, rng)

    _, step4, _ = make_classifier_step_fns(
        cfg.with_overrides(grad_accum=4), mesh=None
    )
    s4 = init_fn(jax.random.fold_in(rng, 0xA11))
    s4, m4 = step4(s4, batch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s4["params"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="accumulated update differs from full-batch update",
        )


def test_grad_accum_rejects_indivisible_batch():
    cfg = TRAIN_PRESETS["smoke"].with_overrides(bf16=False, grad_accum=3)
    _, step, _ = make_classifier_step_fns(cfg, mesh=None)
    init_fn, _, _ = make_classifier_step_fns(cfg, mesh=None)
    state = init_fn(jax.random.PRNGKey(0))
    batch = next(
        synthetic_classification_batches(batch_size=16, image_size=32, seed=0)
    )
    with pytest.raises(ValueError, match="must divide the batch dim"):
        step(state, batch, jax.random.PRNGKey(0))


def test_grad_accum_equivalence_detector():
    """Detector accum=2 == accum=1 when every image carries the same box
    count (the num_boxes normalizer then decomposes exactly); triplet off
    because batch-hard mining is deliberately per-microbatch under accum."""
    from arsvt_tpu.train.detect_step import make_detector_step_fns

    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        preset="detector_test", task="detect", batch_size=8,
        max_objects=4, bf16=False, w_triplet=0.0,
    )
    rng_np = np.random.default_rng(5)
    B, M = 8, 4
    boxes = np.zeros((B, M, 4), np.float32)
    for i in range(B):
        for j in range(2):  # exactly 2 valid boxes per image
            x0, y0 = rng_np.uniform(0.05, 0.5, 2)
            boxes[i, j] = [x0, y0, x0 + 0.3, y0 + 0.3]
    batch = {
        "image": rng_np.uniform(0, 1, (B, 32, 32, 3)).astype(np.float32),
        "boxes": boxes,
        "labels": rng_np.integers(0, 6, (B, M)).astype(np.int32),
        "mask": np.tile(np.array([1, 1, 0, 0], bool), (B, 1)),
    }
    rng = jax.random.PRNGKey(1)

    init_fn, step1, _ = make_detector_step_fns(cfg, mesh=None)
    s1 = init_fn(jax.random.fold_in(rng, 0xA11))
    s1, m1 = step1(s1, batch, rng)

    _, step2, _ = make_detector_step_fns(
        cfg.with_overrides(grad_accum=2), mesh=None
    )
    s2 = init_fn(jax.random.fold_in(rng, 0xA11))
    s2, m2 = step2(s2, batch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_grad_accum_under_dp_mesh(cpu_mesh):
    """Accumulation composes with the data mesh: accum=2 on the 8-way DP
    mesh matches accum=1 on the same mesh."""
    cfg = TRAIN_PRESETS["smoke"].with_overrides(bf16=False)
    batch = next(
        synthetic_classification_batches(batch_size=16, image_size=32, seed=7)
    )
    rng = jax.random.PRNGKey(2)

    init_fn, step1, _ = make_classifier_step_fns(cfg, mesh=cpu_mesh)
    s1 = init_fn(jax.random.fold_in(rng, 0xA11))
    s1, m1 = step1(s1, shard_batch(batch, cpu_mesh), rng)

    _, step2, _ = make_classifier_step_fns(
        cfg.with_overrides(grad_accum=2), mesh=cpu_mesh
    )
    s2 = init_fn(jax.random.fold_in(rng, 0xA11))
    s2, m2 = step2(s2, shard_batch(batch, cpu_mesh), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1["params"]),
                    jax.tree_util.tree_leaves(s2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_training_is_deterministic_for_fixed_seed():
    """Two fresh runs with the same TrainConfig.seed produce bit-identical
    metrics — reproducibility is a framework guarantee (stateless PRNG
    folded from config.seed; no hidden host RNG in the step)."""
    cfg = TRAIN_PRESETS["smoke"].with_overrides(bf16=False, total_steps=4)

    def run():
        init_fn, step, _ = make_classifier_step_fns(cfg, mesh=None)
        tr = Trainer(cfg, step_fns=(init_fn, step,
                                    make_classifier_step_fns(cfg)[2]))
        batches = synthetic_classification_batches(
            batch_size=cfg.batch_size, image_size=32, seed=7
        )
        tr.init_state()
        last = tr.fit(batches, steps=4)
        return last["loss"], jax.tree_util.tree_leaves(
            tr.state["params"])[0]

    l1, p1 = run()
    l2, p2 = run()
    assert l1 == l2
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_best_checkpoint_gc_keeps_latest_and_best(tmp_path, cpu_mesh):
    """orbax best_fn alone would garbage-collect the LATEST checkpoint
    whenever its val_loss is not among the best — deleting the resume
    point of any overfitting run. The manager must keep latest-N for
    resume AND the single best for deployment."""
    from arsvt_tpu.train.checkpoint import CheckpointManager

    cfg = TRAIN_PRESETS["smoke"]
    mgr = CheckpointManager(str(tmp_path / "ck"), cfg, keep=2,
                            best_metric="val_loss")
    init_fn, _, _ = make_classifier_step_fns(cfg, mesh=cpu_mesh)
    state = jax.device_get(init_fn(jax.random.PRNGKey(0)))
    # best at step 1, then the run overfits (worsening val loss)
    for step, loss in [(1, 0.5), (2, 0.8), (3, 0.9), (4, 1.0)]:
        mgr.save(step, state, metrics={"val_loss": loss})
    # a metric-less periodic save (no eval at that step) must also survive
    # as the most recent
    mgr.save(5, state)
    mgr.wait()
    assert mgr.latest_step == 5          # resume point survives
    assert mgr.best_step == 1            # best survives GC
    restored, _ = mgr.restore(state, step=1)
    assert int(restored["step"]) == int(state["step"])
    mgr.close()


def test_evaluate_weights_ragged_batches(cpu_mesh):
    """val loss is a per-example mean: a 1-image tail batch must not get
    the same vote as a full batch (mean-of-means bias)."""
    cfg = TRAIN_PRESETS["smoke"]

    def fake_eval(params, batch):
        b = batch["image"].shape[0]
        return {"loss": np.float32(1.0 if b == 4 else 0.0)}

    init_fn, train_step, _ = make_classifier_step_fns(cfg, mesh=cpu_mesh)
    tr = Trainer(cfg, mesh=cpu_mesh, step_fns=(init_fn, train_step,
                                               fake_eval))
    tr.init_state()
    batches = iter([
        {"image": np.zeros((4, 32, 32, 3), np.float32),
         "label": np.zeros((4,), np.int32)},
        {"image": np.zeros((1, 32, 32, 3), np.float32),
         "label": np.zeros((1,), np.int32)},
    ])
    out = tr.evaluate(batches)
    np.testing.assert_allclose(out["loss"], 4.0 / 5.0)  # not 0.5


def test_resume_is_bit_equivalent_to_uninterrupted(tmp_path, cpu_mesh):
    """Crash + --resume must reproduce the uninterrupted run exactly:
    optimizer state restores, the step rng folds by step number, and the
    data stream fast-forwards past consumed batches (train/cli.py) — so
    params after N steps are identical either way."""
    from arsvt_tpu.data.coco import CocoDataset
    from arsvt_tpu.data.pipeline import classification_batches
    from arsvt_tpu.data.synthetic import make_synthetic_coco

    root = make_synthetic_coco(
        str(tmp_path / "coco"), splits=("train",), images_per_split=16,
        image_size=32, max_boxes=1,
    )
    ds = CocoDataset(root + "/train")
    base = TRAIN_PRESETS["smoke"].with_overrides(
        batch_size=4, eval_every=10**9, log_every=10**9, seed=3,
    )
    kw = dict(batch_size=4, canvas=32, seed=3)

    # uninterrupted: 6 steps
    cfg_a = base.with_overrides(total_steps=6, checkpoint_every=10**9)
    tr_a = Trainer(cfg_a, mesh=cpu_mesh)
    it = classification_batches(ds, **kw)
    tr_a.fit(it)
    it.close()

    # interrupted at 3, resumed to 6 with the fast-forwarded stream
    ck = str(tmp_path / "ck")
    cfg_b1 = base.with_overrides(total_steps=3, checkpoint_every=3,
                                 checkpoint_dir=ck)
    tr_b = Trainer(cfg_b1, mesh=cpu_mesh)
    it = classification_batches(ds, **kw)
    tr_b.fit(it)
    it.close()

    cfg_b2 = base.with_overrides(total_steps=6, checkpoint_every=10**9,
                                 checkpoint_dir=ck)
    tr_b2 = Trainer(cfg_b2, mesh=cpu_mesh)
    start = tr_b2.maybe_resume()
    assert start == 3
    it = classification_batches(ds, skip_batches=start, **kw)
    tr_b2.fit(it)
    it.close()

    for a, b in zip(
        jax.tree_util.tree_leaves(tr_a.state["params"]),
        jax.tree_util.tree_leaves(tr_b2.state["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
