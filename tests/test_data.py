"""Data-layer tests: COCO reader, letterbox, on-device augmentation, pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arsvt_tpu.data.augment import (
    ClassifyAugmentConfig,
    DetectionAugmentConfig,
    classification_train_augment,
    coarse_dropout,
    color_jitter,
    denormalize,
    detection_train_augment,
    eval_preprocess,
    normalize,
    rand_augment,
    random_affine,
    random_horizontal_flip,
    random_resized_crop,
    resize,
)
from arsvt_tpu.data.coco import CocoDataset
from arsvt_tpu.data.pipeline import (
    Prefetcher,
    classification_batches,
    detection_batches,
    letterbox,
    load_image,
)
from arsvt_tpu.data.synthetic import make_synthetic_coco


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    return make_synthetic_coco(str(root), images_per_split=6, image_size=48)


def test_coco_reader(coco_root):
    ds = CocoDataset(coco_root + "/train")
    assert len(ds) == 6
    assert ds.num_classes == 6
    assert ds.class_names[0] == "glass"
    # label mapping round-trip (category ids are 1-based in the fixture)
    for cid, lab in ds.category_id_to_label.items():
        assert ds.label_to_category_id[lab] == cid
    for rec in ds.records:
        assert rec.boxes.shape[1] == 4
        if rec.boxes.size:
            assert (rec.boxes >= 0).all() and (rec.boxes <= 1).all()
            assert (rec.boxes[:, 2] > rec.boxes[:, 0]).all()
            assert (rec.boxes[:, 3] > rec.boxes[:, 1]).all()


def test_coco_degenerate_boxes_dropped(tmp_path):
    import json, os
    d = tmp_path / "s"
    d.mkdir()
    from PIL import Image
    Image.new("RGB", (32, 32)).save(d / "a.jpg")
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 32, "height": 32}],
        "annotations": [
            {"id": 1, "image_id": 1, "bbox": [2, 2, 10, 10],
             "category_id": 1, "area": 100, "iscrowd": 0},
            {"id": 2, "image_id": 1, "bbox": [5, 5, 0.5, 10],
             "category_id": 1, "area": 5, "iscrowd": 0},  # degenerate w
            {"id": 3, "image_id": 1, "bbox": [31.5, 2, 10, 10],
             "category_id": 1, "area": 100, "iscrowd": 0},  # clips to sliver
        ],
        "categories": [{"id": 1, "name": "glass"}],
    }
    (d / "_annotations.coco.json").write_text(json.dumps(coco))
    ds = CocoDataset(str(d))
    rec = ds.records[0]
    assert len(rec.labels) == 2  # sliver survives (x2>x1), zero-width dropped
    t = ds.padded_target(0, 5)
    assert t["mask"].sum() == 2
    assert t["boxes"].shape == (5, 4)


def test_padded_target_truncates(coco_root):
    ds = CocoDataset(coco_root + "/train")
    t = ds.padded_target(0, 1)
    assert t["boxes"].shape == (1, 4)


def test_letterbox_box_transform():
    img = np.random.default_rng(0).uniform(size=(20, 40, 3)).astype(np.float32)
    out, tf = letterbox(img, 64)
    assert out.shape == (64, 64, 3)
    # full-width box stays full-width; y gets centered padding
    boxes = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    new = tf(boxes)
    np.testing.assert_allclose(new[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(new[0, 2], 1.0, atol=1e-6)
    # 20/40 aspect -> scaled height 32, pad (64-32)//2=16 -> y1=16/64
    np.testing.assert_allclose(new[0, 1], 16 / 64, atol=1e-6)
    np.testing.assert_allclose(new[0, 3], 48 / 64, atol=1e-6)


def test_flip_box_math():
    key = jax.random.PRNGKey(0)
    img = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 3)
    boxes = jnp.array([[0.1, 0.2, 0.4, 0.6]])
    out, new = random_horizontal_flip(key, img, boxes, p=1.0)
    np.testing.assert_allclose(np.asarray(new), [[0.6, 0.2, 0.9, 0.6]],
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img[:, ::-1]))


def test_affine_identity():
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (16, 16, 3))
    boxes = jnp.array([[0.25, 0.25, 0.75, 0.75]])
    mask = jnp.array([True])
    out, nb, nm = random_affine(
        key, img, boxes, mask, degrees=0.0, scale=(1.0, 1.0),
        translate=0.0, shear=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)
    np.testing.assert_allclose(np.asarray(nb), np.asarray(boxes), atol=1e-5)
    assert bool(nm[0])


def test_bilinear_warp_variants_identical():
    """The three gather strategies (taps / flat linear-index / single
    2x2-patch gather) must be tap-for-tap identical — they are perf
    variants of one op (ARSVT_WARP_VARIANT; benchmarks/warp_bench.py),
    not different resamplers. Exercises interior, out-of-image and
    edge-straddling taps via a big rotation + translation."""
    from arsvt_tpu.data.augment import _BILINEAR_VARIANTS

    img = jax.random.uniform(jax.random.PRNGKey(3), (24, 20, 3))
    th = 0.6
    rot = (
        jnp.eye(3)
        .at[0, 0].set(jnp.cos(th)).at[0, 1].set(-jnp.sin(th))
        .at[1, 0].set(jnp.sin(th)).at[1, 1].set(jnp.cos(th))
        .at[0, 2].set(3.7).at[1, 2].set(-2.2)
    )
    outs = {
        name: np.asarray(fn(img, jnp.linalg.inv(rot)))
        for name, fn in _BILINEAR_VARIANTS.items()
        if name != "shear_matmul"  # approximate — own test below
    }
    np.testing.assert_allclose(outs["flat"], outs["taps"], atol=1e-6)
    np.testing.assert_allclose(outs["patch"], outs["taps"], atol=1e-6)
    # zeros outside the source footprint (the warp's padding contract)
    assert outs["taps"].min() >= 0.0 and np.any(outs["taps"] == 0.0)


def test_shear_matmul_warp_close_to_bilinear():
    """The gather-free 3-pass matmul warp is a different (slightly more
    smoothing) resampler, not a different transform: exact for pure
    scale+translate (each pass degenerates to one 1-D lerp), close to
    direct bilinear for rotation+shear on smooth content, and zero
    outside the source footprint."""
    from arsvt_tpu.data.augment import (
        _bilinear_warp_taps,
        _shear_matmul_warp,
    )

    # smooth image: bilinear-resized noise
    small = jax.random.uniform(jax.random.PRNGKey(5), (6, 6, 3))
    img = jax.image.resize(small, (48, 40, 3), "linear")

    # pure translate+scale: exact (same single-axis lerps). highest
    # matmul precision: TPU's default truncates fp32 operands, which
    # would swamp the exactness assertion (production augmentation
    # doesn't need it — the closeness bound below holds either way)
    m = jnp.diag(jnp.asarray([1.04, 0.97, 1.0]))
    m = m.at[0, 2].set(2.3).at[1, 2].set(-1.7)
    with jax.default_matmul_precision("highest"):
        np.testing.assert_allclose(
            np.asarray(_shear_matmul_warp(img, m)),
            np.asarray(_bilinear_warp_taps(img, m)),
            atol=2e-5,
        )

    # rotation + shear + translate: close on smooth content
    th = 0.5
    rot = (
        jnp.eye(3)
        .at[0, 0].set(jnp.cos(th)).at[0, 1].set(-jnp.sin(th))
        .at[1, 0].set(jnp.sin(th)).at[1, 1].set(jnp.cos(th))
        .at[0, 2].set(2.0).at[1, 2].set(-1.0)
    )
    minv = jnp.linalg.inv(rot)
    ref = np.asarray(_bilinear_warp_taps(img, minv))
    got = np.asarray(_shear_matmul_warp(img, minv))
    assert np.abs(got - ref).mean() < 0.015
    # interior pixels (both nonzero) agree much tighter
    inside = (ref > 0).all(-1) & (got > 0).all(-1)
    assert np.abs(got[inside] - ref[inside]).mean() < 0.01
    assert np.any(got == 0.0)  # zeros outside persist through 3 passes


def test_warp_variant_keys_the_jit_trace():
    """Regression for the round-4 warpbench artifact bug: selecting the
    warp variant via ARSVT_WARP_VARIANT around the module-level-jitted
    detection_train_augment re-served the first variant's compiled code
    (env reads are invisible to the trace cache), so all four 'variants'
    timed identically. The variant now rides the STATIC config
    (DetectionAugmentConfig.warp_variant) — prove that switching it
    in-process actually switches the compiled warp: shear_matmul (an
    approximate resampler) must differ from taps under a rotation, while
    flat must stay bit-identical to taps through the same plumbing."""
    from arsvt_tpu.data.augment import (
        DetectionAugmentConfig,
        detection_train_augment,
    )

    key = jax.random.PRNGKey(11)
    small = jax.random.uniform(jax.random.PRNGKey(5), (6, 6, 3))
    img = jax.image.resize(small, (32, 32, 3), "linear")
    boxes = jnp.array([[0.2, 0.3, 0.7, 0.6]])
    mask = jnp.array([True])

    def run(variant):
        cfg = DetectionAugmentConfig(
            image_size=32, warp_variant=variant,
            # isolate the affine warp: every other stochastic stage off,
            # warp guaranteed on
            affine_p=1.0, shadow_p=0.0, flip_p=0.0, jitter_p=0.0,
            dropout_p=0.0,
        )
        out, _, _ = detection_train_augment(key, img, boxes, mask, cfg)
        return np.asarray(out)

    taps, flat, shear = run("taps"), run("flat"), run("shear_matmul")
    np.testing.assert_array_equal(flat, taps)
    assert np.abs(shear - taps).max() > 1e-4


def test_default_warp_variant_is_shear_matmul(monkeypatch):
    """Round-5 promotion pin: an empty/unset variant must resolve to the
    gather-free shear_matmul default (mAP-parity-gated in
    detection_generalization_{taps,shear}.json), and the env var must
    still override it back to the exact resampler. Guards against a
    silent regression of the default that bench.py and the CLI inherit."""
    from arsvt_tpu.data import augment as aug

    assert aug._WARP_DEFAULT == "shear_matmul"
    monkeypatch.delenv("ARSVT_WARP_VARIANT", raising=False)

    small = jax.random.uniform(jax.random.PRNGKey(5), (6, 6, 3))
    img = jax.image.resize(small, (32, 32, 3), "linear")
    # a rotation: where the approximate resampler visibly differs
    th = 0.4
    inv = jnp.array(
        [[jnp.cos(th), -jnp.sin(th), 4.0], [jnp.sin(th), jnp.cos(th), -2.0]]
    )
    default_out = np.asarray(aug._bilinear_warp(img, inv))
    shear_out = np.asarray(aug._bilinear_warp(img, inv, variant="shear_matmul"))
    taps_out = np.asarray(aug._bilinear_warp(img, inv, variant="taps"))
    np.testing.assert_array_equal(default_out, shear_out)
    assert np.abs(default_out - taps_out).max() > 1e-4

    monkeypatch.setenv("ARSVT_WARP_VARIANT", "taps")
    env_out = np.asarray(aug._bilinear_warp(img, inv))
    np.testing.assert_array_equal(env_out, taps_out)


def test_affine_p_and_ellipse_box_method():
    """Affine.p: with p=0 nothing changes (image, boxes, mask pass
    through); with the default p=0.5, roughly half of many draws apply.
    Ellipse box method: under pure rotation the transformed box is
    strictly TIGHTER than the corner-AABB method (the reference's
    rotate_method='ellipse', train.py:422)."""
    img = jax.random.uniform(jax.random.PRNGKey(8), (32, 32, 3))
    boxes = jnp.array([[0.2, 0.3, 0.7, 0.6]])
    mask = jnp.array([True])

    out, nb, nm = random_affine(
        jax.random.PRNGKey(0), img, boxes, mask, p=0.0
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(nb), np.asarray(boxes))
    assert bool(nm[0])

    applied = 0
    for seed in range(40):
        out, _, _ = random_affine(
            jax.random.PRNGKey(seed), img, boxes, mask, p=0.5
        )
        applied += int(not np.array_equal(np.asarray(out),
                                          np.asarray(img)))
    assert 8 <= applied <= 32  # ~half, loose binomial bounds

    # pure 30° rotation about the center: ellipse AABB ⊂ corner AABB
    from arsvt_tpu.data.augment import _transform_boxes

    th = jnp.deg2rad(30.0)
    rot = (
        jnp.eye(3)
        .at[0, 0].set(jnp.cos(th)).at[0, 1].set(-jnp.sin(th))
        .at[1, 0].set(jnp.sin(th)).at[1, 1].set(jnp.cos(th))
    )
    center = jnp.eye(3).at[0, 2].set(16.0).at[1, 2].set(16.0)
    unc = jnp.eye(3).at[0, 2].set(-16.0).at[1, 2].set(-16.0)
    fwd = center @ rot @ unc
    with jax.default_matmul_precision("highest"):  # fp32 einsum on TPU
        big, _ = _transform_boxes(boxes, mask, fwd, 32, 32,
                                  min_visibility=0.1, min_area_px=1.0,
                                  method="largest_box")
        tight, _ = _transform_boxes(boxes, mask, fwd, 32, 32,
                                    min_visibility=0.1, min_area_px=1.0,
                                    method="ellipse")
    def area(b):
        return float((b[0, 2] - b[0, 0]) * (b[0, 3] - b[0, 1]))
    assert area(tight) < area(big)
    # both centered identically (rotation about box... same center map)
    np.testing.assert_allclose(
        np.asarray(tight[0, :2] + tight[0, 2:]),
        np.asarray(big[0, :2] + big[0, 2:]), atol=1e-4,
    )


def test_augment_bf16_toggle(monkeypatch):
    """ARSVT_AUGMENT_BF16=1 runs the warp in bf16 (half the gather
    traffic): output dtype flips and pixels stay within bf16 quantization
    of the fp32 result (pixel granularity 2^-8 ~= uint8's 1/255)."""
    from arsvt_tpu.data.augment import _bilinear_warp

    img = jax.random.uniform(jax.random.PRNGKey(4), (16, 16, 3))
    m = jnp.eye(3).at[0, 2].set(1.3).at[1, 2].set(-0.7)
    ref = _bilinear_warp(img, m)
    assert ref.dtype == jnp.float32
    monkeypatch.setenv("ARSVT_AUGMENT_BF16", "1")
    out = _bilinear_warp(img, m)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=1.5 / 255
    )


def test_affine_translate_kills_offscreen_box():
    key = jax.random.PRNGKey(2)
    img = jax.random.uniform(key, (16, 16, 3))
    # tiny box at left edge; huge positive x-translation pushes it off-canvas
    boxes = jnp.array([[0.0, 0.4, 0.1, 0.5]])
    mask = jnp.array([True])
    _, _, nm = random_affine(
        key, img, boxes, mask, degrees=0.0, scale=(1.0, 1.0),
        translate=0.0, shear=0.0, min_visibility=0.5,
    )
    assert bool(nm[0])  # identity keeps it
    from arsvt_tpu.data.augment import _transform_boxes
    fwd = jnp.eye(3).at[0, 2].set(15.9)  # box (1.6px wide) nearly all off-canvas
    _, nm2 = _transform_boxes(boxes, mask, fwd, 16, 16,
                              min_visibility=0.5, min_area_px=1.0)
    assert not bool(nm2[0])


def test_color_jitter_probability_gate():
    key = jax.random.PRNGKey(3)
    img = jax.random.uniform(key, (8, 8, 3))
    out = color_jitter(key, img, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    out2 = color_jitter(key, img, p=1.0)
    assert not np.allclose(np.asarray(out2), np.asarray(img))


def test_normalize_roundtrip():
    img = jax.random.uniform(jax.random.PRNGKey(4), (8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(denormalize(normalize(img))), np.asarray(img), atol=1e-6
    )


def test_coarse_dropout_fills_white():
    # reference CoarseDropout fills with 255 (white = 1.0), train.py:440
    img = jnp.zeros((64, 64, 3))
    out = coarse_dropout(jax.random.PRNGKey(5), img, p=1.0)
    assert float(out.max()) == 1.0
    assert float(out.mean()) < 0.5  # most pixels survive
    # hole sizes: 1-3 holes of 5-12% per side -> filled fraction bounded by
    # 3 * 0.12^2 ≈ 4.3% of the image
    filled = float((np.asarray(out) == 1.0).mean())
    assert 0.0 < filled <= 3 * 0.12 * 0.12 + 1e-3


def test_detection_augment_reference_parity_table():
    """Parameter-by-parameter parity with /root/reference/train.py:387-443
    (VERDICT round-1 weak #3). Left column = our defaults, right = the
    reference's albumentations arguments."""
    cfg = DetectionAugmentConfig()
    parity = [
        # (ours, reference value, reference site)
        (cfg.shadow_roi, (0.0, 0.7, 1.0, 1.0), "RandomShadow.shadow_roi"),
        (cfg.shadow_num, (1, 3), "RandomShadow.num_shadows_limit"),
        (cfg.shadow_intensity, (0.2, 0.7),
         "RandomShadow.shadow_intensity_range"),
        (cfg.flip_p, 0.5, "HorizontalFlip.p"),
        (cfg.affine_p, 0.5,
         "Affine.p (unset in train.py → albumentations default 0.5)"),
        (cfg.scale, (0.95, 1.05), "Affine.scale"),
        (cfg.translate, 0.05, "Affine.translate_percent"),
        (cfg.degrees, 45.0, "Affine.rotate"),
        (cfg.shear, 15.0, "Affine.shear"),
        (cfg.box_rotate_method, "ellipse", "Affine.rotate_method"),
        (cfg.jitter_brightness, 0.1, "ColorJitter.brightness"),
        (cfg.jitter_contrast, 0.15, "ColorJitter.contrast"),
        (cfg.jitter_saturation, 0.2, "ColorJitter.saturation"),
        (cfg.jitter_hue, 0.03, "ColorJitter.hue"),
        (cfg.jitter_p, 0.6, "ColorJitter.p"),
        (cfg.dropout_holes, (1, 3), "CoarseDropout.num_holes_range"),
        (cfg.dropout_size, (0.05, 0.12), "CoarseDropout.hole_*_range"),
        (cfg.dropout_fill, 1.0, "CoarseDropout.fill=255 (white)"),
        (cfg.dropout_p, 0.25, "CoarseDropout.p"),
        (cfg.min_visibility, 0.1, "BboxParams.min_visibility"),
        (cfg.min_area_px, 1.0, "BboxParams.min_area"),
    ]
    for ours, ref, site in parity:
        assert ours == ref, f"{site}: ours={ours} reference={ref}"
    # DOCUMENTED DEVIATION — Affine.interpolation: the reference resamples
    # with cv2.INTER_LANCZOS4 (train.py:417). "lanczos4" is implemented
    # and oracle-tested (test_lanczos4_warp_*) but measured 15x slower on
    # TPU (64 scalar gathers; 1353 vs 89 ms per bs32×256² batch = a 10x
    # detector-step regression), so the training default is bilinear and
    # exact-parity runs opt in via DetectionAugmentConfig(interpolation=
    # "lanczos4").
    assert cfg.interpolation == "bilinear"
    assert "lanczos4" in __import__(
        "arsvt_tpu.data.augment", fromlist=["_WARPS"]
    )._WARPS


def test_lanczos4_warp_identity_and_shift():
    """Lanczos-4 interpolates exactly at integer sample points: identity
    and integer-pixel translations must reproduce the image bit-near-exactly
    (the kernel is 1 at 0 and 0 at every other integer)."""
    from arsvt_tpu.data.augment import _lanczos4_warp

    img = jax.random.uniform(jax.random.PRNGKey(6), (24, 24, 3))
    out = _lanczos4_warp(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # integer shift: inv matrix maps output (x,y) -> source (x+2, y+3)
    inv = jnp.eye(3).at[0, 2].set(2.0).at[1, 2].set(3.0)
    out = np.asarray(_lanczos4_warp(img, inv))
    ref = np.asarray(img)[3:, 2:]
    np.testing.assert_allclose(out[: ref.shape[0], : ref.shape[1]], ref,
                               atol=1e-5)


def test_lanczos4_warp_clamps_overshoot():
    from arsvt_tpu.data.augment import _lanczos4_warp

    # hard edge drives Lanczos overshoot; output must stay in [0,1] like
    # the reference's uint8 saturation
    img = jnp.zeros((32, 32, 3)).at[:, 16:].set(1.0)
    inv = jnp.eye(3).at[0, 2].set(0.5)  # half-pixel shift
    out = np.asarray(_lanczos4_warp(img, inv))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_random_shadow_stays_in_roi():
    from arsvt_tpu.data.augment import random_shadow

    img = jnp.ones((40, 40, 3))
    out = random_shadow(jax.random.PRNGKey(11), img, p=1.0)
    arr = np.asarray(out)
    # top 70% (rows < 28) must be untouched; bottom 30% darkened somewhere
    np.testing.assert_array_equal(arr[:28], 1.0)
    assert arr[28:].min() < 1.0


def test_random_resized_crop_full_equals_resize():
    img = jax.random.uniform(jax.random.PRNGKey(6), (32, 32, 3))
    out = random_resized_crop(
        jax.random.PRNGKey(7), img, 16, scale=(1.0, 1.0), ratio=(1.0, 1.0)
    )
    ref = resize(img, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)


def test_detection_train_augment_shapes():
    key = jax.random.PRNGKey(8)
    img = jax.random.uniform(key, (64, 64, 3))
    boxes = jnp.array([[0.2, 0.2, 0.6, 0.6], [0.0, 0.0, 0.0, 0.0]])
    mask = jnp.array([True, False])
    cfg = DetectionAugmentConfig(image_size=32)
    out, nb, nm = detection_train_augment(key, img, boxes, mask, cfg)
    assert out.shape == (32, 32, 3)
    assert nb.shape == (2, 4)
    assert not bool(nm[1])  # padding stays invalid


def test_classification_augment_and_randaugment():
    key = jax.random.PRNGKey(9)
    img = jax.random.uniform(key, (64, 64, 3))
    cfg = ClassifyAugmentConfig(image_size=32, rand_augment=True)
    out = classification_train_augment(key, img, cfg)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    ra = rand_augment(key, img, magnitude=0.8)
    assert ra.shape == img.shape and np.isfinite(np.asarray(ra)).all()


def test_eval_preprocess():
    img = jax.random.uniform(jax.random.PRNGKey(10), (48, 48, 3))
    out = eval_preprocess(img, size=32)
    assert out.shape == (32, 32, 3)


def test_detection_batches(coco_root):
    ds = CocoDataset(coco_root + "/train")
    it = detection_batches(
        ds, batch_size=4, canvas=64, max_objects=5, repeat=False,
        shuffle=False,
    )
    b = next(it)
    assert b["image"].shape == (4, 64, 64, 3)
    assert b["boxes"].shape == (4, 5, 4)
    assert b["labels"].shape == (4, 5)
    assert b["mask"].shape == (4, 5)
    # uint8 raw bytes by default (4x less H2D); fp32 on request
    assert b["image"].dtype == np.uint8
    assert (b["boxes"] >= 0).all() and (b["boxes"] <= 1).all()
    it_f = detection_batches(
        ds, batch_size=4, canvas=64, max_objects=5, repeat=False,
        shuffle=False, image_dtype=np.float32,
    )
    bf = next(it_f)
    it_f.close()
    assert bf["image"].dtype == np.float32
    np.testing.assert_allclose(
        bf["image"], b["image"].astype(np.float32) / 255.0, atol=1.0 / 255
    )


def test_classification_batches_skip_empty(coco_root):
    ds = CocoDataset(coco_root + "/valid")
    labels = ds.classification_labels()
    it = classification_batches(
        ds, batch_size=2, canvas=64, repeat=False, shuffle=False,
        drop_remainder=False,
    )
    total = sum(batch["label"].shape[0] for batch in it)
    assert total == int((labels >= 0).sum())


def test_prefetcher_propagates_errors():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = Prefetcher(bad())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
        next(it)


def test_augmentation_deterministic_under_fixed_key():
    """SURVEY §4: augmentation determinism under fixed PRNG keys."""
    key = jax.random.PRNGKey(42)
    img = jax.random.uniform(jax.random.fold_in(key, 1), (64, 64, 3))
    boxes = jnp.array([[0.2, 0.2, 0.7, 0.7]])
    mask = jnp.array([True])
    cfg = DetectionAugmentConfig(image_size=32)
    out1 = detection_train_augment(key, img, boxes, mask, cfg)
    out2 = detection_train_augment(key, img, boxes, mask, cfg)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different key -> different augmentation
    out3 = detection_train_augment(jax.random.fold_in(key, 9), img, boxes,
                                   mask, cfg)
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out3[0]))

    ccfg = ClassifyAugmentConfig(image_size=32, rand_augment=True)
    c1 = classification_train_augment(key, img, ccfg)
    c2 = classification_train_augment(key, img, ccfg)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_synthetic_boxes_visible_and_aligned(tmp_path):
    """Every annotated box in the synthetic set must stay visible (no box
    painted over another — occluded GT is unlearnable supervision) and its
    interior must match the class color after the full load path."""
    from arsvt_tpu.data.pipeline import load_letterboxed
    from arsvt_tpu.data.synthetic import _CLASS_COLORS

    root = make_synthetic_coco(
        str(tmp_path / "al"), splits=("train",), images_per_split=24,
        image_size=64, max_boxes=3, seed=5,
    )
    ds = CocoDataset(root + "/train")
    images, _ = load_letterboxed(
        [r.path for r in ds.records], 64, records=ds.records, dtype=np.uint8
    )
    checked = 0
    for i in range(len(ds)):
        t = ds.padded_target(i, 8)
        img = images[i].astype(np.float32) / 255.0
        live = [b for b, m in zip(t["boxes"], t["mask"]) if m]
        # pairwise non-overlap (normalized xyxy)
        for a in range(len(live)):
            for b in range(a + 1, len(live)):
                ax1, ay1, ax2, ay2 = live[a]
                bx1, by1, bx2, by2 = live[b]
                assert (ax1 >= bx2 or bx1 >= ax2 or ay1 >= by2 or by1 >= ay2)
        for box, lab, m in zip(t["boxes"], t["labels"], t["mask"]):
            if not m:
                continue
            x1, y1, x2, y2 = (np.asarray(box) * 64).round().astype(int)
            inside = img[y1 + 1 : y2 - 1, x1 + 1 : x2 - 1]
            if inside.size == 0:
                continue
            err = np.abs(inside - _CLASS_COLORS[lab]).mean()
            assert err < 0.05, (i, lab, err)
            checked += 1
    assert checked >= 10


def test_taxonomy_name_mapping_overrides_id_order(tmp_path):
    """COCO exports with recycling-taxonomy names but different id order
    (e.g. alphabetical) map labels by NAME onto the canonical order —
    otherwise every displayed class name would be silently wrong."""
    import json as _json

    from arsvt_tpu.data.taxonomy import RECYCLING_CLASSES

    d = tmp_path / "alpha" / "train"
    d.mkdir(parents=True)
    # alphabetical id order: cardboard=1, glass=2, metal=3 ...
    alpha = sorted(RECYCLING_CLASSES)
    coco = {
        "images": [{"id": 1, "file_name": "x.jpg", "width": 8, "height": 8}],
        "annotations": [{
            "id": 1, "image_id": 1, "bbox": [1, 1, 4, 4],
            "category_id": alpha.index("glass") + 1, "area": 16, "iscrowd": 0,
        }],
        "categories": [
            {"id": i + 1, "name": n, "supercategory": "waste"}
            for i, n in enumerate(alpha)
        ],
    }
    (d / "_annotations.coco.json").write_text(_json.dumps(coco))
    from PIL import Image as _Image

    _Image.new("RGB", (8, 8)).save(d / "x.jpg")
    ds = CocoDataset(str(d))
    assert ds.class_names == list(RECYCLING_CLASSES)
    # the glass annotation gets the canonical glass label (0), not the
    # sorted-id label (1)
    assert ds.records[0].labels[0] == 0


def test_taxonomy_subset_keeps_sorted_id_order(tmp_path):
    """A dataset listing only a SUBSET of the taxonomy must NOT be
    reordered: compacted 0..n-1 labels would not equal canonical taxonomy
    indices, and different splits listing different subsets would get
    mutually inconsistent maps (advisor round-2 medium). Subsets keep the
    reference's sorted-id rule."""
    import json as _json

    d = tmp_path / "subset" / "train"
    d.mkdir(parents=True)
    coco = {
        "images": [{"id": 1, "file_name": "x.jpg", "width": 8, "height": 8}],
        "annotations": [],
        "categories": [
            {"id": 1, "name": "plastic", "supercategory": "waste"},
            {"id": 2, "name": "glass", "supercategory": "waste"},
        ],
    }
    (d / "_annotations.coco.json").write_text(_json.dumps(coco))
    from PIL import Image as _Image

    _Image.new("RGB", (8, 8)).save(d / "x.jpg")
    ds = CocoDataset(str(d))
    # sorted-id order, NOT taxonomy order (glass before plastic)
    assert ds.class_names == ["plastic", "glass"]
    assert ds.category_id_to_label == {1: 0, 2: 1}


def test_prefetcher_exhaustion_raises_not_blocks():
    p = Prefetcher(iter([1, 2]), depth=1)
    assert list(p) == [1, 2]
    import pytest as _pytest

    with _pytest.raises(StopIteration):
        next(p)  # must raise again, not block forever


def test_synthetic_shapes_not_color_separable():
    """The classification-generalization surface (VERDICT round-2 #4): the
    per-class MEAN COLOR must carry ~zero signal (shapes/texture only), and
    the per-class mean IMAGES must differ (there is geometric signal)."""
    from arsvt_tpu.data.synthetic import synthetic_shape_batches

    gen = synthetic_shape_batches(batch_size=128, image_size=24, seed=0)
    imgs, labs = [], []
    for _ in range(16):
        b = next(gen)
        imgs.append(b["image"])
        labs.append(b["label"])
    imgs = np.concatenate(imgs)
    labs = np.concatenate(labs)
    assert len(np.unique(labs)) == 6
    mean_colors = np.stack(
        [imgs[labs == c].mean(axis=(0, 1, 2)) for c in range(6)]
    )
    # fg/bg colors are drawn class-independently, so per-class mean color
    # deviation is pure sampling noise (se ~ 0.245/sqrt(n_per_class))
    color_spread = np.abs(mean_colors - mean_colors.mean(0)).max()
    assert color_spread < 0.05, mean_colors
    # a color-only probe must stay at chance: softmax regression on the
    # (mean RGB, RGB std) feature vector — the old generator was solvable
    # this way (per-class mean colors), this one must not be
    feats = np.concatenate(
        [imgs.mean(axis=(1, 2)), imgs.std(axis=(1, 2))], axis=1
    )
    feats = (feats - feats.mean(0)) / (feats.std(0) + 1e-9)
    w = np.zeros((feats.shape[1], 6))
    onehot = np.eye(6)[labs]
    for _ in range(300):  # full-batch GD, lr 0.5
        logits = feats @ w
        p = np.exp(logits - logits.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        w -= 0.5 * feats.T @ (p - onehot) / len(labs)
    acc = ((feats @ w).argmax(1) == labs).mean()
    assert acc < 0.28, f"color probe solves the set: {acc:.3f}"  # chance=1/6
    # ...while the geometry does differ: fixed-seed masks of different
    # classes disagree on a substantial pixel fraction
    from arsvt_tpu.data.synthetic import _shape_mask

    masks = [
        _shape_mask(c, 32, np.random.default_rng(123)) for c in range(6)
    ]
    for a in range(6):
        for b in range(a + 1, 6):
            assert (masks[a] ^ masks[b]).mean() > 0.04, (a, b)


def test_synthetic_shapes_deterministic():
    from arsvt_tpu.data.synthetic import synthetic_shape_batches

    a = next(synthetic_shape_batches(batch_size=4, image_size=16, seed=3))
    b = next(synthetic_shape_batches(batch_size=4, image_size=16, seed=3))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["label"], b["label"])


def test_prefetcher_abandoned_iterator_is_collected():
    """The worker closure must not capture the Prefetcher: a live thread
    referencing self keeps it reachable forever, so abandoning the
    iterator (no close()) would leak the thread + queued batches for the
    life of the process."""
    import gc
    import threading

    from arsvt_tpu.data.pipeline import Prefetcher

    def infinite():
        while True:
            yield np.zeros((4, 4))

    before = threading.active_count()
    p = Prefetcher(infinite(), depth=2)
    next(p)
    thread = p._t
    del p
    gc.collect()
    thread.join(timeout=5)
    assert not thread.is_alive(), "abandoned Prefetcher thread still running"
    assert threading.active_count() <= before + 1


def test_repeating_empty_shard_raises_not_hangs(tmp_path):
    """batch_size larger than the (shard of the) dataset with
    drop_remainder used to busy-spin forever; it must raise."""
    from arsvt_tpu.data.coco import CocoDataset
    from arsvt_tpu.data.pipeline import detection_batches
    from arsvt_tpu.data.synthetic import make_synthetic_coco

    root = make_synthetic_coco(
        str(tmp_path / "coco"), splits=("train",), images_per_split=3,
        image_size=16, max_boxes=1,
    )
    ds = CocoDataset(root + "/train")
    it = detection_batches(ds, batch_size=8, canvas=16, max_objects=2,
                           repeat=True, drop_remainder=True)
    with pytest.raises(RuntimeError, match="no batch of 8"):
        next(it)


def test_native_resized_dims_match_cpp_rounding():
    """Python round() (banker's, fp64, pre-reduce) diverged from the C++
    lround-on-fp32-post-reduce by 1px on odd-width >=2x downscales: an
    11x64 image at canvas 32 box-reduces to 5x32 and resizes to 5x32, but
    round(11 * 0.5) = 6 put GT box edges 1px past the pixels."""
    from arsvt_tpu.data.native_loader import _native_resized_dims

    assert _native_resized_dims(11, 64, 32) == (5, 32)
    assert _native_resized_dims(64, 11, 32) == (32, 5)
    # no-reduce path: plain lround
    assert _native_resized_dims(48, 64, 32) == (24, 32)
    # identity
    assert _native_resized_dims(32, 32, 32) == (32, 32)
    # exact >=3x integer ratios: the reduce factor k MUST come from an
    # FP32 reciprocal like the C++ (1.0f/s0 rounds UP to the integer at
    # e.g. 1/3; fp64 stays below and truncates to k-1). Constants pinned
    # against the compiled C++ math (g++ -O3 -march=native probe):
    assert _native_resized_dims(1920, 68, 640) == (640, 22)
    assert _native_resized_dims(1536, 100, 512) == (512, 33)
    assert _native_resized_dims(672, 50, 224) == (224, 16)
    # degenerate record: graceful floor, no NaN crash
    assert _native_resized_dims(0, 0, 32) == (1, 1)


def test_color_jitter_applies_random_order():
    """torchvision/albumentations ColorJitter applies the four adjustments
    in a RANDOM order (they don't commute); pin the implementation by
    reconstructing the expected composition from the same key splits."""
    import jax

    from arsvt_tpu.data.augment import (
        adjust_brightness,
        adjust_contrast,
        adjust_hue,
        adjust_saturation,
        color_jitter,
    )

    key = jax.random.PRNGKey(11)
    image = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 3))
    out = color_jitter(key, image, p=1.0)

    _, ko, kb, kc, ks, kh = jax.random.split(key, 6)
    b = jax.random.uniform(kb, (), minval=0.8, maxval=1.2)
    c = jax.random.uniform(kc, (), minval=0.8, maxval=1.2)
    s = jax.random.uniform(ks, (), minval=0.8, maxval=1.2)
    h = jax.random.uniform(kh, (), minval=-0.2, maxval=0.2) * 2.0 * jnp.pi
    ops = [
        lambda im: adjust_brightness(im, b),
        lambda im: adjust_contrast(im, c),
        lambda im: adjust_saturation(im, s),
        lambda im: adjust_hue(im, h),
    ]
    expected = image
    for idx in np.asarray(jax.random.permutation(ko, 4)):
        expected = ops[int(idx)](expected)
    expected = jnp.clip(expected, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-6)
    # and the order genuinely varies across keys
    perms = {
        tuple(np.asarray(jax.random.permutation(
            jax.random.split(jax.random.PRNGKey(k), 6)[1], 4)))
        for k in range(20)
    }
    assert len(perms) > 1


def test_skip_batches_resume_matches_uninterrupted(tmp_path):
    """A resumed run must see exactly the batches an uninterrupted one
    would: skip_batches fast-forwards the seeded stream at the index
    level (same shuffle replay, no decode of the skipped prefix)."""
    from arsvt_tpu.data.coco import CocoDataset
    from arsvt_tpu.data.pipeline import classification_batches
    from arsvt_tpu.data.synthetic import make_synthetic_coco

    root = make_synthetic_coco(
        str(tmp_path / "coco"), splits=("train",), images_per_split=12,
        image_size=16, max_boxes=1,
    )
    ds = CocoDataset(root + "/train")
    kw = dict(batch_size=4, canvas=16, seed=7, repeat=True)

    full = classification_batches(ds, **kw)
    reference = [next(full) for _ in range(8)]
    full.close()

    resumed = classification_batches(ds, skip_batches=5, **kw)
    for i in range(5, 8):
        b = next(resumed)
        np.testing.assert_array_equal(b["label"], reference[i]["label"])
        np.testing.assert_array_equal(b["image"], reference[i]["image"])
    resumed.close()


def test_detection_batches_warns_on_truncated_gt(tmp_path):
    """GT beyond max_objects is silently unlearnable AND uncounted in
    eval — the pipeline must say so."""
    from arsvt_tpu.data.coco import CocoDataset
    from arsvt_tpu.data.pipeline import detection_batches
    from arsvt_tpu.data.synthetic import make_synthetic_coco

    root = make_synthetic_coco(
        str(tmp_path / "coco"), splits=("train",), images_per_split=6,
        image_size=32, max_boxes=3,
    )
    ds = CocoDataset(root + "/train")
    with pytest.warns(UserWarning, match="TRUNCATED"):
        it = detection_batches(ds, batch_size=2, canvas=32, max_objects=1,
                               repeat=False, shuffle=False)
    it.close()


def test_rand_augment_fused_matches_sequential_loop():
    """The num_ops=2 fused path (one warp, pointwise switches) must be
    numerically identical to the naive sequential op loop except on lanes
    where BOTH rounds draw rotate (those single-resample the composed
    rotation instead of resampling twice — p=1/49)."""
    from functools import partial
    from arsvt_tpu.data import augment as A

    def sequential(key, image, magnitude):
        ops = A._RA_OPS
        for _ in range(2):
            key, kop, kparam = jax.random.split(key, 3)
            idx = jax.random.randint(kop, (), 0, len(ops))
            branches = [
                (lambda img, op=op, kp=kparam: op(kp, img, magnitude))
                for op in ops
            ]
            image = jax.lax.switch(idx, branches, image)
        return image

    def drawn_ops(key):
        key, kop1, _ = jax.random.split(key, 3)
        key, kop2, _ = jax.random.split(key, 3)
        n = len(A._RA_OPS)
        return (int(jax.random.randint(kop1, (), 0, n)),
                int(jax.random.randint(kop2, (), 0, n)))

    rot = A._RA_OPS.index(A._ra_rotate)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((24, 24, 3), dtype=np.float32))
    seen_rotate_lane = False
    for seed in range(40):
        key = jax.random.PRNGKey(seed)
        i1, i2 = drawn_ops(key)
        if i1 == rot and i2 == rot:
            continue  # composed-rotation lane: deliberate single-resample
        seen_rotate_lane |= rot in (i1, i2)
        fused = A.rand_augment(key, img, num_ops=2, magnitude=0.9)
        ref = sequential(key, img, 0.9)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-5,
                                   err_msg=f"seed={seed} ops=({i1},{i2})")
    assert seen_rotate_lane  # the interesting case must be covered


def test_rand_augment_zero_rotation_is_identity():
    """W(0) must be an exact identity for every warp variant — the fused
    RandAugment path relies on it for the no-rotate lanes."""
    from arsvt_tpu.data import augment as A

    img = jnp.asarray(
        np.random.default_rng(1).random((32, 32, 3), dtype=np.float32))
    for variant in ("taps", "flat", "patch", "shear_matmul"):
        out = A._ra_rotate_by_deg(img, jnp.float32(0.0), variant=variant)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-6, err_msg=variant)
