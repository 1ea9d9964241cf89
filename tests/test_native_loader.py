"""Native C++ loader vs PIL-path parity (skips if toolchain missing)."""

import numpy as np
import pytest

from arsvt_tpu.data import native_loader
from arsvt_tpu.data.coco import CocoDataset
from arsvt_tpu.data.pipeline import letterbox, load_image
from arsvt_tpu.data.synthetic import make_synthetic_coco


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def coco(tmp_path_factory):
    root = make_synthetic_coco(
        str(tmp_path_factory.mktemp("nl")), images_per_split=4, image_size=40
    )
    return CocoDataset(root + "/train")


def test_native_matches_pil(coco):
    paths = [r.path for r in coco.records]
    images, meta = native_loader.load_letterboxed_batch(paths, 64)
    assert images.shape == (len(paths), 64, 64, 3)
    assert (meta[:, 3] == 1.0).all()
    ref = np.stack([letterbox(load_image(p), 64)[0] for p in paths])
    assert np.abs(images - ref).max() <= 2.5 / 255  # decoder rounding


def test_native_box_transform_matches_pil(coco):
    rec = coco.records[0]
    images, meta = native_loader.load_letterboxed_batch([rec.path], 64)
    tf_native = native_loader.box_transform_from_meta(meta[0], 64)
    _, tf_pil = letterbox(load_image(rec.path), 64)
    boxes = np.array([[0.1, 0.2, 0.8, 0.9]], np.float32)
    np.testing.assert_allclose(
        tf_native(boxes, rec.width, rec.height), tf_pil(boxes), atol=1e-5
    )


def test_native_corrupt_file(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_text("not an image")
    images, meta = native_loader.load_letterboxed_batch([str(bad)], 32)
    assert meta[0, 3] == 0.0
    assert float(np.abs(images).max()) == 0.0
