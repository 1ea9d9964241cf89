"""Pretrained conversion parity: torch HF ViTModel forward == ours."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from arsvt_tpu.models.convert import from_pretrained_state  # noqa: E402
from arsvt_tpu.models.vit import BackboneConfig, apply_backbone  # noqa: E402


def test_hf_vit_forward_parity():
    from transformers import ViTConfig, ViTModel

    hf_cfg = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = ViTModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = BackboneConfig(
        image_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        mlp_dim=64, ln_eps=hf_cfg.layer_norm_eps,  # HF's 1e-12, not 1e-5
    )
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = from_pretrained_state(state, cfg)

    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        # torch expects NCHW
        t_out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    ours = np.asarray(
        apply_backbone(params, jnp.asarray(images), cfg,
                       force_reference=True)
    )
    # HF uses exact-erf GELU; ours uses the tanh approximation -> small
    # systematic differences, bounded well under fine-tune noise.
    assert np.abs(ours - t_out).max() < 5e-3


def test_timm_style_dict_converts():
    cfg = BackboneConfig(image_size=32, patch_size=8, embed_dim=32,
                         depth=1, num_heads=2, mlp_dim=64)
    rng = np.random.default_rng(1)

    def w(*shape):
        return rng.normal(0, 0.02, shape).astype(np.float32)

    state = {
        "patch_embed.proj.weight": w(32, 3, 8, 8),
        "patch_embed.proj.bias": w(32),
        "cls_token": w(1, 1, 32),
        "pos_embed": w(1, 17, 32),
        "norm.weight": w(32), "norm.bias": w(32),
        "blocks.0.norm1.weight": w(32), "blocks.0.norm1.bias": w(32),
        "blocks.0.attn.qkv.weight": w(96, 32),
        "blocks.0.attn.qkv.bias": w(96),
        "blocks.0.attn.proj.weight": w(32, 32),
        "blocks.0.attn.proj.bias": w(32),
        "blocks.0.norm2.weight": w(32), "blocks.0.norm2.bias": w(32),
        "blocks.0.mlp.fc1.weight": w(64, 32), "blocks.0.mlp.fc1.bias": w(64),
        "blocks.0.mlp.fc2.weight": w(32, 64), "blocks.0.mlp.fc2.bias": w(32),
    }
    params = from_pretrained_state(state, cfg)
    out = apply_backbone(
        params, jnp.zeros((1, 32, 32, 3)), cfg, force_reference=True
    )
    assert out.shape == (1, 17, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_config_mismatch_raises():
    cfg = BackboneConfig(image_size=32, patch_size=8, embed_dim=64,
                         depth=1, num_heads=2, mlp_dim=64)
    state = {
        "patch_embed.proj.weight": np.zeros((32, 3, 8, 8), np.float32),
        "patch_embed.proj.bias": np.zeros(32, np.float32),
        "cls_token": np.zeros((1, 1, 32), np.float32),
        "pos_embed": np.zeros((1, 17, 32), np.float32),
        "norm.weight": np.zeros(32, np.float32),
        "norm.bias": np.zeros(32, np.float32),
        "blocks.0.norm1.weight": np.zeros(32, np.float32),
        "blocks.0.norm1.bias": np.zeros(32, np.float32),
        "blocks.0.attn.qkv.weight": np.zeros((96, 32), np.float32),
        "blocks.0.attn.qkv.bias": np.zeros(96, np.float32),
        "blocks.0.attn.proj.weight": np.zeros((32, 32), np.float32),
        "blocks.0.attn.proj.bias": np.zeros(32, np.float32),
        "blocks.0.norm2.weight": np.zeros(32, np.float32),
        "blocks.0.norm2.bias": np.zeros(32, np.float32),
        "blocks.0.mlp.fc1.weight": np.zeros((64, 32), np.float32),
        "blocks.0.mlp.fc1.bias": np.zeros(64, np.float32),
        "blocks.0.mlp.fc2.weight": np.zeros((32, 64), np.float32),
        "blocks.0.mlp.fc2.bias": np.zeros(32, np.float32),
    }
    with pytest.raises(ValueError, match="does not match config"):
        from_pretrained_state(state, cfg)


def _reference_detector_state(det):
    """Synthetic state dict with the reference's exact key names/shapes
    (DeiTObjectDetector, train.py:798-850), wrapped in the reference's
    checkpoint envelope."""
    bb = det.backbone
    d, depth, mlp = bb.embed_dim, bb.depth, bb.mlp_dim
    q, hdepth, ffn, c = (det.head.num_queries, det.head.depth,
                         det.head.ffn_dim, det.head.num_classes)
    rng = np.random.default_rng(0)

    def w(*shape):
        return rng.normal(0, 0.02, shape).astype(np.float32)

    state = {
        "backbone.patch_embedding.projection.weight": w(d, 3, bb.patch_size,
                                                        bb.patch_size),
        "backbone.patch_embedding.projection.bias": w(d),
        "backbone.cls_token": w(1, 1, d),
        "backbone.dist_token": w(1, 1, d),
        "backbone.position_embedding": w(1, bb.seq_len, d),
        "backbone.layer_norm.weight": w(d),
        "backbone.layer_norm.bias": w(d),
        "triplet_projection.weight": w(det.triplet_dim, d),
        "triplet_projection.bias": w(det.triplet_dim),
        "detection_head.object_queries": w(q, d),
        "detection_head.class_head.weight": w(c + 1, d),
        "detection_head.class_head.bias": w(c + 1),
        "detection_head.bbox_head.weight": w(4, d),
        "detection_head.bbox_head.bias": w(4),
    }
    for i in range(depth):
        p = f"backbone.transformer_blocks.{i}."
        state.update({
            p + "attention.qkv.weight": w(3 * d, d),
            p + "attention.qkv.bias": w(3 * d),
            p + "attention.projection.weight": w(d, d),
            p + "attention.projection.bias": w(d),
            p + "mlp.linear1.weight": w(mlp, d),
            p + "mlp.linear1.bias": w(mlp),
            p + "mlp.linear2.weight": w(d, mlp),
            p + "mlp.linear2.bias": w(d),
            p + "layer_norm1.weight": w(d), p + "layer_norm1.bias": w(d),
            p + "layer_norm2.weight": w(d), p + "layer_norm2.bias": w(d),
        })
    for i in range(hdepth):
        p = f"detection_head.decoder.layers.{i}."
        state.update({
            p + "self_attn.in_proj_weight": w(3 * d, d),
            p + "self_attn.in_proj_bias": w(3 * d),
            p + "self_attn.out_proj.weight": w(d, d),
            p + "self_attn.out_proj.bias": w(d),
            p + "multihead_attn.in_proj_weight": w(3 * d, d),
            p + "multihead_attn.in_proj_bias": w(3 * d),
            p + "multihead_attn.out_proj.weight": w(d, d),
            p + "multihead_attn.out_proj.bias": w(d),
            p + "linear1.weight": w(ffn, d), p + "linear1.bias": w(ffn),
            p + "linear2.weight": w(d, ffn), p + "linear2.bias": w(d),
            p + "norm1.weight": w(d), p + "norm1.bias": w(d),
            p + "norm2.weight": w(d), p + "norm2.bias": w(d),
            p + "norm3.weight": w(d), p + "norm3.bias": w(d),
        })

    # the reference saves this envelope (train.py:1647-1654); conversion
    # must unwrap it and skip the non-tensor metadata
    return {
        "model_state_dict": state,
        "epoch": 3,
        "val_loss": 0.5,
        "config": {"EMBED_DIM": 400},
    }


def test_reference_detector_checkpoint_converts():
    from arsvt_tpu.models.convert import from_reference_detector_state
    from arsvt_tpu.models.detector import apply_detector
    from arsvt_tpu.models.registry import DETECTOR_PRESETS

    det = DETECTOR_PRESETS["detector_test"]  # 32d/2L deit + 2L decoder
    bb = det.backbone
    q, c = det.head.num_queries, det.head.num_classes
    state = _reference_detector_state(det)
    params = from_reference_detector_state(state, det)
    assert "dist_token" in params["backbone"]
    out, feats = apply_detector(
        params, jnp.zeros((2, bb.image_size, bb.image_size, 3)), det,
        return_features=True,
    )
    assert out["class_logits"].shape == (2, q, c + 1)
    assert out["boxes_cxcywh"].shape == (2, q, 4)
    assert feats.shape == (2, det.triplet_dim)
    assert np.isfinite(np.asarray(out["class_logits"])).all()


def test_load_torch_state_unwraps_reference_envelope(tmp_path):
    """torch.save'd best_vit_detector.pth-style file (model_state_dict +
    int epoch + float val_loss) loads without AttributeError (round-1
    ADVICE item)."""
    from arsvt_tpu.models.convert import load_torch_state

    path = str(tmp_path / "best_vit_detector.pth")
    torch.save(
        {
            "model_state_dict": {"w": torch.ones(2, 3)},
            "epoch": 7,
            "val_loss": 0.25,
        },
        path,
    )
    state = load_torch_state(path)
    assert set(state) == {"w"}
    assert state["w"].shape == (2, 3)


def test_import_torch_checkpoint_hf_to_orbax(tmp_path):
    """The migration CLI path: HF ViT weights file → orbax checkpoint that
    the serving loader consumes, with the imported backbone actually in
    the restored params (head fresh for fine-tune)."""
    from transformers import ViTConfig, ViTModel

    from arsvt_tpu.models.convert import (
        from_pretrained_state,
        import_torch_checkpoint,
    )
    from arsvt_tpu.models.registry import get_preset
    from arsvt_tpu.serving.loading import load_inference_bundle

    hf_cfg = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
    )
    torch.manual_seed(1)
    model = ViTModel(hf_cfg, add_pooling_layer=False)
    weights = str(tmp_path / "pytorch_model.bin")
    torch.save(model.state_dict(), weights)

    ckpt_dir = str(tmp_path / "ckpt")
    manifest = import_torch_checkpoint(
        weights, ckpt_dir, train_preset="smoke"
    )
    assert manifest["imported"] == ["backbone"]
    assert manifest["task"] == "classify"

    params, cfg = load_inference_bundle(ckpt_dir)
    expect = from_pretrained_state(
        {k: v.detach().numpy() for k, v in model.state_dict().items()},
        get_preset("vit_test_8_32"),
    )
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["pos_embed"]),
        np.asarray(expect["pos_embed"]), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(expect["blocks"]["attn"]["qkv"]["kernel"]), atol=1e-6,
    )
    assert "classifier" in params  # fresh head present
    # the import auto-pins the SOURCE's LayerNorm eps into the stored
    # config (HF ViT: 1e-12) so eval/serving run the weights the way the
    # source model did, not with torch's 1e-5
    assert cfg.ln_eps == 1e-12
    from arsvt_tpu.train.config import resolve_backbone
    assert resolve_backbone(cfg).ln_eps == 1e-12


def test_import_torch_checkpoint_reference_detector(tmp_path):
    """Reference .pth detector → detect-task orbax checkpoint via the
    forced source="reference" path."""
    from arsvt_tpu.models.convert import import_torch_checkpoint
    from arsvt_tpu.models.registry import DETECTOR_PRESETS
    from arsvt_tpu.serving.loading import load_inference_bundle

    det = DETECTOR_PRESETS["detector_test"]
    path = str(tmp_path / "best_vit_detector.pth")
    torch.save(
        {k: torch.from_numpy(v) for k, v in
         _reference_detector_state(det)["model_state_dict"].items()}
        | {"epoch": 3},
        path,
    )
    ckpt_dir = str(tmp_path / "ckpt")
    manifest = import_torch_checkpoint(
        path, ckpt_dir, train_preset="deit_detector_ref",
        source="reference",
        overrides={"preset": "detector_test", "batch_size": 2},
    )
    assert manifest["task"] == "detect"
    assert "backbone" in manifest["imported"]
    assert "detr" in manifest["imported"]

    params, cfg = load_inference_bundle(ckpt_dir)
    assert cfg.preset == "detector_test"
    assert params["detr"]["queries"].shape == (det.head.num_queries,
                                               det.backbone.embed_dim)

    # classify preset on a detector file must fail loudly, not mis-import
    with pytest.raises(ValueError, match="detect train preset"):
        import_torch_checkpoint(
            path, str(tmp_path / "ckpt2"), train_preset="smoke"
        )


def test_import_torch_checkpoint_source_mismatch_raises(tmp_path):
    """--source hf/timm on a reference detector file fails loudly with a
    pointer to --source reference (review finding)."""
    from arsvt_tpu.models.convert import import_torch_checkpoint
    from arsvt_tpu.models.registry import DETECTOR_PRESETS

    det = DETECTOR_PRESETS["detector_test"]
    path = str(tmp_path / "ref.pth")
    torch.save(
        {k: torch.from_numpy(v) for k, v in
         _reference_detector_state(det)["model_state_dict"].items()},
        path,
    )
    with pytest.raises(ValueError, match="--source reference"):
        import_torch_checkpoint(
            path, str(tmp_path / "out"), train_preset="smoke", source="hf"
        )


def test_import_torch_checkpoint_shape_mismatch_raises(tmp_path):
    """A source checkpoint whose leaves disagree with the target preset's
    shapes (e.g. a different num_queries) must fail the import loudly —
    not write a corrupt step-0 checkpoint that only breaks at restore."""
    from arsvt_tpu.models.convert import import_torch_checkpoint
    from arsvt_tpu.models.registry import DETECTOR_PRESETS

    det = DETECTOR_PRESETS["detector_test"]
    path = str(tmp_path / "ref.pth")
    torch.save(
        {k: torch.from_numpy(v) for k, v in
         _reference_detector_state(det)["model_state_dict"].items()},
        path,
    )
    with pytest.raises(ValueError, match="shape"):
        import_torch_checkpoint(
            path, str(tmp_path / "out"), train_preset="deit_detector_ref",
            source="reference",
            # detector_test_wide? use a preset whose query count differs
            overrides={"preset": "detector_test", "batch_size": 2,
                       "num_classes": 3},  # head shape disagrees
        )
