from arsvt_tpu.ops.dispatch import use_pallas
from arsvt_tpu.ops.attention import multi_head_attention, sdpa_reference
from arsvt_tpu.ops.layernorm import layer_norm
from arsvt_tpu.ops.mlp import gelu_mlp
from arsvt_tpu.ops.patch_embed import patch_embed, extract_patches
