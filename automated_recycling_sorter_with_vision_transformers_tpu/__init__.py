"""Alias package: the full project name re-exporting `arsvt_tpu`.

`import automated_recycling_sorter_with_vision_transformers_tpu as arsvt`
is identical to `import arsvt_tpu` — every subpackage (models, ops,
parallel, utils, data, objectives, train, evaluation, core) resolves to
the same modules.
"""

import importlib
import sys

import arsvt_tpu as _pkg

sys.modules[__name__] = _pkg

for _sub in (
    "core", "parallel", "ops", "models", "objectives", "data", "train",
    "evaluation", "utils",
):
    sys.modules[f"{__name__}.{_sub}"] = importlib.import_module(
        f"arsvt_tpu.{_sub}"
    )
