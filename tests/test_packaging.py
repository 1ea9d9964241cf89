"""Packaging sanity: the project builds into a wheel offline, the wheel
carries both import packages + the license, and every console-script
entry point resolves to an importable callable.

The reference ships no packaging at all (SURVEY.md §0: two flat scripts);
this guards the rebuild's `pip install arsvt-tpu` surface.
"""

import configparser
import importlib
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

try:
    import tomllib
except ImportError:  # pragma: no cover - py<3.11
    tomllib = None


def _pyproject():
    if tomllib is None:
        pytest.skip("tomllib unavailable")
    return tomllib.loads((REPO / "pyproject.toml").read_text())


def test_license_file_matches_pyproject():
    text = (REPO / "LICENSE").read_text()
    assert "Apache License" in text and "Version 2.0" in text
    proj = _pyproject()["project"]
    assert proj["license"]["text"] == "Apache-2.0"


def test_console_scripts_resolve():
    proj = _pyproject()["project"]
    scripts = proj["scripts"]
    # the three reference entry surfaces: train, eval, serve
    assert set(scripts) == {"arsvt-train", "arsvt-eval", "arsvt-serve"}
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))


@pytest.mark.slow
def test_wheel_builds_offline_and_contains_packages(tmp_path):
    # --no-build-isolation + --no-index: must succeed with zero network
    proc = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "--no-index", "-w", str(tmp_path),
         str(REPO)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    wheels = list(tmp_path.glob("arsvt_tpu-*.whl"))
    assert len(wheels) == 1, list(tmp_path.iterdir())
    with zipfile.ZipFile(wheels[0]) as zf:
        names = zf.namelist()
        assert "arsvt_tpu/__init__.py" in names
        # the full-project-name alias package must install too
        assert (
            "automated_recycling_sorter_with_vision_transformers_tpu/"
            "__init__.py" in names
        )
        # license text rides in the dist-info
        lic = [n for n in names
               if n.endswith("LICENSE") and ".dist-info" in n]
        assert lic, names[-10:]
        # entry points recorded in wheel metadata
        ep = [n for n in names if n.endswith("entry_points.txt")]
        assert ep
        cp = configparser.ConfigParser()
        cp.read_string(zf.read(ep[0]).decode())
        assert set(cp["console_scripts"]) == {
            "arsvt-train", "arsvt-eval", "arsvt-serve"}
