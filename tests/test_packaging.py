"""Packaging metadata stays consistent with the code.

The reference has zero packaging (SURVEY.md: "zero build/packaging files");
shipping a pip-installable distribution with console entry points is part of
making this a framework rather than a script pile.
"""

import importlib
import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_pyproject():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    t = _load_pyproject()
    scripts = t["project"]["scripts"]
    # one console command per CLI script in the package
    assert len(scripts) == 8
    for ep in scripts.values():
        mod, fn = ep.split(":")
        m = importlib.import_module(mod)
        assert callable(getattr(m, fn)), ep


def test_version_matches_package():
    import ct_clip_ut_tpu

    t = _load_pyproject()
    assert t["project"]["version"] == ct_clip_ut_tpu.__version__


def test_native_sources_listed_as_package_data():
    t = _load_pyproject()
    data = t["tool"]["setuptools"]["package-data"]["ct_clip_ut_tpu.native"]
    assert "*.cpp" in data and "Makefile" in data
