"""Packaging metadata stays consistent with the code it points at.

Guards pyproject.toml: every console script resolves to an importable,
callable `module:func`, and the declared runtime dependencies stay the
minimal jax+numpy+optax set (torch/cv2/pytest must remain behind extras —
the wheel is pure-Python and oracle-free by design).
"""

import os
from importlib import import_module

import pytest

# stdlib only since 3.11; pyproject declares requires-python >=3.10, so a
# 3.10 run must SKIP these metadata checks, not error at collection
tomllib = pytest.importorskip("tomllib")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _load()["project"]["scripts"]
    assert set(scripts) == {"zsvc-train", "zsvc-infer", "zsvc-serve"}
    for name, target in scripts.items():
        mod, func = target.split(":")
        fn = getattr(import_module(mod), func)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_runtime_deps_are_minimal():
    proj = _load()["project"]
    deps = {d.split(">")[0].split("=")[0].strip() for d in proj["dependencies"]}
    assert deps == {"jax", "numpy", "optax"}
    # oracle/fallback packages must stay optional
    extras = proj["optional-dependencies"]
    flat = {d for lst in extras.values() for d in lst}
    assert "torch" in flat and not any("torch" in d for d in proj["dependencies"])


def test_version_matches_package():
    import zeroshotvideoclassification_tpu as pkg

    assert _load()["project"]["version"] == pkg.__version__
