"""Import hygiene: every module imports cleanly with no side effects.

Guards against the reference's quirk #8 (auxiliary_word2vec.py:11 loaded a
CUDA CLIP model at import time): nothing in this package may touch devices,
download assets, or require optional deps at import.
"""

import importlib
import pkgutil

import zeroshotvideoclassification_tpu as pkg


def _all_modules():
    return sorted(
        m.name for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."))


def test_every_module_imports():
    mods = _all_modules()
    assert len(mods) > 20
    for name in mods:
        importlib.import_module(name)


def test_tools_are_main_guarded():
    # offline tools must not run their pipelines at import time
    for name in _all_modules():
        if ".tools." in name:
            importlib.import_module(name)
