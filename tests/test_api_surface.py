"""docs/API.md contract: the documented public surface and the actual
one must not drift.

Two nets on top of test_migration_surface.py's MIGRATION.md checks:

1. every module's ``__all__`` names resolve (no stale exports);
2. every ``__all__`` name of every package module appears in
   docs/API.md (the API reference stays complete as the surface grows).
"""

import importlib
import pathlib
import pkgutil

import arrowspace_tpu

REPO = pathlib.Path(__file__).resolve().parents[1]

# native/ is C++; __main__ executes the CLI banner (device touch) on
# import, so it must never be imported by the walk.
_SKIP_PREFIXES = ("arrowspace_tpu.native",)
_SKIP_SUFFIXES = (".__main__",)


def _package_modules():
    pkg = arrowspace_tpu
    yield pkg
    for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        if info.name.startswith(_SKIP_PREFIXES) \
                or info.name.endswith(_SKIP_SUFFIXES):
            continue
        yield importlib.import_module(info.name)


def test_all_exports_resolve():
    missing = []
    for mod in _package_modules():
        for name in getattr(mod, "__all__", ()):
            if not hasattr(mod, name):
                missing.append(f"{mod.__name__}.{name}")
    assert not missing, f"stale __all__ entries: {missing}"


def test_api_doc_covers_every_export():
    text = (REPO / "docs" / "API.md").read_text()
    undocumented = []
    for mod in _package_modules():
        if mod.__name__ == "arrowspace_tpu":
            continue  # the root __init__ re-exports, documented per module
        for name in getattr(mod, "__all__", ()):
            if name not in text:
                undocumented.append(f"{mod.__name__}.{name}")
    assert not undocumented, (
        "public symbols missing from docs/API.md: "
        f"{undocumented} — document them (or remove from __all__)")
