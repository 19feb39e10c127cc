"""Generate docs/api.md: the per-block API reference from docstrings.

The reference publishes a Sphinx autodoc tree
(/root/reference/docs/blocks.rst); this is the same per-class surface as
one generated markdown file, refreshed with

    python tools/gen_api_docs.py

A test (tests/test_docs.py) regenerates and fails when the committed
file is stale, so the reference can never drift from the code.
"""
import importlib
import inspect
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "docs", "api.md")

#: (title, module, include functions) — the public surface
SECTIONS = [
    ("Core", "dask_geomodeling_tpu.core", True),
    ("Configuration", "dask_geomodeling_tpu.config", True),
    ("Raster blocks", "dask_geomodeling_tpu.raster", False),
    ("Geometry blocks", "dask_geomodeling_tpu.geometry", False),
    ("Geo foundation", "dask_geomodeling_tpu.geo", True),
    ("Runtime", "dask_geomodeling_tpu.runtime.tiles", True),
]


def _signature(obj):
    import re

    try:
        if inspect.isclass(obj):
            text = "%s%s" % (obj.__name__, inspect.signature(obj.__init__))
        else:
            text = "%s%s" % (obj.__name__, inspect.signature(obj))
    except (ValueError, TypeError):
        return obj.__name__
    # sentinel defaults repr with a memory address, and module reprs
    # with an install path: neither is deterministic across machines
    text = re.sub(r"<object object at 0x[0-9a-f]+>", "<unset>", text)
    return re.sub(r"<module '([^']+)' from '[^']*'>", r"<module '\1'>", text)


def _doc(obj):
    doc = inspect.getdoc(obj)
    return doc.strip() if doc else "(undocumented)"


def generate():
    lines = [
        "# Generated API reference",
        "",
        "Every public name with its constructor signature and docstring,",
        "generated from the code by `python tools/gen_api_docs.py`",
        "(tests/test_docs.py keeps it in sync).  The hand-written overview",
        "lives in [reference.md](reference.md).",
        "",
    ]
    for title, module_name, include_functions in SECTIONS:
        module = importlib.import_module(module_name)
        names = getattr(module, "__all__", None) or sorted(
            n for n in vars(module) if not n.startswith("_")
        )
        lines += ["## %s (`%s`)" % (title, module_name), ""]
        for name in names:
            obj = getattr(module, name, None)
            if obj is None:
                continue
            if inspect.ismodule(obj):
                continue
            if not (inspect.isclass(obj) or callable(obj)):
                lines += ["### `%s`" % name, "", _doc(obj), ""]
                continue
            if not include_functions and not inspect.isclass(obj):
                continue
            sig = _signature(obj).replace("(self, ", "(").replace(
                "(self)", "()"
            )
            lines += ["### `%s`" % sig, "", _doc(obj), ""]
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    text = generate()
    with open(OUT, "w") as fh:
        fh.write(text)
    print("wrote %s (%d lines)" % (OUT, text.count("\n")))
