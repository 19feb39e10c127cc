"""The generated API reference (docs/api.md) stays in sync with the code."""
import os


def test_api_md_is_current():
    from tools.gen_api_docs import OUT, generate

    generated = generate()
    with open(OUT) as fh:
        committed = fh.read()
    assert committed == generated, (
        "docs/api.md is stale: run `python tools/gen_api_docs.py`"
    )


def test_api_md_covers_public_blocks():
    import dask_geomodeling_tpu.geometry as geometry
    import dask_geomodeling_tpu.raster as raster

    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "api.md",
        )
    ) as fh:
        text = fh.read()
    for module in (raster, geometry):
        names = getattr(module, "__all__", None) or [
            n for n in vars(module)
            if not n.startswith("_") and isinstance(getattr(module, n), type)
        ]
        for name in names:
            assert "`%s(" % name in text or "`%s`" % name in text, name
