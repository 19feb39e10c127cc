"""Device-mesh tests on the virtual 8-device CPU mesh: sharded pipelines
reproduce single-device results, halos exchange correctly over sp."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    return jax.devices()


def test_make_mesh_shapes(devices):
    from dask_geomodeling_tpu.parallel import make_mesh

    mesh = make_mesh((4, 2))
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.devices.shape == (4, 2)
    # a smaller mesh runs on a subset of the available devices (the driver
    # may dry-run n < visible devices in one process)
    assert make_mesh((3, 2)).devices.shape == (3, 2)
    with pytest.raises(ValueError):
        make_mesh((16, 1))


def test_sharded_elementwise_matches(devices):
    from dask_geomodeling_tpu.parallel import (
        make_mesh,
        shard_tile_batch,
        sharded_pipeline,
    )

    mesh = make_mesh((4, 2))
    rng = np.random.RandomState(0)
    batch = rng.rand(8, 2, 64, 32).astype(np.float32)

    program = sharded_pipeline(lambda v: v * 2 + 1, mesh)
    out = np.asarray(program(shard_tile_batch(batch, mesh)))
    np.testing.assert_allclose(out, batch * 2 + 1, rtol=1e-6)


def test_sharded_halo_exchange_matches_global(devices):
    """A y-stencil under shard_map + ppermute halos must equal the same
    stencil applied to the unsharded array."""
    from dask_geomodeling_tpu.parallel import (
        make_mesh,
        shard_tile_batch,
        sharded_pipeline,
    )

    mesh = make_mesh((4, 2))
    rng = np.random.RandomState(1)
    batch = rng.rand(4, 1, 64, 32).astype(np.float32)
    radius = 2

    def stencil(values):
        # mean over a (2*radius+1) window in y; 'values' arrives halo-padded
        acc = sum(
            values[:, i : i + values.shape[1] - 2 * radius, :]
            for i in range(2 * radius + 1)
        )
        out = acc / (2 * radius + 1)
        # return at the padded height: the wrapper crops the halo
        pad = np.zeros((values.shape[0], radius, values.shape[2]), np.float32)
        import jax.numpy as jnp

        return jnp.concatenate([pad, out, pad], axis=1)

    program = sharded_pipeline(stencil, mesh, halo_radius=radius)
    out = np.asarray(program(shard_tile_batch(batch, mesh)))

    # global ground truth: same stencil on the full (zero-padded) array
    merged = batch.reshape(4, 64, 32)
    padded = np.pad(merged, ((0, 0), (radius, radius), (0, 0)))
    expected = sum(
        padded[:, i : i + 64, :] for i in range(2 * radius + 1)
    ) / (2 * radius + 1)
    np.testing.assert_allclose(
        out.reshape(4, 64, 32), expected, rtol=1e-6, atol=1e-7
    )


def test_dryrun_multichip_entry(devices):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    module.dryrun_multichip(8)  # must not raise


def test_sharded_gaussian_smooth_matches_scipy(devices):
    """The real Smooth kernel (gaussian_blur_jax) under the sharded
    pipeline with halo exchange must match scipy on the unsharded array."""
    from scipy import ndimage

    from dask_geomodeling_tpu.ops.stencils import (
        gaussian_blur_jax,
        gaussian_kernel_1d,
    )
    from dask_geomodeling_tpu.parallel import (
        make_mesh,
        shard_tile_batch,
        sharded_pipeline,
    )

    sigma = 1.0
    _, radius = gaussian_kernel_1d(sigma)
    mesh = make_mesh((4, 2))
    rng = np.random.RandomState(2)
    batch = rng.rand(4, 1, 64, 32).astype(np.float32)

    def smooth(values):
        import jax.numpy as jnp

        out = gaussian_blur_jax(values, sigma, sigma, 0.0)
        return jnp.asarray(out)

    program = sharded_pipeline(smooth, mesh, halo_radius=radius)
    out = np.asarray(program(shard_tile_batch(batch, mesh)))

    merged = batch.reshape(4, 64, 32)
    expected = np.stack(
        [
            ndimage.gaussian_filter(m, sigma, mode="constant", cval=0.0)
            for m in merged
        ]
    )
    np.testing.assert_allclose(out.reshape(4, 64, 32), expected, atol=1e-5)


def test_sharded_smooth_real_boundary_pads(devices):
    """Halo parity at the GLOBAL boundary: with real out-of-request source
    rows supplied as boundary pads, the sp-sharded Gaussian equals scipy
    over the full (larger) source — not the zero-filled approximation."""
    from scipy import ndimage

    from dask_geomodeling_tpu.ops.stencils import (
        gaussian_blur_jax,
        gaussian_kernel_1d,
    )
    from dask_geomodeling_tpu.parallel import (
        make_mesh,
        shard_tile_batch,
        sharded_pipeline,
    )

    sigma = 1.0
    _, radius = gaussian_kernel_1d(sigma)
    mesh = make_mesh((4, 2))
    rng = np.random.RandomState(3)
    # a source taller than the request window: rows [radius, radius+64)
    source = rng.rand(4, 1, 64 + 2 * radius, 32).astype(np.float32)
    batch = source[:, :, radius:-radius, :]
    top_pad = source[:, :, :radius, :]
    bottom_pad = source[:, :, -radius:, :]

    def smooth(values):
        import jax.numpy as jnp

        return jnp.asarray(gaussian_blur_jax(values, sigma, sigma, 0.0))

    program = sharded_pipeline(smooth, mesh, halo_radius=radius, boundary="pads")
    out = np.asarray(
        program(
            shard_tile_batch(batch, mesh),
            jax.device_put(top_pad),
            jax.device_put(bottom_pad),
        )
    )

    # ground truth: smooth the full source, crop to the request window
    merged = source.reshape(4, 64 + 2 * radius, 32)
    expected = np.stack(
        [
            ndimage.gaussian_filter(m, sigma, mode="constant", cval=0.0)
            for m in merged
        ]
    )[:, radius:-radius, :]
    np.testing.assert_allclose(out.reshape(4, 64, 32), expected, atol=1e-5)
    # and the zero-filled variant must NOT match at the global edges
    zero_program = sharded_pipeline(smooth, mesh, halo_radius=radius)
    zero_out = np.asarray(zero_program(shard_tile_batch(batch, mesh)))
    assert not np.allclose(zero_out.reshape(4, 64, 32), expected, atol=1e-5)


def test_evaluate_tiled_dp_sp_mesh_stencil(devices):
    """evaluate_tiled with a (dp, sp) mesh on a stencil view: the tile
    rows shard over sp (XLA inserts the halo collectives) and the result
    stays bitwise identical to the host path."""
    from datetime import datetime, timedelta

    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import Add, Classify, MemorySource, Smooth
    from dask_geomodeling_tpu.runtime.tiles import evaluate_tiled

    rng = np.random.RandomState(4)
    source = MemorySource(
        data=(rng.rand(1, 64, 64) * 250).astype(np.float32),
        no_data_value=float(np.finfo(np.float32).max),
        projection="EPSG:28992",
        pixel_size=1.0,
        pixel_origin=(135000, 456000),
        time_first=datetime(2000, 1, 1),
        time_delta=timedelta(hours=1),
    )
    from dask_geomodeling_tpu.raster import MovingMax

    request = dict(
        mode="vals",
        bbox=(135000, 455936, 135064, 456000),
        projection="EPSG:28992",
        width=64,
        height=64,
        start=datetime(2000, 1, 1),
    )
    # max-based stencil: order-independent, so sp partitioning is bitwise
    view = Classify(MovingMax(Add(source, 1), size=5), bins=[50.0, 150.0])
    expected = view.get_data(**request)
    with config.set({"geomodeling.mesh-shape": (4, 2)}):
        actual = evaluate_tiled(view, request, tile_size=32, batch=4)
    np.testing.assert_array_equal(actual["values"], expected["values"])

    # sum-based stencil: partitioning may reorder float adds; the smoothed
    # field must agree to float tolerance
    smooth_view = Smooth(Add(source, 1), size=2)
    expected_smooth = smooth_view.get_data(**request)
    with config.set({"geomodeling.mesh-shape": (4, 2)}):
        actual_smooth = evaluate_tiled(smooth_view, request, tile_size=32, batch=4)
    np.testing.assert_allclose(
        actual_smooth["values"], expected_smooth["values"], rtol=2e-4
    )


def test_evaluate_tiled_sp_real_boundary_pads(devices):
    """VERDICT r2 task 6: an sp-sharded Smooth over a source LARGER than
    the request must equal the single-device result bit-for-bit via
    evaluate_tiled — and both must use the real out-of-request source
    rows (per-tile over-fetch), not a zero/fill edge."""
    from datetime import datetime, timedelta

    from dask_geomodeling_tpu import config
    from dask_geomodeling_tpu.raster import Add, MemorySource, MovingMax, Smooth
    from dask_geomodeling_tpu.runtime.tiles import evaluate_tiled

    rng = np.random.RandomState(9)
    data = (rng.rand(1, 96, 96) * 250).astype(np.float32)

    def make(source_data, origin=(135000, 456000)):
        return MemorySource(
            data=source_data,
            no_data_value=float(np.finfo(np.float32).max),
            projection="EPSG:28992",
            pixel_size=1.0,
            pixel_origin=origin,
            time_first=datetime(2000, 1, 1),
            time_delta=timedelta(hours=1),
        )

    source = make(data)
    # the request window sits strictly INSIDE the source: 16 real rows /
    # cols exist on every side beyond the requested bbox
    request = dict(
        mode="vals",
        bbox=(135016, 455920, 135080, 455984),
        projection="EPSG:28992",
        width=64,
        height=64,
        start=datetime(2000, 1, 1),
    )

    for view_cls, kwargs, exact in (
        (MovingMax, {"size": 5}, True),
        (Smooth, {"size": 2}, False),
    ):
        view = view_cls(Add(source, 1), **kwargs)
        single = evaluate_tiled(view, request, tile_size=32, batch=4)
        with config.set({"geomodeling.mesh-shape": (4, 2)}):
            sharded = evaluate_tiled(view, request, tile_size=32, batch=4)
        if exact:
            # order-independent stencil: sp partitioning is bit-for-bit
            np.testing.assert_array_equal(
                sharded["values"], single["values"], err_msg=str(view_cls)
            )
        else:
            # sum-based stencil: XLA's partitioned convolution may
            # reassociate the kernel sum; agreement is a few ulps
            np.testing.assert_allclose(
                sharded["values"], single["values"], rtol=1e-6,
                err_msg=str(view_cls),
            )
        # the host path over the same big source agrees (tolerance for
        # the scipy-vs-XLA float gaussian)
        host = view.get_data(**request)
        np.testing.assert_allclose(
            np.asarray(single["values"], dtype=np.float64),
            np.asarray(host["values"], dtype=np.float64),
            rtol=2e-4,
        )
        # negative check: a source CROPPED to the request window (no real
        # out-of-request rows) gives different edge pixels — proof the
        # pipeline fed real boundary data, not a fill edge
        cropped_view = view_cls(
            Add(make(data[:, 16:80, 16:80], origin=(135016, 455984)), 1),
            **kwargs,
        )
        with config.set({"geomodeling.mesh-shape": (4, 2)}):
            cropped = evaluate_tiled(
                cropped_view, request, tile_size=32, batch=4
            )
        assert not np.array_equal(cropped["values"], sharded["values"])


def test_mesh_2x4_variant(devices):
    from dask_geomodeling_tpu.parallel import (
        make_mesh,
        shard_tile_batch,
        sharded_pipeline,
    )

    mesh = make_mesh((2, 4))
    batch = np.arange(8 * 1 * 16 * 8, dtype=np.float32).reshape(8, 1, 16, 8)
    program = sharded_pipeline(lambda v: v + 1, mesh)
    out = np.asarray(program(shard_tile_batch(batch, mesh)))
    np.testing.assert_allclose(out, batch + 1)
