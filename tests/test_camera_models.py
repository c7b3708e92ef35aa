"""Camera model tests (counterpart of reference camera_models_test.cc:16-55)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mavmap_tpu.models import camera as cam


PINHOLE_PARAMS = [651.123, 655.123, 386.123, 511.123]
OPENCV_PARAMS = [651.123, 655.123, 386.123, 511.123, -0.471, 0.223, -0.001, 0.001]
CATA_PARAMS = [651.123, 655.123, 386.123, 511.123, -0.471, 0.223, -0.001, 0.001, 0.5]


def _grid_pixels():
    u = np.linspace(0, 800, 25)
    v = np.linspace(0, 1000, 25)
    uu, vv = np.meshgrid(u, v)
    return jnp.asarray(np.stack([uu.ravel(), vv.ravel()], axis=-1), jnp.float32)


@pytest.mark.parametrize(
    "code,params",
    [
        (cam.PINHOLE, PINHOLE_PARAMS),
        (cam.OPENCV, OPENCV_PARAMS),
        (cam.CATA, CATA_PARAMS),
        (cam.CATA, CATA_PARAMS[:8] + [0.0]),
        (cam.CATA, CATA_PARAMS[:8] + [1.0]),
    ],
)
def test_image_world_roundtrip(code, params):
    # image -> world -> image (reference camera_models_test.cc pattern).
    p = cam.pad_params(params)
    uv = _grid_pixels()
    xyz = cam.image2world(uv, code, p)
    uv2 = cam.world2image(xyz, code, p)
    # 0.1 px in f32 with strong distortion at the image corners (the fixed-
    # point undistortion matches the reference's 10-iteration scheme, which
    # converges to ~1e-2 px there; f64 runs reach 1e-6).
    assert jnp.abs(uv2 - uv).max() < 0.1


@pytest.mark.parametrize(
    "code,params",
    [
        (cam.PINHOLE, PINHOLE_PARAMS),
        (cam.OPENCV, OPENCV_PARAMS),
        (cam.CATA, CATA_PARAMS),
    ],
)
def test_world_image_world_roundtrip(code, params, rng):
    p = cam.pad_params(params)
    pts = rng.normal(size=(200, 3)) * np.array([0.3, 0.3, 0.1]) + np.array([0, 0, 1.0])
    pts = jnp.asarray(pts, jnp.float32)
    uv = cam.world2image(pts, code, p)
    xyz = cam.image2world(uv, code, p)
    # Compare directions (image2world returns a ray point, not the 3D point).
    d1 = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    d2 = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    assert jnp.abs(d1 - d2).max() < 1e-3


def test_principal_point_maps_to_origin():
    for code, params in [
        (cam.PINHOLE, PINHOLE_PARAMS),
        (cam.OPENCV, OPENCV_PARAMS),
        (cam.CATA, CATA_PARAMS),
    ]:
        p = cam.pad_params(params)
        uv = jnp.asarray([[params[2], params[3]]], jnp.float32)
        xyz = cam.image2world(uv, code, p)
        assert jnp.abs(xyz[0, :2]).max() < 1e-6


def test_traced_dispatch_matches_static():
    import jax

    p = cam.pad_params(OPENCV_PARAMS)
    uv = _grid_pixels()

    @jax.jit
    def traced(code, uv):
        return cam.image2world(uv, code, p)

    a = traced(jnp.int32(cam.OPENCV), uv)
    b = cam.image2world(uv, cam.OPENCV, p)
    assert jnp.abs(a - b).max() < 1e-6


def test_normalize_threshold():
    p = cam.pad_params(PINHOLE_PARAMS)
    t = cam.normalize_threshold(4.0, p)
    expected = 4.0 / ((PINHOLE_PARAMS[0] + PINHOLE_PARAMS[1]) / 2)
    assert abs(float(t) - expected) < 1e-6


def test_model_registry():
    assert cam.camera_model_code("PINHOLE") == 1
    assert cam.camera_model_code("OPENCV") == 2
    assert cam.camera_model_code("CATA") == 3
    assert cam.camera_model_name(2) == "OPENCV"
    assert cam.CAMERA_MODEL_NUM_PARAMS[cam.CATA] == 9


def test_image2normalized_np_matches_device(rng):
    """Host numpy mirror must agree with the jax implementation for all
    camera models (it replaces the device round-trip in the mapper)."""
    import jax.numpy as jnp
    from mavmap_tpu.models.camera import (
        PINHOLE, OPENCV, CATA, pad_params, image2normalized,
        image2normalized_np,
    )

    uv = rng.uniform(100, 700, size=(50, 2)).astype(np.float32)
    params = {
        PINHOLE: [700.0, 690.0, 400.0, 300.0],
        OPENCV: [700.0, 690.0, 400.0, 300.0, 0.1, -0.05, 0.001, -0.002],
        CATA: [700.0, 690.0, 400.0, 300.0, 0.1, -0.05, 0.001, -0.002, 0.8],
    }
    for code, p in params.items():
        pp = np.asarray(pad_params(p))
        dev = np.asarray(image2normalized(jnp.asarray(uv), code, jnp.asarray(pp)))
        host = image2normalized_np(uv, code, pp)
        assert np.abs(dev - host).max() < 1e-5, code
