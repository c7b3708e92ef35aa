"""IO parser tests (counterpart of reference util/io.cc behavior)."""

import numpy as np
import pytest

from mavmap_tpu.utils.io import (
    cameras_from_records,
    read_control_point_data,
    read_image_data,
    write_control_point_data,
)
from mavmap_tpu.utils.mathx import median, rel2abs_threshold


IMAGEDATA = """# COMMENT
# BASENAME, ROLL, PITCH, YAW, LAT, LON, ALT, LOCAL_HEIGHT, TX, TY, TZ, ...
image1, 1.1, -0.3, -1.0, 47.4, 9.2, 485.4, 2.8, 20.3, -0.4, -4.5, 1, PINHOLE, 100.0, 100.0, 368.0, 256.0
image2, 1.1, -0.3, -1.0, 47.4, 9.2, 485.4, 2.8, 20.3, -0.4, -4.5
image3, 1.2, -0.3, -1.0, 47.4, 9.2, 485.4, 2.8, 20.3, -0.4, -4.5
image4, 1.1, -0.3, -1.0, 47.4, 9.2, 485.4, 2.8, 20.3, -0.4, -4.5, 2, OPENCV, 100.0, 100.0, 368.0, 256.0, 0.1, 0.2, 0.01, 0.02
image5, 1.1, -0.3, -1.0, 47.4, 9.2, 485.4, 2.8, 20.3, -0.4, -4.5, 1
"""

CONTROL = """## GCP1, 1.0, 2.0, 3.0
0, 100.5, 200.5
1, 110.0, 210.0
# VAR1, 0, 0, 0
1, 50.0, 60.0
2, 55.0, 65.0
"""


def test_read_image_data(tmp_path):
    p = tmp_path / "imagedata.txt"
    p.write_text(IMAGEDATA)
    recs = read_image_data(str(p))
    assert len(recs) == 5
    assert recs[0].name == "image1"
    assert recs[0].camera_idx == 1 and recs[0].camera_model == 1
    # Inheritance: image2/3 inherit camera 1, image4 defines camera 2,
    # image5 switches back to camera 1 by index (README.md:126-138).
    assert recs[1].camera_idx == 1 and recs[1].camera_params == recs[0].camera_params
    assert recs[2].camera_idx == 1
    assert recs[3].camera_idx == 2 and recs[3].camera_model == 2
    assert len(recs[3].camera_params) == 8
    assert recs[4].camera_idx == 1 and recs[4].camera_model == 1
    assert recs[4].camera_params == recs[0].camera_params
    # IMU prior rvec is finite and deterministic.
    rv = recs[0].prior_rvec()
    assert np.isfinite(rv).all()

    models, params, image_cameras = cameras_from_records(recs)
    assert len(models) == 2
    assert list(image_cameras) == [0, 0, 0, 1, 0]
    assert params.shape == (2, 9)


def test_read_image_data_errors(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("img1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 1, PINHOLE, 1.0\n")
    with pytest.raises(ValueError):
        read_image_data(str(p))  # wrong param count
    p.write_text("img1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10\n")
    with pytest.raises(ValueError):
        read_image_data(str(p))  # first image must define camera


def test_read_control_points(tmp_path):
    p = tmp_path / "cp.txt"
    p.write_text(CONTROL)
    cps = read_control_point_data(str(p))
    assert len(cps) == 2
    assert cps[0].name == "GCP1" and cps[0].fixed
    assert np.allclose(cps[0].xyz, [1, 2, 3])
    assert cps[0].points2D == [(0, 100.5, 200.5), (1, 110.0, 210.0)]
    assert cps[1].name == "VAR1" and not cps[1].fixed

    out = tmp_path / "cp_out.txt"
    write_control_point_data(
        str(out), cps, [np.array([1.0, 2.0, 3.0]), np.array([4.0, 5.0, 6.0])],
        [2, 2], [0.5, 0.7],
    )
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 3 and "GCP1" in lines[1]


def test_mathx():
    assert median([1, 2, 3, 4]) == 2.5
    assert rel2abs_threshold(0.5, 100) == 50
    assert rel2abs_threshold(0.31, 10) == 4  # ceil
    assert rel2abs_threshold(30, 10) == 30
