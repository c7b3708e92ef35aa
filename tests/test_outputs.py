"""Output writer tests: imagedataout round-trip, PLY/VRML well-formedness."""

import numpy as np
import pytest

from mavmap_tpu.features import ArrayFeatureProvider
from mavmap_tpu.sfm import SequentialMapper, SequentialMapperOptions, outputs
from mavmap_tpu.utils.io import ImageRecord, read_image_data
from mavmap_tpu.utils.synthetic import make_uav_scene, render_features


@pytest.fixture(scope="module")
def mapped():
    scene = make_uav_scene(num_images=4, num_points=1200, relief=10.0, seed=1)
    feats, _ = render_features(scene, pixel_noise=0.3, seed=1)
    cap = int(np.ceil(max(len(k) for k, _ in feats) / 256)) * 256
    prov = ArrayFeatureProvider(feats, capacity=cap)
    opts = SequentialMapperOptions(tri_min_angle=1.0, final_cost_threshold=2.0,
                                   essential_ransac_trials=256,
                                   p3p_ransac_trials=256)
    m = SequentialMapper(scene.image_cameras, scene.cam_models,
                         scene.cam_params, prov)
    assert m.process_initial(0, 1, opts)
    assert m.process(2, 1, opts)
    assert m.process(3, 2, opts)
    records = [
        ImageRecord(name=f"img{i}", camera_idx=0, camera_model=1,
                    camera_params=[700.0, 700.0, 400.0, 300.0])
        for i in range(4)
    ]
    return m, records, scene


def test_imagedataout_roundtrip(mapped, tmp_path):
    m, records, scene = mapped
    path = tmp_path / "imagedataout.txt"
    outputs.write_image_data(m, records, str(path))
    # The output is itself a valid imagedata.txt.
    recs = read_image_data(str(path))
    assert len(recs) == 4
    assert recs[0].camera_model == 1 and len(recs[0].camera_params) == 4
    # TX/TY/TZ columns are world camera centers: image 0 sits at the origin
    # (the gauge anchor).
    assert abs(recs[0].tx) < 1e-6 and abs(recs[0].ty) < 1e-6


def test_point_cloud_text_and_ply(mapped, tmp_path):
    m, records, scene = mapped
    txt = tmp_path / "pts.txt"
    ply = tmp_path / "pts.ply"
    outputs.write_point_cloud_data(m, str(txt), min_track_len=2)
    outputs.write_point_cloud_ply(m, str(ply), min_track_len=2)
    lines = txt.read_text().strip().splitlines()
    n_txt = len(lines) - 1
    header = ply.read_text().splitlines()
    assert header[0] == "ply"
    n_ply = int([l for l in header if l.startswith("element vertex")][0].split()[-1])
    assert n_txt == n_ply > 100
    # track-len filter reduces the count
    txt3 = tmp_path / "pts3.txt"
    outputs.write_point_cloud_data(m, str(txt3), min_track_len=3)
    assert len(txt3.read_text().strip().splitlines()) - 1 < n_txt


def test_vrml_outputs(mapped, tmp_path):
    m, records, scene = mapped
    for writer, name in [
        (outputs.write_camera_models_vrml, "cams.wrl"),
        (outputs.write_point_cloud_vrml, "pts.wrl"),
        (outputs.write_camera_connections_vrml, "conn.wrl"),
    ]:
        p = tmp_path / name
        writer(m, str(p))
        content = p.read_text()
        assert content.startswith("#VRML V2.0 utf8")
        assert "Shape" in content
    # connections: 3 processed pairs -> 3 line segments
    conn = (tmp_path / "conn.wrl").read_text()
    assert conn.count(",-1,") >= 3


def test_point_cloud_colors_from_imagery(mapped, tmp_path):
    """With an image_reader, the text point cloud carries mean 3x3-window
    RGB per point (reference sequential_mapper.cc:1559-1597); without one
    (or with unreadable imagery) the color columns are omitted."""
    m, records, scene = mapped

    def reader(image_idx):
        # Synthetic constant-color frames: point color == frame mix.
        v = 40 * (image_idx + 1)
        return np.full((600, 800, 3), v, np.uint8)

    path = tmp_path / "colored.txt"
    outputs.write_point_cloud_data(m, str(path), image_reader=reader)
    lines = [l for l in path.read_text().splitlines() if not l.startswith("#")]
    assert len(lines) > 100
    cols = np.array([[float(x) for x in l.split(",")] for l in lines])
    assert cols.shape[1] == 8  # X Y Z R G B LEN ERR
    rgb = cols[:, 3:6]
    assert (rgb >= 40).all() and (rgb <= 160).all()  # mixes of frame values

    path2 = tmp_path / "plain.txt"
    outputs.write_point_cloud_data(m, str(path2),
                                   image_reader=lambda i: None)
    lines2 = [l for l in path2.read_text().splitlines()
              if not l.startswith("#")]
    assert len(lines2[0].split(",")) == 5


def test_write_tracks_debug_images(mapped, tmp_path):
    """Per-track debug images (reference write_tracks naming scheme)."""
    m, records, scene = mapped

    def reader(image_idx):
        return np.full((600, 800), 128, np.uint8)

    import os
    n = outputs.write_tracks(m, str(tmp_path / "tracks"), 2, reader,
                             max_num_points=5)
    assert n > 5
    names = os.listdir(tmp_path / "tracks")
    assert all(nm.startswith("LEN") and "-P3D#" in nm and "-IMG#" in nm
               for nm in names)


def test_cli_point_cloud_vrml_variants(rng, tmp_path):
    """CLI writes the reference's four point-cloud VRML variants
    (write_mapper, mapper.cc:97-108)."""
    from mavmap_tpu.cli import main as cli_main
    from mavmap_tpu.utils.synthetic import make_uav_scene, render_features
    import hashlib, json

    scene = make_uav_scene(num_images=6, num_points=1500, relief=10.0,
                           rows=1, seed=6)
    feats, _ = render_features(scene, pixel_noise=0.3, clutter=10, seed=6)
    data, out, cache = tmp_path / "d", tmp_path / "o", tmp_path / "c"
    data.mkdir(), cache.mkdir()
    lines = ["# imagedata"]
    for i in range(6):
        cam_def = ", 1, PINHOLE, 700.0, 700.0, 400.0, 300.0" if i == 0 else ""
        lines.append(f"img{i}, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0{cam_def}")
    (data / "imagedata.txt").write_text("\n".join(lines) + "\n")
    params = {"hessian_threshold": 1000.0, "num_octaves": 4,
              "num_octave_layers": 3, "upright": False,
              "grid_size": (3, 3), "max_features": 1024}
    fp = hashlib.sha256(json.dumps(params, sort_keys=True).encode()).hexdigest()[:16]
    for i, (kp, de) in enumerate(feats):
        np.savez(cache / f"img{i}.npz", keypoints=kp, descriptors=de,
                 fingerprint=fp)
    rc = cli_main(["--input-path", str(data), "--output-path", str(out),
                   "--cache-path", str(cache), "--max-features", "1024",
                   "--min-track-len", "2", "--tri-min-angle", "1.0",
                   "--init-tri-min-angle", "4.0", "--quiet"])
    assert rc == 0
    for name in ("points3D.wrl", "points3D-all.wrl",
                 "points3D-min-track-len-2.wrl",
                 "points3D-min-track-len-3.wrl"):
        assert (out / name).exists(), name
    # "all" is a superset of the strict variants.
    n_all = (out / "points3D-all.wrl").read_text().count("\n")
    n_3 = (out / "points3D-min-track-len-3.wrl").read_text().count("\n")
    assert n_all >= n_3
