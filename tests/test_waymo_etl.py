"""Waymo raw ETL: TFRecord framing, proto wire decoding, range-image
geometry, KITTI export (`nerfdet_tpu/data/waymo_etl.py` vs the
reference `tools/data_converter/waymo_converter.py`).

The decoder is cross-validated against ``google.protobuf`` dynamic
messages built from the same schema transcription (the same technique
as `tests/test_waymo_submission.py`), plus analytic geometry checks
that do not depend on the transcription at all.
"""

import os

import numpy as np
import pytest

from nerfdet_tpu.data import waymo_etl as we


# -- framing ------------------------------------------------------------------

def test_crc32c_known_vector():
    # RFC 3720 / golang hash/crc32 Castagnoli test vector
    assert we.crc32c(b"123456789") == 0xE3069283
    assert we.crc32c(b"") == 0


def test_tfrecord_roundtrip(tmp_path):
    recs = [b"hello", b"", os.urandom(1000)]
    p = str(tmp_path / "a.tfrecord")
    we.write_tfrecord(p, recs)
    assert list(we.read_tfrecord(p)) == recs


def test_tfrecord_corruption_detected(tmp_path):
    p = str(tmp_path / "a.tfrecord")
    we.write_tfrecord(p, [b"payload-bytes"])
    blob = bytearray(open(p, "rb").read())
    blob[14] ^= 0xFF  # flip a payload byte
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError):
        list(we.read_tfrecord(p))
    # and reads fine with validation off
    assert len(list(we.read_tfrecord(p, validate=False))) == 1


# -- wire decoding ------------------------------------------------------------

def test_matrix_float_roundtrip():
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    out = we.decode_matrix_float(we.encode_matrix_float(arr))
    np.testing.assert_array_equal(out, arr)


def test_transform_roundtrip():
    t = np.arange(16, dtype=np.float64).reshape(4, 4)
    from nerfdet_tpu.core.waymo_submission import field_bytes, parse_wire

    buf = field_bytes(3, we.encode_transform(t))
    np.testing.assert_array_equal(we._transform(parse_wire(buf), 3), t)


def _dynamic_frame_class():
    """Minimal Frame proto built with google.protobuf from the SAME
    public-proto transcription (independent serializer: if our field
    numbers/types disagree with protobuf's wire output, decoding
    fails)."""
    from google.protobuf import (descriptor_pb2, descriptor_pool,
                                 message_factory)

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "waymo_frame_test.proto"
    fdp.package = "wtest"
    T = descriptor_pb2.FieldDescriptorProto

    def add_msg(name):
        m = fdp.message_type.add()
        m.name = name
        return m

    def add_field(msg, name, num, ftype, label=1, type_name=None):
        f = msg.field.add()
        f.name, f.number, f.type, f.label = name, num, ftype, label
        if type_name:
            f.type_name = f".wtest.{type_name}"
        return f

    tr = add_msg("Transform")
    add_field(tr, "transform", 1, T.TYPE_DOUBLE, label=3)

    box = add_msg("Box")
    for i, n in enumerate(("center_x", "center_y", "center_z", "length",
                           "width", "height", "heading"), 1):
        add_field(box, n, i, T.TYPE_DOUBLE)

    lab = add_msg("Label")
    add_field(lab, "box", 1, T.TYPE_MESSAGE, type_name="Box")
    add_field(lab, "type", 3, T.TYPE_INT32)
    add_field(lab, "id", 4, T.TYPE_STRING)
    add_field(lab, "num_lidar_points_in_box", 7, T.TYPE_INT32)

    cc = add_msg("CameraCalibration")
    add_field(cc, "name", 1, T.TYPE_INT32)
    add_field(cc, "intrinsic", 2, T.TYPE_DOUBLE, label=3)
    add_field(cc, "extrinsic", 3, T.TYPE_MESSAGE, type_name="Transform")
    add_field(cc, "width", 4, T.TYPE_INT32)
    add_field(cc, "height", 5, T.TYPE_INT32)

    lc = add_msg("LaserCalibration")
    add_field(lc, "name", 1, T.TYPE_INT32)
    add_field(lc, "beam_inclinations", 2, T.TYPE_DOUBLE, label=3)
    add_field(lc, "beam_inclination_min", 3, T.TYPE_DOUBLE)
    add_field(lc, "beam_inclination_max", 4, T.TYPE_DOUBLE)
    add_field(lc, "extrinsic", 5, T.TYPE_MESSAGE, type_name="Transform")

    ctx = add_msg("Context")
    add_field(ctx, "name", 1, T.TYPE_STRING)
    add_field(ctx, "camera_calibrations", 2, T.TYPE_MESSAGE, label=3,
              type_name="CameraCalibration")
    add_field(ctx, "laser_calibrations", 3, T.TYPE_MESSAGE, label=3,
              type_name="LaserCalibration")

    cl = add_msg("CameraLabels")
    add_field(cl, "name", 1, T.TYPE_INT32)
    add_field(cl, "labels", 2, T.TYPE_MESSAGE, label=3,
              type_name="Label")

    fr = add_msg("Frame")
    add_field(fr, "context", 1, T.TYPE_MESSAGE, type_name="Context")
    add_field(fr, "timestamp_micros", 2, T.TYPE_INT64)
    add_field(fr, "pose", 3, T.TYPE_MESSAGE, type_name="Transform")
    add_field(fr, "laser_labels", 6, T.TYPE_MESSAGE, label=3,
              type_name="Label")
    add_field(fr, "projected_lidar_labels", 9, T.TYPE_MESSAGE, label=3,
              type_name="CameraLabels")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return message_factory.GetMessageClass(
        pool.FindMessageTypeByName("wtest.Frame"))


def test_decoder_against_google_protobuf():
    FrameMsg = _dynamic_frame_class()
    msg = FrameMsg()
    msg.context.name = "ctx-17"
    cam = msg.context.camera_calibrations.add()
    cam.name = we.CAM_FRONT
    cam.intrinsic.extend([2000.0, 2010.0, 960.0, 640.0])
    cam.extrinsic.transform.extend(np.eye(4).flatten().tolist())
    cam.width, cam.height = 1920, 1280
    las = msg.context.laser_calibrations.add()
    las.name = we.LASER_TOP
    las.beam_inclination_min = -0.3
    las.beam_inclination_max = 0.2
    las.extrinsic.transform.extend(
        np.diag([1.0, 1, 1, 1]).flatten().tolist())
    msg.timestamp_micros = 1234567890123
    msg.pose.transform.extend(np.eye(4).flatten().tolist())
    lab = msg.laser_labels.add()
    lab.box.center_x, lab.box.center_y, lab.box.center_z = 1, 2, 3
    lab.box.length, lab.box.width, lab.box.height = 4.5, 1.9, 1.6
    lab.box.heading = 0.7
    lab.type = 1
    lab.id = "obj-1"
    lab.num_lidar_points_in_box = 42
    pl = msg.projected_lidar_labels.add()
    pl.name = we.CAM_FRONT
    sub = pl.labels.add()
    sub.box.center_x, sub.box.center_y = 100.0, 200.0
    sub.box.length, sub.box.width = 50.0, 30.0
    sub.id = "obj-1_FRONT"

    frame = we.Frame(msg.SerializeToString())
    assert frame.context.name == "ctx-17"
    assert frame.timestamp_micros == 1234567890123
    c = frame.context.camera_calibrations[0]
    assert c.name == we.CAM_FRONT and c.width == 1920
    np.testing.assert_allclose(c.intrinsic, [2000, 2010, 960, 640])
    lc = frame.context.laser_calibrations[0]
    assert lc.beam_inclination_max == pytest.approx(0.2)
    lab2 = frame.laser_labels[0]
    assert (lab2.id, lab2.type, lab2.num_lidar_points_in_box) == \
        ("obj-1", 1, 42)
    assert lab2.box.length == pytest.approx(4.5)
    assert frame.projected_lidar_labels[0].labels[0].id == "obj-1_FRONT"


# -- range-image geometry -------------------------------------------------------

def test_compute_inclination_bin_centers():
    incl = we.compute_inclination((-1.0, 1.0), 4)
    np.testing.assert_allclose(incl, [-0.75, -0.25, 0.25, 0.75])


def test_cartesian_range_preserved_identity_extrinsic():
    h, w = 8, 32
    rng = np.random.RandomState(0)
    rimg = rng.uniform(1.0, 50.0, (h, w))
    incl = we.compute_inclination((-0.3, 0.2), h)[::-1]
    pts = we.range_image_to_cartesian(rimg, np.eye(4), incl)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), rimg,
                               rtol=1e-9)


def test_cartesian_azimuth_and_inclination():
    """One pixel, hand-computed: row r uses inclination[r], column c
    uses azimuth (([W-c]-0.5)/W*2-1)*pi."""
    h, w = 2, 8
    rimg = np.zeros((h, w))
    rimg[1, 2] = 10.0
    incl = np.array([0.5, -0.1])  # already reversed (row 0 = top)
    pts = we.range_image_to_cartesian(rimg, np.eye(4), incl)
    az = ((w - 2 - 0.5) / w * 2 - 1) * np.pi
    expect = 10.0 * np.array([
        np.cos(-0.1) * np.cos(az), np.cos(-0.1) * np.sin(az),
        np.sin(-0.1)])
    np.testing.assert_allclose(pts[1, 2], expect, atol=1e-12)


def test_cartesian_extrinsic_and_azimuth_correction():
    """A pure-yaw extrinsic subtracts its yaw from the azimuth and adds
    it back through the rotation: vehicle-frame points must equal the
    identity-extrinsic points (plus translation)."""
    h, w = 4, 16
    rng = np.random.RandomState(1)
    rimg = rng.uniform(1.0, 20.0, (h, w))
    incl = we.compute_inclination((-0.4, 0.3), h)[::-1]
    base = we.range_image_to_cartesian(rimg, np.eye(4), incl)
    yaw = 0.8
    ext = np.eye(4)
    ext[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                   [np.sin(yaw), np.cos(yaw)]]
    ext[:3, 3] = [1.0, -2.0, 0.5]
    rot = we.range_image_to_cartesian(rimg, ext, incl)
    np.testing.assert_allclose(rot, base + ext[:3, 3], atol=1e-9)


def test_cartesian_identity_pixel_pose_matches_no_pose():
    h, w = 4, 8
    rng = np.random.RandomState(2)
    rimg = rng.uniform(1.0, 20.0, (h, w))
    incl = we.compute_inclination((-0.3, 0.1), h)[::-1]
    base = we.range_image_to_cartesian(rimg, np.eye(4), incl)
    pixel_pose = np.zeros((h, w, 6))  # identity rotation, 0 translation
    out = we.range_image_to_cartesian(rimg, np.eye(4), incl,
                                      pixel_pose=pixel_pose,
                                      frame_pose=np.eye(4))
    np.testing.assert_allclose(out, base, atol=1e-12)


def test_rotation_matrix_composition():
    r = we.get_rotation_matrix(np.array(0.1), np.array(-0.2),
                               np.array(0.3))
    cy, sy = np.cos(0.3), np.sin(0.3)
    cp, sp = np.cos(-0.2), np.sin(-0.2)
    cr, sr = np.cos(0.1), np.sin(0.1)
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    np.testing.assert_allclose(r, rz @ ry @ rx, atol=1e-12)


# -- full converter round trip ---------------------------------------------------

def _synthetic_tfrecord(tmp_path, n_frames=2):
    """Build a raw tfrecord with our encoder: 5 camera calibs, a TOP
    laser with analytic range image + per-pixel identity pose, one
    VEHICLE label (with its projected 2D box) and one SIGN label
    (filtered by class), one empty-box VEHICLE (filtered by
    num_points)."""
    rng = np.random.RandomState(5)
    h, w = 8, 32
    records = []
    for fi in range(n_frames):
        cams = []
        for name in range(1, 6):
            ext = np.eye(4)
            ext[:3, 3] = rng.uniform(-1, 1, 3)
            cams.append(we.encode_camera_calibration(
                name, [2000.0, 2000.0, 960.0, 640.0], ext, 1920, 1280))
        lasers_calib = [we.encode_laser_calibration(
            we.LASER_TOP, np.eye(4), -0.3, 0.2)]
        rimg = np.zeros((h, w, 4), np.float32)
        rimg[..., 0] = rng.uniform(1, 40, (h, w))
        rimg[..., 1] = rng.uniform(0, 1, (h, w))  # intensity
        rimg[..., 2] = rng.uniform(0, 0.3, (h, w))  # elongation
        rimg[2, 3, 0] = 0.0        # one no-return pixel
        rimg[4, 5, 3] = 1.0        # one no-label-zone pixel
        pose_img = np.zeros((h, w, 6), np.float32)
        ri = we.encode_range_image(rimg, pose=pose_img)

        box_keep = (10.0, 2.0, 1.0, 4.5, 1.9, 1.6, 0.3)
        labels = [
            we.encode_label(box_keep, 1, "veh-1", 25),
            we.encode_label((5, 5, 1, 2, 2, 2, 0.0), 3, "sign-1", 9),
            we.encode_label((8, 1, 1, 4, 2, 1.5, 0.1), 1, "veh-2", 0),
        ]
        proj = [(we.CAM_FRONT,
                 [we.encode_label((900, 600, 0, 80, 60, 0, 0),
                                  1, "veh-1_FRONT", 0)])]
        records.append(we.encode_frame(
            f"ctx_{fi}", 1650000000000000 + fi, np.eye(4),
            camera_calibrations=cams, laser_calibrations=lasers_calib,
            lasers=[(we.LASER_TOP, ri, None)],
            laser_labels=labels, projected_labels=proj))
    path = str(tmp_path / "segment-000.tfrecord")
    we.write_tfrecord(path, records)
    return path, rimg


def test_full_convert_roundtrip(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "kitti_format" / "training"
    raw.mkdir()
    path, rimg = _synthetic_tfrecord(raw)
    n = we.convert_waymo_tfrecords(str(raw), str(out), prefix="0",
                                   save_images=False)
    assert n == 1

    # velodyne: valid-pixel count x 1 return (second return absent),
    # 6 features; NLZ + zero-range pixels dropped
    cloud = np.fromfile(str(out / "velodyne" / "0000001.bin"),
                        np.float32).reshape(-1, 6)
    valid = (rimg[..., 0] > 0) & (rimg[..., 3] != 1.0)
    assert cloud.shape[0] == valid.sum()
    assert np.all(cloud[:, 5] == 1650000000000001.0)
    # ranges survive the identity extrinsic+pose chain
    np.testing.assert_allclose(
        np.sort(np.linalg.norm(cloud[:, :3], axis=1)),
        np.sort(rimg[..., 0][valid]), rtol=1e-5)

    # calib: P0 carries the front-cam intrinsics
    calib = we.parse_waymo_calib(str(out / "calib" / "0000000.txt"))
    assert calib["P0"][0, 0] == pytest.approx(2000.0)
    assert calib["P0"][0, 2] == pytest.approx(960.0)
    # velo->front-cam is the axis permutation x,y,z -> -y,-z,x
    # composed with the camera extrinsic inverse
    assert calib["Tr_velo_to_cam"].shape == (4, 4)

    # labels: SIGN filtered by class, veh-2 by num_points -> 1 line
    lines = open(out / "label_all" / "0000000.txt").read().strip() \
        .split("\n")
    assert len(lines) == 1
    tok = lines[0].split(" ")
    assert tok[0] == "Car"
    assert tok[-1] == "0"  # front camera id
    # projected 2D box: center (900, 600) size (80, 60)
    np.testing.assert_allclose([float(t) for t in tok[4:8]],
                               [860, 570, 940, 630])
    # 3D: h w l then xyz in the front-cam frame then rotation_y
    assert [float(t) for t in tok[8:11]] == [1.6, 1.9, 4.5]
    assert float(tok[14]) == pytest.approx(
        -0.3 - np.pi / 2, abs=0.01)

    # per-camera label file mirrors label_all without the cam column
    cam_lines = open(out / "label_0" / "0000000.txt").read().strip()
    assert cam_lines == " ".join(tok[:15])

    # pose round-trips
    np.testing.assert_allclose(
        np.loadtxt(out / "pose" / "0000000.txt"), np.eye(4))


def test_label_bottom_center_conversion(tmp_path):
    """The exported camera-frame location equals
    T_velo2cam @ (center - [0,0,h/2]) — checked via parse + inverse."""
    raw = tmp_path / "raw"
    out = tmp_path / "out" / "training"
    raw.mkdir()
    _synthetic_tfrecord(raw, n_frames=1)
    we.convert_waymo_tfrecords(str(raw), str(out), save_images=False)
    calib = we.parse_waymo_calib(str(out / "calib" / "0000000.txt"))
    tok = open(out / "label_all" / "0000000.txt").read().split()
    xyz_cam = np.array([float(tok[11]), float(tok[12]),
                        float(tok[13]), 1.0])
    back = np.linalg.inv(calib["Tr_velo_to_cam"]) @ xyz_cam
    np.testing.assert_allclose(back[:3], [10.0, 2.0, 1.0 - 1.6 / 2],
                               atol=0.02)  # 2-decimal label rounding


def test_waymo_infos_feed_dataset(tmp_path):
    from nerfdet_tpu.data.waymo_dataset import WaymoDataset

    raw = tmp_path / "raw"
    root = tmp_path / "kitti_format"
    raw.mkdir()
    _synthetic_tfrecord(raw, n_frames=2)
    we.convert_waymo_tfrecords(str(raw), str(root / "training"),
                               save_images=False)
    pkl = we.create_waymo_infos(str(root), split="train")
    ds = WaymoDataset(data_root=str(root), ann_file=pkl,
                      n_points=1024, max_gt=8)
    assert len(ds) == 2
    sample = ds[0]
    assert sample["points"].shape[1] >= 3
    assert sample["gt_count"] == 1  # the one surviving Car
    assert sample["gt_labels_3d"][0] == 0  # Car
