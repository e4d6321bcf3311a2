"""Waymo submission writer: wire format cross-validated against a real
``google.protobuf`` dynamic message built from the same schema, and the
KITTI->Waymo box math checked analytically."""

import numpy as np
import pytest

from nerfdet_tpu.core.waymo_submission import (
    T_REF_TO_FRONT_CAM, TYPE_PEDESTRIAN, TYPE_VEHICLE,
    encode_objects, kitti_result_to_objects, parse_wire, wrap_heading,
    write_submission)


def _dynamic_objects_class():
    """Build metrics.Objects with google.protobuf (no waymo SDK)."""
    from google.protobuf import descriptor_pb2, descriptor_pool, \
        message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "test_waymo_metrics.proto"
    fdp.package = "waymo.open_dataset"
    fdp.syntax = "proto2"

    label = fdp.message_type.add()
    label.name = "Label"
    box = label.nested_type.add()
    box.name = "Box"
    for num, fname in ((1, "center_x"), (2, "center_y"), (3, "center_z"),
                       (4, "length"), (5, "width"), (6, "height"),
                       (7, "heading")):
        f = box.field.add()
        f.name, f.number = fname, num
        f.type = descriptor_pb2.FieldDescriptorProto.TYPE_DOUBLE
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    enum = label.enum_type.add()
    enum.name = "Type"
    for i, n in enumerate(("TYPE_UNKNOWN", "TYPE_VEHICLE",
                           "TYPE_PEDESTRIAN", "TYPE_SIGN",
                           "TYPE_CYCLIST")):
        v = enum.value.add()
        v.name, v.number = n, i
    f = label.field.add()
    f.name, f.number = "box", 1
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    f.type_name = ".waymo.open_dataset.Label.Box"
    f = label.field.add()
    f.name, f.number = "type", 3
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_ENUM
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    f.type_name = ".waymo.open_dataset.Label.Type"

    obj = fdp.message_type.add()
    obj.name = "Object"
    specs = ((1, "object", "TYPE_MESSAGE", ".waymo.open_dataset.Label"),
             (2, "score", "TYPE_FLOAT", None),
             (3, "overlap_with_nlz", "TYPE_BOOL", None),
             (4, "context_name", "TYPE_STRING", None),
             (5, "frame_timestamp_micros", "TYPE_INT64", None))
    for num, fname, ftype, tname in specs:
        f = obj.field.add()
        f.name, f.number = fname, num
        f.type = getattr(descriptor_pb2.FieldDescriptorProto, ftype)
        f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
        if tname:
            f.type_name = tname

    objs = fdp.message_type.add()
    objs.name = "Objects"
    f = objs.field.add()
    f.name, f.number = "objects", 1
    f.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
    f.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED
    f.type_name = ".waymo.open_dataset.Object"

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return message_factory.GetMessageClass(
        pool.FindMessageTypeByName("waymo.open_dataset.Objects"))


def _frame():
    return dict(
        name=np.array(["Car", "Pedestrian", "DontCare"]),
        dimensions=np.array([[4.5, 1.6, 1.9], [0.8, 1.7, 0.7],
                             [1.0, 1.0, 1.0]]),  # (l, h, w)
        location=np.array([[1.0, 1.5, 10.0], [-2.0, 1.2, 6.0],
                           [0.0, 0.0, 0.0]]),
        rotation_y=np.array([0.3, -1.2, 0.0]),
        score=np.array([0.9, 0.55, 0.1]))


def test_roundtrip_against_real_protobuf(tmp_path):
    Objects = _dynamic_objects_class()
    out = str(tmp_path / "sub.bin")
    T_fc2v = np.eye(4)
    T_fc2v[:3, 3] = [1.5, 0.0, 2.1]
    write_submission([_frame()], ["ctx_abc"], [1234567890123456], out,
                     T_front_cam_to_vehicle=[T_fc2v])

    msg = Objects()
    with open(out, "rb") as f:
        msg.ParseFromString(f.read())
    assert len(msg.objects) == 2  # DontCare skipped
    car = msg.objects[0]
    assert car.object.type == TYPE_VEHICLE
    assert msg.objects[1].object.type == TYPE_PEDESTRIAN
    assert car.context_name == "ctx_abc"
    assert car.frame_timestamp_micros == 1234567890123456
    assert car.score == pytest.approx(0.9)
    # analytic frame conversion: cam (x, y-h/2, z) through T_k2w
    T_k2w = T_fc2v @ T_REF_TO_FRONT_CAM
    p = T_k2w @ np.array([1.0, 1.5 - 1.6 / 2, 10.0, 1.0])
    assert car.object.box.center_x == pytest.approx(p[0])
    assert car.object.box.center_y == pytest.approx(p[1])
    assert car.object.box.center_z == pytest.approx(p[2])
    assert car.object.box.length == pytest.approx(4.5)
    assert car.object.box.width == pytest.approx(1.9)
    assert car.object.box.height == pytest.approx(1.6)
    assert car.object.box.heading == pytest.approx(
        wrap_heading(-(0.3 + np.pi / 2)))


def test_reencode_byte_identical(tmp_path):
    """Our encoder's bytes == real protobuf's bytes for the same data."""
    Objects = _dynamic_objects_class()
    objs = kitti_result_to_objects(
        _frame(), T_REF_TO_FRONT_CAM, "ctx", 42)
    ours = encode_objects(objs)
    msg = Objects()
    msg.ParseFromString(ours)
    assert msg.SerializeToString(deterministic=True) == ours


def test_parse_wire_helper():
    objs = kitti_result_to_objects(_frame(), np.eye(4), "c", -7)
    top = parse_wire(encode_objects(objs))
    assert len(top[1]) == 2
    obj = parse_wire(top[1][0])
    # negative int64 survives two's-complement varint
    assert obj[5][0] - (1 << 64) == -7
    label = parse_wire(obj[1][0])
    box = parse_wire(label[1][0])
    assert set(box) == {1, 2, 3, 4, 5, 6, 7}


def test_wrap_heading():
    assert wrap_heading(3 * np.pi) == pytest.approx(np.pi)
    assert wrap_heading(-3 * np.pi) == pytest.approx(-np.pi)
    assert wrap_heading(0.5) == 0.5
