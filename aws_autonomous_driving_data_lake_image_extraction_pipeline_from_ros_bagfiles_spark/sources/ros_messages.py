"""ROS message payload decoders (little-endian ROS1 serialization).

The decoder registry mirrors the reference's ``process_message_map``
(service/app/bagstream.py:379-384): fixed handlers for sensor_msgs/Image,
sensor_msgs/LaserScan, nav_msgs/Odometry, geometry_msgs/Wrench, and the
collapsed std_msgs/* family (bagstream.py:230-231); unknown types fall back
to an empty payload with a marker, like the reference's slot-inference
warning path (:233-237).

Field selections intentionally match the reference's typed projections
(P8): odometry keeps pose position/orientation + linear twist and DROPS
angular twist and covariances (bagstream.py:291-307); laser keeps the 9
scalar config fields (:271-283); wrench keeps force+torque (:309-320).

Serialization layout is the public ROS1 wire format: all little-endian,
``string`` = u32 length + bytes, ``Header`` = seq u32, stamp(sec u32,
nsec u32), frame_id string, fixed-size float arrays inline.
"""

from __future__ import annotations

import struct


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def i8(self) -> int:
        v = struct.unpack_from("<b", self.buf, self.pos)[0]
        self.pos += 1
        return v

    def i16(self) -> int:
        v = struct.unpack_from("<h", self.buf, self.pos)[0]
        self.pos += 2
        return v

    def i32(self) -> int:
        v = struct.unpack_from("<i", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def f32(self) -> float:
        v = struct.unpack_from("<f", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def f64(self) -> float:
        v = struct.unpack_from("<d", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def f64s(self, n: int) -> tuple[float, ...]:
        v = struct.unpack_from(f"<{n}d", self.buf, self.pos)
        self.pos += 8 * n
        return v

    def _check_len(self, n: int) -> None:
        # a u32 length prefix pointing past the buffer means a truncated
        # or corrupt payload; Python slicing would silently return the
        # short remainder, escaping both the named-ValueError corruption
        # contract and permissive mode (r8 review) — raise HERE so the
        # caller's except-wrapper attributes the bag and offset
        if self.pos + n > len(self.buf):
            raise ValueError(
                f"length prefix {n} overruns payload"
                f" ({len(self.buf) - self.pos} bytes remain at {self.pos})"
            )

    def string(self) -> str:
        n = self.u32()
        self._check_len(n)
        v = self.buf[self.pos : self.pos + n].decode("iso-8859-1")
        self.pos += n
        return v

    def raw(self) -> bytes:
        n = self.u32()
        self._check_len(n)
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def header(self) -> tuple[int, str]:
        seq = self.u32()
        self.u32()  # stamp.sec
        self.u32()  # stamp.nsec
        frame_id = self.string()
        return seq, frame_id


def _decode_image(r: _Reader) -> dict:
    seq, frame_id = r.header()
    height = r.u32()
    width = r.u32()
    encoding = r.string()
    r.u8()  # is_bigendian
    r.u32()  # step
    data = r.raw()
    return {
        "seq": seq,
        "frame_id": frame_id,
        "img_encoding": encoding,
        "img_width": width,
        "img_height": height,
        "img_data": data,
        "payload": None,
    }


def _decode_laserscan(r: _Reader) -> dict:
    seq, frame_id = r.header()
    names = (
        "angle_min",
        "angle_max",
        "angle_increment",
        "time_increment",
        "scan_time",
        "range_min",
        "range_max",
    )
    payload = {n: r.f32() for n in names}
    return {"seq": seq, "frame_id": frame_id, "payload": payload}


def _decode_odometry(r: _Reader) -> dict:
    seq, frame_id = r.header()
    r.string()  # child_frame_id: projected out, as in reference (:295)
    px, py, pz = r.f64s(3)
    ox, oy, oz, ow = r.f64s(4)
    r.f64s(36)  # pose covariance dropped (P8)
    lx, ly, lz = r.f64s(3)
    r.f64s(3)  # angular twist dropped (P8, bagstream.py:291-307)
    r.f64s(36)  # twist covariance dropped
    payload = {
        "pos_x": px, "pos_y": py, "pos_z": pz,
        "ori_x": ox, "ori_y": oy, "ori_z": oz, "ori_w": ow,
        "lin_x": lx, "lin_y": ly, "lin_z": lz,
    }
    return {"seq": seq, "frame_id": frame_id, "payload": payload}


def _decode_wrench(r: _Reader) -> dict:
    fx, fy, fz = r.f64s(3)
    tx, ty, tz = r.f64s(3)
    return {
        "payload": {
            "force_x": fx, "force_y": fy, "force_z": fz,
            "torque_x": tx, "torque_y": ty, "torque_z": tz,
        }
    }


def _decode_std(msg_type: str, r: _Reader) -> dict:
    kind = msg_type.rsplit("/", 1)[-1]
    if kind == "String":
        return {"payload": {"data": r.string()}}
    if kind == "Int32":
        return {"payload": {"data": r.i32()}}
    if kind == "Int16":
        return {"payload": {"data": r.i16()}}
    if kind == "Int8":
        return {"payload": {"data": r.i8()}}
    if kind in ("Float64",):
        return {"payload": {"data": r.f64()}}
    if kind in ("Float32",):
        return {"payload": {"data": r.f32()}}
    if kind == "Bool":
        return {"payload": {"data": bool(r.u8())}}
    return {"payload": {"_undecoded": msg_type}}


def decode_message(msg_type: str, data: bytes) -> dict:
    """Dispatch by connection type; unknown types -> marker payload."""
    r = _Reader(data)
    if msg_type == "sensor_msgs/Image":
        return _decode_image(r)
    if msg_type == "sensor_msgs/LaserScan":
        return _decode_laserscan(r)
    if msg_type == "nav_msgs/Odometry":
        return _decode_odometry(r)
    if msg_type == "geometry_msgs/Wrench":
        return _decode_wrench(r)
    if msg_type.startswith("std_msgs/"):
        return _decode_std(msg_type, r)
    return {"payload": {"_undecoded": msg_type}}
