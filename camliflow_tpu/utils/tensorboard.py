"""Minimal, dependency-free TensorBoard event-file writer.

The reference logs scalars and flow images through torch's SummaryWriter
(reference train.py:61, 210-226). This module writes the same on-disk format
— TFRecord-framed `Event` protos (`events.out.tfevents.*`) readable by any
TensorBoard — without depending on tensorflow or tensorboard packages:
the two protos involved (Event, Summary) are tiny and stable, so they are
hand-encoded with protobuf wire rules, and the TFRecord framing uses a pure
Python CRC32C.

Supported summaries: scalars (`add_scalar`) and RGB images (`add_image`,
PNG-encoded). That covers everything the reference writes.
"""

from __future__ import annotations

import os
import socket
import struct
import time
import zlib
from pathlib import Path

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli, reflected poly 0x82F63B78) — required by TFRecord
# ---------------------------------------------------------------------------

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
            table.append(crc)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf wire-format encoding (just what Event/Summary need)
# ---------------------------------------------------------------------------


def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _key(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _double_field(field: int, value: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", value)


def _float_field(field: int, value: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", value)


def _int_field(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value)


def _bytes_field(field: int, value: bytes) -> bytes:
    return _key(field, 2) + _varint(len(value)) + value


def _string_field(field: int, value: str) -> bytes:
    return _bytes_field(field, value.encode("utf-8"))


def _encode_event(wall_time: float, step: int | None = None,
                  file_version: str | None = None,
                  summary: bytes | None = None) -> bytes:
    # Event proto: 1=wall_time(double), 2=step(int64), 3=file_version(string),
    # 5=summary(Summary)
    out = _double_field(1, wall_time)
    if step is not None:
        out += _int_field(2, step)
    if file_version is not None:
        out += _string_field(3, file_version)
    if summary is not None:
        out += _bytes_field(5, summary)
    return out


def _encode_scalar_summary(tag: str, value: float) -> bytes:
    # Summary.Value: 1=tag(string), 2=simple_value(float)
    v = _string_field(1, tag) + _float_field(2, float(value))
    return _bytes_field(1, v)  # Summary: repeated Value value = 1


def _encode_image_summary(tag: str, png: bytes, height: int, width: int) -> bytes:
    # Summary.Image: 1=height, 2=width, 3=colorspace(3=RGB), 4=encoded bytes
    img = (
        _int_field(1, height)
        + _int_field(2, width)
        + _int_field(3, 3)
        + _bytes_field(4, png)
    )
    # Summary.Value: 1=tag, 4=image
    v = _string_field(1, tag) + _bytes_field(4, img)
    return _bytes_field(1, v)


# ---------------------------------------------------------------------------
# PNG encoding (pure zlib fallback; cv2 when available)
# ---------------------------------------------------------------------------


def encode_png(rgb) -> bytes:
    """uint8 [H, W, 3] -> PNG bytes."""
    import numpy as np

    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    try:
        import cv2

        ok, buf = cv2.imencode(".png", rgb[..., ::-1])  # cv2 wants BGR
        if ok:
            return buf.tobytes()
    except Exception:
        pass
    # minimal PNG: 8-bit RGB, no interlace, filter byte 0 per row
    height, width = rgb.shape[:2]

    def chunk(kind: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + kind
            + payload
            + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# the writer
# ---------------------------------------------------------------------------


class EventWriter:
    """Append-only TensorBoard event-file writer (SummaryWriter analog)."""

    def __init__(self, log_dir: str | os.PathLike):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        fname = (
            f"events.out.tfevents.{int(time.time())}."
            f"{socket.gethostname()}.{os.getpid()}.0"
        )
        self.path = self.log_dir / fname
        self._file = open(self.path, "ab")
        self._write_record(
            _encode_event(time.time(), file_version="brain.Event:2")
        )
        self.flush()

    def _write_record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        self._file.write(header)
        self._file.write(struct.pack("<I", _masked_crc(header)))
        self._file.write(data)
        self._file.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int):
        summary = _encode_scalar_summary(tag, value)
        self._write_record(_encode_event(time.time(), step=int(step),
                                         summary=summary))

    def add_image(self, tag: str, rgb, step: int):
        """rgb: uint8 [H, W, 3]."""
        height, width = rgb.shape[:2]
        summary = _encode_image_summary(tag, encode_png(rgb), height, width)
        self._write_record(_encode_event(time.time(), step=int(step),
                                         summary=summary))

    def flush(self):
        self._file.flush()

    def close(self):
        if not self._file.closed:
            self._file.flush()
            self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
