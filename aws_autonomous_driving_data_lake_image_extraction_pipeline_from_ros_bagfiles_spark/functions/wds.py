"""Pure-stdlib WebDataset shard codec.

WebDataset (webdataset.github.io) is the de-facto sharded training-set
format for large-scale loaders: plain POSIX tar archives whose members are
grouped into samples by basename — ``<key>.txt`` + ``<key>.json`` (+ any
other extensions) form one sample; shards are independent tar files a
data-parallel trainer streams without an index. This module implements the
container the way png.py / avi.py / recordio.py close their formats: from
the public spec, bytes-exactly, with zero third-party deps.

Determinism contract (what makes the q112 size-oracle and the round-trip
test possible): USTAR format, mtime=0, uid=gid=0, empty uname/gname, mode
0644, members emitted in the given order. Under those constraints the
archive layout is pure arithmetic:

- member = 512-byte header + data padded to a 512 multiple
- archive = members + two 512-byte zero end blocks, padded to the 10240
  tar blocking factor (Python tarfile's default RECORDSIZE)
"""

from __future__ import annotations

import io
import tarfile

BLOCK = 512
RECORDSIZE = 10240


def encode_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Deterministic USTAR archive of (name, data) members, in order."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = ""
            ti.mode = 0o644
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def decode_tar(buf: bytes) -> list[tuple[str, bytes]]:
    """-> [(name, data)] in archive order."""
    with tarfile.open(fileobj=io.BytesIO(buf)) as tf:
        return [
            (m.name, tf.extractfile(m).read() if m.size else b"")
            for m in tf.getmembers()
        ]


def member_bytes(data_len: int) -> int:
    """On-disk cost of one member: header block + 512-padded data."""
    return BLOCK + data_len + (BLOCK - data_len % BLOCK) % BLOCK


def archive_bytes(data_lens: list[int]) -> int:
    """Exact archive size for members of the given data lengths."""
    total = sum(member_bytes(n) for n in data_lens) + 2 * BLOCK
    return total + (RECORDSIZE - total % RECORDSIZE) % RECORDSIZE
