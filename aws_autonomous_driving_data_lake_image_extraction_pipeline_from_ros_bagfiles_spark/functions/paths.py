"""Path / key algebra (SURVEY §2.8 F4-F9, F22).

The reference correlates its tables through S3-key surgery: extension
rewrites join a frame to its label JSON (process-queue-sync.py:152;
select-labelling-imgs.py:143), a regex over the parent directory recovers
the camera name (process-queue-sync.py:46), and a ``(\\d+)`` search
recovers the frame index (check_pngs.py:1977). Re-expressed here as pure
column expressions so derived-key equi-joins stay broadcast-able and
codegen-compiled.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def extension_rewrite(key: Column, old: str, new: str) -> Column:
    """``key.replace("png","json")`` analog, anchored at end (F5).

    ``old`` is regex-escaped and ``new`` replacement-escaped: a dotted
    extension like ``tar.gz`` would otherwise also match ``tarXgz``, and
    a ``$``/``\\`` in the replacement would corrupt or throw (r8 review —
    latent; current call sites pass plain literals)."""
    import re as _re

    escaped_new = new.replace("\\", "\\\\").replace("$", "\\$")
    return F.regexp_replace(key, f"\\.{_re.escape(old)}$", f".{escaped_new}")


def camera_from_dir(parent_dir: Column) -> Column:
    """Leading ``[A-Za-z_]*`` of the parent dir = camera name (F4)."""
    return F.regexp_extract(parent_dir, "^([A-Za-z_]*)", 1)


def frame_index(name: Column) -> Column:
    """First digit run in a filename -> int frame index (F9)."""
    return F.regexp_extract(name, "(\\d+)", 1).cast("int")


def dirname(path: Column) -> Column:
    """Everything before the last ``/`` (F6)."""
    base = F.substring_index(path, "/", -1)
    return F.substring(path, F.lit(1), F.length(path) - F.length(base) - 1)


def basename(path: Column) -> Column:
    """Final path segment (F6)."""
    return F.substring_index(path, "/", -1)


def key_root(key: Column, levels: int = 1) -> Column:
    """First *levels* path segments (F6 prefix derivation)."""
    return F.substring_index(key, "/", levels)


def sanitize_name(name: Column, max_len: int = 80) -> Column:
    """``re.sub("\\W+","",name)`` + truncate (F7; bag-queue-proc.py:19-21)."""
    return F.substring(F.regexp_replace(name, "\\W+", ""), 1, max_len)


def strip_bucket_arn(arn: Column) -> Column:
    """``arn:aws:s3:::bucket`` -> ``bucket`` (F22; s3batch.py:42)."""
    return F.regexp_replace(arn, "^arn:aws:s3:::", "")


def normalize_label(name: Column) -> Column:
    """Label-name normalization ``' ' -> '_'`` (F8; process-queue-sync.py:69)."""
    return F.regexp_replace(name, " ", "_")
