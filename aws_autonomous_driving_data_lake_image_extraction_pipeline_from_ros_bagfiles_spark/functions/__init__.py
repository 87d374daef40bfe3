"""Column-expression helpers (SURVEY.md §2.8, F1-F23).

Everything here is a pure Catalyst expression (JVM-side, codegen-friendly);
no Python UDFs. Image-byte functions (F18-F21) live in
``operators.images`` because they are necessarily pandas UDFs.
"""

from .timeutil import (
    iso_for_path,
    iso_from_path,
    now_iso,
    ros_time_pack,
    ros_time_to_iso,
    ros_time_unpack_ts,
)
from .paths import (
    basename,
    camera_from_dir,
    dirname,
    extension_rewrite,
    frame_index,
    key_root,
    sanitize_name,
    strip_bucket_arn,
)
from .bbox import (
    bbox_corners,
    bbox_denormalize,
    bbox_normalize,
)

__all__ = [
    "iso_for_path",
    "iso_from_path",
    "now_iso",
    "ros_time_pack",
    "ros_time_to_iso",
    "ros_time_unpack_ts",
    "basename",
    "camera_from_dir",
    "dirname",
    "extension_rewrite",
    "frame_index",
    "key_root",
    "sanitize_name",
    "strip_bucket_arn",
    "bbox_corners",
    "bbox_denormalize",
    "bbox_normalize",
]
