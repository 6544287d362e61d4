"""OME identifier generation + channel-name rules.

Semantics from ref bioio/ome_utils.py:17-63 — `Image:{i}` scene ids,
`Channel:{image_idx}:{c}` channel ids (the "Image:" prefix of the owning image
id is stripped before embedding), and the BioImage-tier guarantee that a
Channel coordinate always exists (generated when absent,
ref bio_image.py:527-539, array_like_reader.py:302-378).
"""

from __future__ import annotations

from typing import Optional, Sequence


def generate_ome_image_id(image_index: int | str) -> str:
    return f"Image:{image_index}"


def generate_ome_channel_id(image_id: str | int, channel_index: int | str) -> str:
    idx = str(image_id)
    if idx.startswith("Image:"):
        idx = idx[len("Image:"):]
    return f"Channel:{idx}:{channel_index}"


def resolve_channel_names(
    channel_names: Optional[Sequence[str]],
    size_c: Optional[int],
    scene_index: int,
) -> list[str]:
    """Validate provided channel names or generate defaults.

    Mirrors ref array_like_reader.py:302-378: provided names must match the
    channel-dim size (ValueError otherwise); names given with no C dim is an
    error; absent names are generated as Channel:{scene_idx}:{c}.
    """
    if channel_names is not None:
        if size_c is None:
            raise ValueError(
                "Channel names provided but data has no Channel dimension"
            )
        names = list(channel_names)
        if len(names) != size_c:
            raise ValueError(
                f"Provided {len(names)} channel names for C dim of size {size_c}"
            )
        return names
    if size_c is None:
        return []
    return [generate_ome_channel_id(scene_index, c) for c in range(size_c)]


# re-exported here for reference-parity (ref ome_utils.py:101-137 defines
# the dtype<->OME map in this module; ours lives in types.py)
from bioio_spark.types import (dtype_to_ome_type,  # noqa: E402,F401
                               ome_to_numpy_dtype)
