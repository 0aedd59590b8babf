"""EXIF intrinsics bootstrap for the real-photo frontend.

The reference pipeline's step 0 seeds per-image focal lengths from EXIF +
a camera sensor-width database before any geometry runs (ref:
frame_main/MvgMvsPipeline.py:181-183 openMVG_main_SfMInit_ImageListing
with its sensor_width_camera_database.txt).  Same recipe here:

  focal_px = FocalLengthIn35mmFilm * max(w, h) / 36.0        (preferred)
  focal_px = FocalLength_mm / sensor_width_mm * max(w, h)    (via DB)
  focal_px = 1.2 * max(w, h)                                 (fallback —
             OpenMVG's default guess when EXIF is absent)

The principal point is assumed at the image center (OpenMVG's listing
default); distortion starts at zero and is estimated in BA
(sfm/distortion.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

# Sensor widths in millimetres for common camera families — a compact
# analog of OpenMVG's sensor_width_camera_database.txt (keys are matched
# as lowercase substrings of "Make Model").
SENSOR_WIDTH_DB_MM: Dict[str, float] = {
    "canon eos 5d": 36.0, "canon eos 6d": 35.8, "canon eos r": 36.0,
    "canon eos 80d": 22.5, "canon eos 90d": 22.3, "canon eos rebel": 22.3,
    "canon powershot": 7.6,
    "nikon d8": 35.9, "nikon d7": 23.5, "nikon d5": 23.5, "nikon z": 35.9,
    "sony ilce-7": 35.8, "sony ilce-6": 23.5, "sony dsc-rx100": 13.2,
    "fujifilm x": 23.5,
    "olympus": 17.3, "panasonic dmc": 17.3, "om digital": 17.3,
    "iphone": 4.8, "pixel": 6.17, "samsung sm-": 6.4,
    "dji": 6.3, "gopro": 6.17,
}

DEFAULT_FOCAL_FACTOR = 1.2    # focal_px = 1.2 * max(w, h) when unknown


def _rational(v) -> Optional[float]:
    try:
        return float(v)
    except (TypeError, ValueError, ZeroDivisionError):
        try:
            num, den = v
            return float(num) / float(den) if den else None
        except Exception:
            return None


def read_exif_tags(path: str) -> Dict[str, object]:
    """Best-effort EXIF read (Pillow); returns {} on any failure."""
    try:
        from PIL import ExifTags, Image
        with Image.open(path) as im:
            exif = im.getexif()
            if not exif:
                return {}
            out = {}
            merged = dict(exif)
            try:                      # photo-specific IFD carries focal
                merged.update(dict(exif.get_ifd(0x8769)))
            except Exception:
                pass
            for tag_id, value in merged.items():
                name = ExifTags.TAGS.get(tag_id, str(tag_id))
                out[name] = value
            return out
    except Exception:
        return {}


def focal_from_exif(path: str, width: int, height: int
                    ) -> Tuple[float, str]:
    """Estimate focal length in pixels for one photo.

    Returns (focal_px, source) with source one of "exif35", "exif_db",
    "default" — mirroring the listing step's precedence (ref:
    MvgMvsPipeline.py:181-183; OpenMVG SfMInit_ImageListing main).
    """
    dim = float(max(width, height))
    tags = read_exif_tags(path)
    f35 = _rational(tags.get("FocalLengthIn35mmFilm"))
    if f35 and f35 > 0:
        return f35 * dim / 36.0, "exif35"
    f_mm = _rational(tags.get("FocalLength"))
    if f_mm and f_mm > 0:
        ident = (str(tags.get("Make", "")) + " "
                 + str(tags.get("Model", ""))).strip().lower()
        for key, sensor_mm in SENSOR_WIDTH_DB_MM.items():
            if key in ident:
                return f_mm / sensor_mm * dim, "exif_db"
    return DEFAULT_FOCAL_FACTOR * dim, "default"


def intrinsics_from_photo(path: str, width: int, height: int):
    """(K, source): pinhole intrinsics seeded from EXIF, principal point
    at the image center."""
    import numpy as np
    f, source = focal_from_exif(path, width, height)
    K = np.array([[f, 0.0, width / 2.0],
                  [0.0, f, height / 2.0],
                  [0.0, 0.0, 1.0]])
    return K, source


def scene_intrinsics_from_photos(paths, widths, heights):
    """Shared-intrinsics bootstrap for an image directory: the median
    focal over images that carry EXIF (single-camera assumption — the
    common capture setup and the reference's single intrinsic group)."""
    import numpy as np
    if len(set(zip(widths, heights))) > 1:
        # a mixed-size directory would silently get the first image's
        # principal point and per-image focal scaling — downstream SfM
        # would consume a wrong K and only crash (or worse, converge
        # badly) much later
        raise ValueError(
            "scene_intrinsics_from_photos: images have mixed sizes "
            f"({sorted(set(zip(widths, heights)))}); shared-intrinsics "
            "bootstrap requires a single capture size — resize the "
            "images or pass per-image intrinsics explicitly")
    focals, sources = [], []
    for p, w, h in zip(paths, widths, heights):
        f, s = focal_from_exif(p, w, h)
        focals.append(f)
        sources.append(s)
    informative = [f for f, s in zip(focals, sources) if s != "default"]
    f = float(np.median(informative if informative else focals))
    w, h = widths[0], heights[0]
    K = np.array([[f, 0.0, w / 2.0], [0.0, f, h / 2.0], [0.0, 0.0, 1.0]])
    src = ("exif" if informative else "default")
    return K, src
