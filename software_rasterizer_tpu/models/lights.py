"""Point lights (reference: include/light/Light.hpp light_struct)."""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class PointLight:
    """light_struct: {position, intensity} (Light.hpp:8-45)."""

    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    intensity: Tuple[float, float, float] = (0.0, 0.0, 0.0)


def pack_lights(lights: List[PointLight]) -> Tuple[np.ndarray, np.ndarray]:
    """-> positions (L,3) f32, intensities (L,3) f32 (L >= 1, zero-padded
    so shaders always see a static light count)."""
    if not lights:
        return np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32)
    pos = np.array([l.position for l in lights], np.float32)
    inten = np.array([l.intensity for l in lights], np.float32)
    return pos, inten
