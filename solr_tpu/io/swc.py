"""SWC neuron-morphology import.

TPU-native re-creation of the reference's SWCReader
(solr/io/SWCReader.cpp: loadMorphologyFromFile — sample points become
spheres, parent edges become cylinders; soma/dendrite/axon types get
distinct materials).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["load_swc", "SWC_TYPE_COLORS"]

# SWC structure types -> display colors (reference: SWCReader's
# per-type material assignment).
SWC_TYPE_COLORS: Dict[int, tuple] = {
    1: (0.9, 0.3, 0.2),  # soma
    2: (0.2, 0.5, 0.9),  # axon
    3: (0.2, 0.8, 0.3),  # basal dendrite
    4: (0.8, 0.7, 0.2),  # apical dendrite
}
_DEFAULT = (0.7, 0.7, 0.7)


def load_swc(
    path: str,
    builder,
    scale: float = 1.0,
    center: bool = True,
    radius_scale: float = 1.0,
    specular: float = 0.3,
) -> int:
    """Load an SWC morphology; returns the number of samples added."""
    samples = {}  # id -> (type, pos, radius, parent)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 7:
                continue
            sid = int(parts[0])
            stype = int(parts[1])
            pos = np.asarray([float(parts[2]), float(parts[3]),
                              float(parts[4])])
            radius = float(parts[5])
            parent = int(parts[6])
            samples[sid] = (stype, pos, radius, parent)
    if not samples:
        return 0

    all_pos = np.stack([s[1] for s in samples.values()])
    offset = (
        0.5 * (all_pos.min(axis=0) + all_pos.max(axis=0)) if center else 0.0
    )

    mats: Dict[int, int] = {}

    def mat_for(stype: int) -> int:
        if stype not in mats:
            mats[stype] = builder.add_material(
                color=SWC_TYPE_COLORS.get(stype, _DEFAULT) + (1.0,),
                specular=specular,
            )
        return mats[stype]

    for sid, (stype, pos, radius, parent) in samples.items():
        p = tuple((pos - offset) * scale)
        r = max(radius * scale * radius_scale, 1e-4)
        builder.add_sphere(p, r, mat_for(stype))
        if parent in samples:
            _, ppos, pradius, _ = samples[parent]
            pp = tuple((ppos - offset) * scale)
            rr = max(min(radius, pradius) * scale * radius_scale, 1e-4)
            builder.add_cylinder(p, pp, rr, mat_for(stype))
    return len(samples)
