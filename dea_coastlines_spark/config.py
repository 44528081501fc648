"""Run-config loading (reference: `load_config`,
coastlines/utils.py:26-34 — YAML from path; per-run config at
configs/dea_coastlines_config.yaml). Driver-side only, never a
data-plane op. JSON always works; YAML when PyYAML is present."""

from __future__ import annotations

import json
from typing import Any

DEFAULTS: dict[str, Any] = {
    # engine analogs of the reference's per-run knobs
    "water_index_threshold": 0.0,    # vector.py:563-566
    "min_vertices": 10,              # vector.py:1450-1456
    "baseline_spacing_m": 30.0,      # vector.py:1471
    "hotspot_radii_m": [10000.0, 5000.0, 1000.0],  # continental.py:105
    "stdev_threshold": 0.3,          # vector.py:401-407
    "count_threshold": 5,
    "cell_res": 11,
    "crs": "EPSG:3577",
}


def load_config(path: str | None = None, overrides: dict | None = None) -> dict:
    """DEFAULTS <- file (json/yaml by extension) <- overrides."""
    cfg = dict(DEFAULTS)
    if path:
        with open(path) as f:
            text = f.read()
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml
            except ImportError as e:  # pragma: no cover
                raise RuntimeError("PyYAML not installed; use JSON config") from e
            loaded = yaml.safe_load(text)
        else:
            loaded = json.loads(text)
        cfg.update(loaded or {})
    cfg.update(overrides or {})
    return cfg
