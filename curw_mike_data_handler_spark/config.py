"""Control-plane config handling.

Mirrors the reference's defaulted JSON attribute reads
(read_attribute_from_config_file, inputs/gen_mike_input_rf_linux.py:53-68)
without its failure mode (sys.exit on missing mandatory attribute →
here: raise). JSON stays strictly control-plane (SURVEY.md §2.8).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any


class ConfigError(ValueError):
    pass


def load_config(path: str | Path) -> dict[str, Any]:
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def read_attribute(config: dict[str, Any], attribute: str, mandatory: bool = False) -> Any:
    """Defaulted attribute read; empty values count as missing
    (reference treats `""` as absent — rf_linux:60)."""
    value = config.get(attribute)
    if value not in (None, ""):
        return value
    if mandatory:
        raise ConfigError(f"{attribute} not specified in config")
    return None
