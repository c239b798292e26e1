"""Pipeline configuration loading.

The pipeline spec (annotator definitions, overlap strategy, slack regexp,
redactor chars) is the same JSON document format the reference uses
(deduce/deduce.py:96-123; deep-merge semantics deduce/utils.py:75-88,
pinned by tests/unit/test_utils.py:74-93).  The reference's shipped
``base_config.json`` is treated as DATA and read from the reference
checkout by default — override with the ``DEDUCE_SPARK_CONFIG`` env var or
an explicit path/dict.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional, Union

DEFAULT_CONFIG_PATH = Path(
    os.environ.get(
        "DEDUCE_SPARK_CONFIG", "/root/reference/deduce/base_config.json"
    )
)
DEFAULT_LOOKUP_PATH = Path(
    os.environ.get(
        "DEDUCE_SPARK_LOOKUP", "/root/reference/deduce/data/lookup"
    )
)


def deep_merge(base: dict, add: dict) -> dict:
    """Overwrite ``base`` with ``add``, recursing into nested dicts."""
    for key, value in add.items():
        if isinstance(value, dict):
            base[key] = deep_merge(base.get(key, {}), value)
        else:
            base[key] = value
    return base


def load_config(
    user_config: Optional[Union[str, Path, dict]] = None,
    load_base_config: bool = True,
    base_config_path: Union[str, Path] = DEFAULT_CONFIG_PATH,
) -> dict[str, Any]:
    config: dict[str, Any] = {}
    if load_base_config:
        with open(base_config_path, "r", encoding="utf-8") as fh:
            deep_merge(config, json.load(fh))
    if user_config is not None:
        if isinstance(user_config, (str, Path)):
            with open(user_config, "r", encoding="utf-8") as fh:
                user_config = json.load(fh)
        deep_merge(config, user_config)
    return config
