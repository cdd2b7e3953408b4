"""CLI `key=@{...}`-style argument parsing.

Re-implements /root/reference/robogym/utils/parse_arguments.py:7-90: CLI
positional arguments of the form `name=value` where value may be a python
literal prefixed with `@` (e.g. `constants=@{"randomize": True}`), plus a
trailing env-name pattern list.
"""

from __future__ import annotations

import ast
from typing import Any, Dict, List, Tuple


def parse_arguments(argv: List[str]) -> Tuple[List[str], Dict[str, Any]]:
    """(parse_arguments.py:7-60). Returns (names, kwargs)."""
    names, kwargs = [], {}
    for arg in argv:
        if "=" in arg:
            k, v = arg.split("=", 1)
            kwargs[k] = _parse_value(v)
        else:
            names.append(arg)
    return names, kwargs


def _parse_value(value: str) -> Any:
    """(parse_arguments.py:61-90): `@`-prefixed python literals, else
    int/float/bool/str coercion."""
    if value.startswith("@"):
        return ast.literal_eval(value[1:])
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            pass
    if value.lower() in ("true", "false"):
        return value.lower() == "true"
    return value
