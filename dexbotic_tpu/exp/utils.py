"""Misc exp utilities (reference: exp/utils.py)."""

from __future__ import annotations

import functools
import json
import os

import numpy as np


def require_config_keys(keys: list[str]):
    """Validate that a config object carries the required keys
    (exp/utils.py:43-51)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(config, *args, **kw):
            missing = [k for k in keys if getattr(config, k, None) is None]
            if missing:
                raise ValueError(f"{fn.__name__} missing config keys: {missing}")
            return fn(config, *args, **kw)

        return wrapper

    return deco


class NumpyEncoder(json.JSONEncoder):
    """json encoder tolerating numpy scalars/arrays (exp/utils.py:54)."""

    def default(self, obj):
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, (np.bool_,)):
            return bool(obj)
        return super().default(obj)


def enter_debug_mode():
    """Attach debugpy on rank 0 when DEBUG_PORT is set (exp/utils.py:32-40)."""
    port = os.environ.get("DEBUG_PORT")
    if not port:
        return
    try:
        import debugpy  # noqa: PLC0415

        debugpy.listen(int(port))
        print(f"debugpy listening on :{port}, waiting for client...")
        debugpy.wait_for_client()
    except ImportError:
        print("DEBUG_PORT set but debugpy not installed; continuing")
