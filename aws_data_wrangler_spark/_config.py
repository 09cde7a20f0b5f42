"""Global engine configuration (ref: /root/reference/awswrangler/_config.py).

The reference exposes ``wr.config`` with attribute-style settings that
can also be fed from environment variables (``WR_*``). We keep the
same pattern with a Spark flavor: settings influence how sessions are
built and how the IO layer behaves.
"""

from __future__ import annotations

import functools
import inspect
import os
from typing import Any, Callable, Dict, Optional


_CONFIG_KEYS: Dict[str, type] = {
    # reference keys (ref: awswrangler/_config.py:25 _CONFIG_ARGS)
    "catalog_id": str,            # catalog account/id (carried, unused locally)
    "concurrent_partitioning": bool,  # no-op: Spark writes partitions concurrently
    "ctas_approach": bool,        # athena CTAS materialization toggle
    "database": str,              # default catalog database
    "max_cache_query_inspections": int,
    "max_cache_seconds": int,     # query-result cache TTL (athena analog)
    "s3_block_size": int,         # fs read block size (hadoop io buffer)
    "workgroup": str,             # carried for API parity
    "s3_endpoint_url": str,       # custom object-store endpoint (s3a)
    # engine-specific keys
    "shuffle_partitions": int,    # default spark.sql.shuffle.partitions
    "broadcast_threshold": int,   # autoBroadcastJoinThreshold bytes
}

_ENV_PREFIX = "WR_"


class _Config:
    """Attribute-style config with env-var override, mirroring wr.config."""

    def __init__(self) -> None:
        self._values: Dict[str, Any] = {}
        for key, caster in _CONFIG_KEYS.items():
            env = os.getenv(f"{_ENV_PREFIX}{key.upper()}")
            if env is not None:
                self._values[key] = caster(env)

    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        if key not in _CONFIG_KEYS:
            raise AttributeError(f"Unknown config key: {key}")
        return self._values.get(key)

    def __setattr__(self, key: str, value: Any) -> None:
        if key.startswith("_"):
            super().__setattr__(key, value)
            return
        if key not in _CONFIG_KEYS:
            raise AttributeError(f"Unknown config key: {key}")
        self._values[key] = _CONFIG_KEYS[key](value)

    def reset(self, item: Optional[str] = None) -> None:
        if item is None:
            self._values.clear()
        else:
            self._values.pop(item, None)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._values)


config = _Config()


def apply_configs(function: Callable[..., Any]) -> Callable[..., Any]:
    """Inject set config values into matching keyword arguments.

    Mirrors the reference decorator (ref: awswrangler/_config.py:337
    ``apply_configs``): for every parameter of ``function`` whose name
    is a config key, a value the user has set on ``config`` fills the
    argument when the caller left it unset (or passed ``None``, our
    sentinel for "use the default").
    """
    signature = inspect.signature(function)
    available = tuple(k for k in _CONFIG_KEYS if k in signature.parameters)

    @functools.wraps(function)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        bound = signature.bind_partial(*args, **kwargs).arguments
        for name in available:
            if bound.get(name) is None and getattr(config, name) is not None:
                bound[name] = getattr(config, name)
        var_kw = next(
            (p.name for p in signature.parameters.values() if p.kind == p.VAR_KEYWORD),
            None,
        )
        if var_kw and var_kw in bound:
            bound.update(bound.pop(var_kw))
        return function(**bound)

    return wrapper
