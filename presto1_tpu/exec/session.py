"""Sessions and layered configuration.

The reference's Session + SystemSessionProperties (~150 typed properties,
``core/trino-main/.../SystemSessionProperties.java:102``) and airlift
@Config POJOs reduce here to a typed property registry with three scopes:
engine defaults < server config < per-session overrides — same layering,
dataclass-based.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

# property name -> (type, default, description)
SYSTEM_SESSION_PROPERTIES: Dict[str, tuple] = {
    "join_distribution_type": (str, "automatic",
                               "automatic | partitioned | broadcast"),
    "distributed": (bool, False, "execute over the device mesh"),
    "mesh_devices": (int, 0, "0 = all available devices"),
    "max_group_capacity": (int, 1 << 26,
                           "upper bound on aggregation output slots"),
    "join_capacity_factor": (float, 2.0,
                             "initial output-capacity multiple for "
                             "non-unique joins"),
    "compile_queries": (bool, False,
                        "trace the full pipeline into one XLA program"),
    "query_max_memory": (int, 0,
                         "per-query device-memory limit in bytes "
                         "(0 = unlimited)"),
    "enable_dynamic_filtering": (bool, True,
                                 "build-side min/max domains compact "
                                 "join probes"),
    "spill_enabled": (bool, True,
                      "partition joins/aggregations through host RAM when "
                      "inputs exceed spill_threshold (eager mode)"),
    "spill_threshold": (int, 0,
                        "input bytes above which an operator spills "
                        "(0 = never)"),
}


@dataclass
class Session:
    user: str = "presto1"
    catalog: str = "tpch"
    schema: str = "sf1"
    query_id: str = field(default_factory=lambda: uuid.uuid4().hex[:16])
    properties: Dict[str, Any] = field(default_factory=dict)

    def get(self, name: str):
        if name in self.properties:
            return self.properties[name]
        if name in SYSTEM_SESSION_PROPERTIES:
            return SYSTEM_SESSION_PROPERTIES[name][1]
        raise KeyError(f"unknown session property {name}")

    def set(self, name: str, value) -> None:
        if name not in SYSTEM_SESSION_PROPERTIES:
            raise KeyError(f"unknown session property {name}")
        t = SYSTEM_SESSION_PROPERTIES[name][0]
        if t is bool and isinstance(value, str):
            value = value.lower() in ("true", "1", "on")
        self.properties[name] = t(value)
