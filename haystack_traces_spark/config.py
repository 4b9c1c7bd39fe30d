"""Whitelist index-field configuration (SURVEY.md §1.1 WhitelistIndexField).

The reference hot-reloads this from an external ES index every 60 s
(commons/.../config/reload/ConfigurationReloadElasticSearchProvider.scala:57-80);
here it is a plain value object the caller may re-load per batch (streaming
ingest re-reads at micro-batch boundaries, the Spark-idiomatic equivalent).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class WhitelistField:
    """One dynamically-indexed tag key
    (reference: WhitelistIndexFieldConfiguration.scala:33-45)."""

    name: str  # stored lowercased
    type: str = "string"  # string | long | int | double | bool
    enable_range_query: bool = False
    search_context: str = "span"  # span | trace
    aliases: tuple[str, ...] = ()
    enabled: bool = True

    def __post_init__(self):
        object.__setattr__(self, "name", self.name.lower())
        object.__setattr__(self, "type", self.type.lower())


@dataclass(frozen=True)
class WhitelistConfig:
    fields: tuple[WhitelistField, ...] = ()

    def enabled_fields(self) -> list[WhitelistField]:
        return [f for f in self.fields if f.enabled]

    def get(self, name: str) -> WhitelistField | None:
        name = name.lower()
        for f in self.fields:
            if f.enabled and (f.name == name or name in f.aliases):
                return f
        return None

    def field_names(self) -> list[str]:
        return [f.name for f in self.enabled_fields()]

    @staticmethod
    def from_json(text: str) -> "WhitelistConfig":
        rows = json.loads(text)
        return WhitelistConfig(
            tuple(
                WhitelistField(
                    name=r["name"],
                    type=r.get("type", "string"),
                    enable_range_query=r.get("enableRangeQuery", False),
                    search_context=r.get("searchContext", "span"),
                    aliases=tuple(r.get("aliases", ())),
                    enabled=r.get("enabled", True),
                )
                for r in rows
            )
        )


# Canonical test config (FIXTURES.md §3) + the mapping used on the driver
# events table (sources/events.py synthesizes these two tags).
DEFAULT_WHITELIST = WhitelistConfig(
    (
        WhitelistField("errorcode", "long", enable_range_query=True),
        WhitelistField("role", "string"),
    )
)
