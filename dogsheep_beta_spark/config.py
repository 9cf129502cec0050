"""Rules-config parsing (the system's catalog + view definitions).

Reference: /root/reference/dogsheep_beta/utils.py:100-112 — JSON-first,
YAML-fallback parse of a mapping::

    {db_name: {rule_name: {"sql": ..., "display": ..., "display_sql": ...}}}

This is driver-side Python, not a Spark op (SURVEY.md §2 A12).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


class BadMetadataError(Exception):
    """Raised when the rules file is neither valid JSON nor valid YAML."""


def parse_metadata(content: str) -> dict:
    """Parse rules config: try JSON first, then YAML (utils.py:104-112)."""
    try:
        return json.loads(content)
    except json.JSONDecodeError:
        pass
    try:
        import yaml  # optional dependency, like the reference's

        parsed = yaml.safe_load(content)
        if isinstance(parsed, dict):
            return parsed
    except ImportError:
        raise BadMetadataError(
            "Metadata is not valid JSON and PyYAML is unavailable for YAML parsing"
        )
    except Exception:
        pass
    raise BadMetadataError("Metadata is not valid JSON or YAML")


@dataclass
class Rule:
    """One (database, type) indexing rule (README.md:30-48)."""

    db: str
    name: str
    sql: str
    display: str | None = None
    display_sql: str | None = None

    @property
    def type_tag(self) -> str:
        # type = "<db>/<rule>" exactly (utils.py:47); downstream code parses it.
        return f"{self.db}/{self.name}"


def rules_from_config(config: dict, databases: list[str] | None = None) -> list[Rule]:
    """Flatten the parsed config into an ordered rule list.

    Order defines ``load_seq`` for last-writer-wins upsert determinism
    (SURVEY.md §7.3 item 4; the reference iterates dict order,
    utils.py:36-54).  ``databases`` mirrors the CLI ``-d`` subsetting flag
    (cli.py:27-32).
    """
    out: list[Rule] = []
    for db, rules in config.items():
        if databases and db not in databases:
            continue
        for name, spec in (rules or {}).items():
            if isinstance(spec, str):  # bare SQL string shorthand
                spec = {"sql": spec}
            out.append(
                Rule(
                    db=db,
                    name=name,
                    sql=spec["sql"],
                    display=spec.get("display"),
                    display_sql=spec.get("display_sql"),
                )
            )
    return out
