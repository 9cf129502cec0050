"""Driver-side presentation pass — J1/H4-H6/H10 in SURVEY.md §2.

The reference renders each result with a per-type Jinja template
(compiled once per type, __init__.py:170-175), falling back to a
``<pre>`` JSON dump (__init__.py:186-189), with ``template_debug``
rendering errors inline instead of failing the request
(__init__.py:176-185).  Facet values carry ``toggle_url``/``selected``
metadata and the page exposes alternate-sort links (__init__.py:68-79,
246-257).

All of this is presentation over ≤100 collected rows + ≤30-row facet
outputs, so it runs on the driver in plain Python — putting it in a UDF
would serialize HTML through the JVM for no reason (SURVEY §7.2).
"""

from __future__ import annotations

import html
import json
from urllib.parse import parse_qsl, urlencode

try:  # optional dependency, same role as in the reference
    import jinja2
except ImportError:  # pragma: no cover
    jinja2 = None

class TemplateCache:
    """Compile each per-type display template once (__init__.py:170-175)."""

    def __init__(self):
        if jinja2 is None:  # pragma: no cover
            raise ImportError("jinja2 is required for display templates")
        self._env = jinja2.Environment(autoescape=True)  # H5
        self._cache: dict[str, object] = {}

    def get(self, type_tag: str, source: str):
        if type_tag not in self._cache:
            self._cache[type_tag] = self._env.from_string(source)
        return self._cache[type_tag]


def default_output(result: dict) -> str:
    """H4 — ``<pre>`` JSON dump for types with no display template
    (__init__.py:186-189): json.dumps(default=repr, indent=4), escaped."""
    return "<pre>{}</pre>".format(
        html.escape(json.dumps(result, default=repr, indent=4))
    )


def process_results(
    results: list[dict],
    templates: dict[str, str],
    template_debug: bool = False,
) -> list[dict]:
    """J1 — attach rendered ``output`` HTML to each hydrated result.

    Mirrors __init__.py:149-190: template context is the full result
    row plus ``json``; render errors raise unless ``template_debug``,
    which inlines the exception like the reference's debug path."""
    cache = TemplateCache() if templates else None
    out = []
    for result in results:
        result = dict(result)
        source = templates.get(result["type"])
        if source is None:
            result["output"] = default_output(result)
        else:
            template = cache.get(result["type"], source)
            context = {**result, "json": json}
            try:
                result["output"] = template.render(context)
            except Exception as e:  # __init__.py:176-185
                if not template_debug:
                    raise
                result["output"] = (
                    '<pre style="border: 2px solid red">{}</pre>'.format(
                        html.escape(repr(e))
                    )
                )
        out.append(result)
    return out


def intcomma(value) -> str:
    """H6 — thousands separators for the filtered count
    (__init__.py:266-268)."""
    return f"{int(value):,}"


# H10 URL building (sort links + facet toggle URLs) lives in page.py
# (other_sort_links / toggle_url) — those are the golden-pinned
# reference-parity implementations; a second divergent copy here was
# removed in round 6 to avoid the wrong one being picked.


def parse_query_string(qs: str) -> dict:
    """Request-args helper (urlencode round-trip, H10)."""
    return dict(parse_qsl(qs.lstrip("?")))
