"""dogsheep_beta_spark — a PySpark-native analytics/search engine with the
query and data-processing capabilities of dogsheep/dogsheep-beta.

Reference semantics: /root/reference (dogsheep-beta 0.11, Apache-2.0).
Architecture (SURVEY.md §7): two layers —

1. Indexer (batch ETL): config-driven rule queries over registered source
   tables, conformed to the canonical ``search_index`` schema, deduplicated
   last-writer-wins, written as Parquet; plus a derived full-text index
   (postings + corpus stats) for BM25 search.
2. Query layer: a small compiler that turns a request (q, sort, filters)
   into DataFrame plans for timeline / full-text-search top-k, filtered
   count, and facet aggregations.

Everything is expressed with the public DataFrame / Spark SQL API so
Catalyst handles pushdown, pruning, join selection, and codegen.
"""

from dogsheep_beta_spark.schema import SEARCH_INDEX_SCHEMA, CATEGORIES
from dogsheep_beta_spark.config import parse_metadata, BadMetadataError
from dogsheep_beta_spark.indexer import build_search_index, run_indexer
from dogsheep_beta_spark.operators.fts_index import build_fts_index, write_fts_index
from dogsheep_beta_spark.plans.query import QueryPlan, compile_plan, timeline_query
from dogsheep_beta_spark.plans.search import search, search_query
from dogsheep_beta_spark.page import beta_page, page_context, render_page

__version__ = "0.1.0"

__all__ = [
    "SEARCH_INDEX_SCHEMA",
    "CATEGORIES",
    "parse_metadata",
    "BadMetadataError",
    "build_search_index",
    "run_indexer",
    "build_fts_index",
    "write_fts_index",
    "QueryPlan",
    "compile_plan",
    "timeline_query",
    "search",
    "search_query",
    "beta_page",
    "page_context",
    "render_page",
]
