"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on a corpus derived from
sf0.001.  ``queries()`` exposes one entry per implemented operator family
(SURVEY.md §2 + the large-scale dedup/similarity/text-analysis additions);
``oracle_sql()`` gives the DuckDB-equivalent for every SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

The query bodies live in ``insurance_pdf_extractor_ray/queries/`` (shared
helpers in ``_shared.py``, bodies in ``q01..q06``, registry in
``registry.py``); this file is the thin driver-facing shim.
"""

from insurance_pdf_extractor_ray.queries import entry, oracle_sql, queries
from insurance_pdf_extractor_ray.queries import registry as _registry

__all__ = ["entry", "queries", "oracle_sql"]


def __getattr__(name):
    # Backward compatibility: tests/tools historically reached private helpers
    # (_q_*, _bpe_oracle, _skyline_2d, ...) through this module.
    return getattr(_registry, name)
