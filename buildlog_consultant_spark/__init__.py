"""buildlog_consultant_spark — a PySpark-native log parse → classify → enrich →
route → aggregate engine with the query semantics of jelmer/buildlog-consultant.

Layout:
  core/      pure-Python matcher/problem engine (no Spark) — the semantic core
  rules/     the ordered regex-matcher catalogs (primary, secondary, brz, apt …)
  engine/    the per-document analysis algorithms (build/sbuild/apt/autopkgtest)
  spark/     the distributed pipeline: classify UDFs, enrich, route, sinks
  ops/       web-scale training-data operators (dedup, similarity, text stats)
"""

__version__ = "0.1.0"
