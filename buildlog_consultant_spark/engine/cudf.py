"""CUDF (dose3) report parsing (reference: /root/reference/src/cudf.rs).

The reference deserializes the YAML block into typed structs; here we parse
with PyYAML and keep the dict shape (keys as in the YAML: ``output-version``,
``native-architecture``, ``report`` with ``package/version/architecture/
status/reasons``; reasons have ``missing.pkg.unsat-dependency`` /
``conflict.pkg1.unsat-conflict``)."""

from __future__ import annotations

import yaml


def parse_cudf(text: str) -> dict:
    doc = yaml.safe_load(text)
    if not isinstance(doc, dict):
        raise ValueError("not a CUDF document")
    ov = str(doc.get("output-version", ""))
    major, _, minor = ov.partition(".")
    doc["output-version"] = (int(major), int(minor or 0))
    return doc
