"""Ordered multi-step reshape pipeline — the XSLT-chain analogue.

Parity: the reference's ``xslTransform`` (src/main/index.js:87-126)
reads a control document whose ``xi:include`` entries name a CHAIN of
stylesheets; ``xslPipeline`` applies them in document order, each step
consuming the previous step's output. libxslt does not exist in this
environment, and row-at-a-time stylesheet application would be the
wrong execution model anyway — what survives is the observable
behavior: an ordered chain of declarative reshapes resolved from an
xi:include control file.

Here each chain step is a transform-mapping spec (plans/mapping.py, the
same spec language as applyTransform) stored as JSON. The control XML
is parsed driver-side (it is configuration, not data); the steps
compile to consecutive ``select`` projections over the DataFrame, which
Catalyst collapses into a single whole-stage-codegen projection — the
chain costs ONE pass over the data regardless of its length, applied
distributed with no driver row loop.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame

from cpx_etl_spark.plans.mapping import apply_mapping


def _local_name(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag.rsplit(":", 1)[-1]


def load_chain(control_path: str, base_dir: str | None = None) -> list[dict]:
    """Resolve a control document's xi:include chain to mapping specs.

    Includes are collected in DOCUMENT ORDER (the reference applies
    ``transform['xi:include']`` head-first, index.js:119-124); each
    href resolves relative to the control file and must contain a JSON
    mapping spec. Namespaced ({http://www.w3.org/2001/XInclude}include)
    and plain ``xi:include`` spellings both work.
    """
    root = ET.parse(control_path).getroot()
    base = base_dir if base_dir is not None else os.path.dirname(control_path)
    specs: list[dict] = []
    for elem in root.iter():
        if _local_name(elem.tag) != "include":
            continue
        href = elem.attrib.get("href")
        if not href:
            raise ValueError(f"xsl_chain: include without href in {control_path}")
        with open(os.path.join(base, href), encoding="utf-8") as fh:
            specs.append(json.load(fh))
    if not specs:
        raise ValueError(f"xsl_chain: no xi:include entries in {control_path}")
    return specs


def apply_chain(df: DataFrame, specs: list[dict]) -> DataFrame:
    """Apply the reshape chain in order. Consecutive projections fuse
    into one Catalyst plan — verified by tests/test_plans.py (a chain
    of N steps shows a single Project over the scan)."""
    for spec in specs:
        df = apply_mapping(df, spec)
    return df


def apply_chain_from_control(df: DataFrame, control_path: str) -> DataFrame:
    return apply_chain(df, load_chain(control_path))
