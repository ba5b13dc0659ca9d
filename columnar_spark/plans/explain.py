"""Access-path report — the reference's iterator descriptions re-expressed.

Every reference iterator self-describes via `AddDesc`
(common/blockiterator.h:46) so the host can EXPLAIN which access path ran
(analyzer vs prefilter vs secondary index vs KNN). The Spark analog is
the physical plan; this module condenses `explain("formatted")` into the
facts that matter for the 100 TB posture:

- did filters reach the Parquet scan (PushedFilters)?
- was the projection pruned (ReadSchema)?
- how many shuffles (Exchange) and broadcasts does the plan carry?
- how much of the plan runs inside WholeStageCodegen?

Used by tests to *assert* pushdown/pruning instead of eyeballing plans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class AccessPathReport:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_exchanges: int = 0
    n_broadcasts: int = 0
    n_codegen_stages: int = 0
    n_scans: int = 0
    has_take_ordered: bool = False
    plan: str = ""

    def read_columns(self) -> set[str]:
        cols: set[str] = set()
        for rs in self.read_schemas:
            cols.update(re.findall(r"(\w+):", rs))
        return cols


def access_path_report(df: DataFrame, execute: bool = False) -> AccessPathReport:
    if execute:
        # AQE plans only reveal the final shape (codegen stages, coalesced
        # exchanges) after THIS plan executes (count() would spawn a
        # different query execution). Only use on small results.
        df.collect()
    qe = df._jdf.queryExecution()
    # executedPlan tree string: `*(n)` prefixes mark whole-stage-codegen
    # stages; node names appear exactly once per physical operator.
    tree = qe.executedPlan().toString()
    # executed AQE plans repeat the pre-execution plan under
    # "== Initial Plan ==" — keep only the final shape
    text = tree.split("== Initial Plan ==")[0]

    rep = AccessPathReport(plan=text)
    # long filter lists are truncated with "..." before the closing
    # bracket in plan strings, so capture to end-of-line / next section
    rep.pushed_filters = [
        m.strip().rstrip("],")
        for m in re.findall(r"PushedFilters: \[([^\r\n]*?)(?:\], |\]$|\.\.\.)", text, re.M)
        if m.strip().rstrip("],")
    ]
    rep.read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", text)
    rep.n_exchanges = len(re.findall(r"^\s*[+:\-|* (]*Exchange ", text, re.M))
    rep.n_broadcasts = len(re.findall(r"BroadcastExchange|BroadcastHashJoin", text))
    rep.n_codegen_stages = len(set(re.findall(r"\*\((\d+)\)", text)))
    rep.n_scans = len(re.findall(r"FileScan parquet", text))
    rep.has_take_ordered = "TakeOrderedAndProject" in text
    return rep
