"""Sequence packing — assign documents to fixed-token-budget bins for
training-batch construction (the T5/GPT pretraining "pack short docs
together" pass).

Next-fit is inherently sequential (a bin's remaining capacity depends on
every earlier document), so it cannot be a window/aggregate expression.
The distributed form packs WITHIN partitions: range-partition the corpus
by (group, id) so each task owns a contiguous, bounded slice, then run
next-fit per partition with an Arrow-batched generator that carries bin
state across batches. Bins never span partitions — at most one
under-filled bin per partition boundary, the same locality trade real
pipelines make (packing is always done per shard; global bin-packing of
a 100 TB corpus would serialize it).

Bin ids are globally unique without coordination:
bin = partition_id * 2^40 + local_bin_index.

Documents larger than the budget get a bin of their own (callers chunk
or drop them upstream; the op must not lose rows).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PART_SHIFT = 40  # 2^40 bins per partition before collision — unreachable


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Next-fit packing of `df` rows into bins of capacity `budget`
    (sizes from `size_col`, e.g. a token count). Returns
    (id_col, size, bin_id, offset): offset is the document's start
    position inside its bin, so a downstream writer can lay sequences
    out contiguously. Deterministic for a fixed partitioning: rows are
    processed in ascending `id_col` order within each partition."""
    import pandas as pd  # noqa: F401 — arrow batches arrive as pandas

    sized = df.select(
        F.col(id_col).alias("id"), F.col(size_col).cast("long").alias("size")
    )
    n = num_partitions or sized.sparkSession.sparkContext.defaultParallelism
    parts = sized.repartitionByRange(n, "id").sortWithinPartitions("id")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid << _PART_SHIFT
        local_bin = 0
        used = 0  # tokens already in the open bin
        opened = False
        for pdf in batches:
            bins, offsets = [], []
            for size in pdf["size"]:
                s = int(size)
                if opened and used + s > budget:
                    local_bin += 1
                    used = 0
                opened = True
                offsets.append(used)
                bins.append(base + local_bin)
                used += s
            out = pdf.copy()
            out["bin_id"] = bins
            out["offset"] = offsets
            yield out

    schema = "id long, size long, bin_id long, offset long"
    packed = parts.mapInPandas(run, schema=schema)
    return packed.select(
        F.col("id").alias(id_col), "size", "bin_id", "offset"
    )
