"""Streaming grouped-map: applyInPandas semantics without the per-group
protocol round-trip.

`DataFrame.groupBy(keys).applyInPandas(fn, schema)` ships every group
through its own Arrow batch + pandas frame + result-schema check —
measured ~3 ms of pure protocol per GROUP on this build. Dedup verify
stages group on (band, bucket, block-pair): thousands of 2-row groups,
so the protocol dominated the stage ~10:1 (3.0 s noop applyInPandas vs
0.3 s for the same shuffle through one mapInPandas pass at sf0.1).

`grouped_map_stream` keeps the exact per-group function contract but
runs it inside ONE mapInPandas pass over data hash-partitioned and
sorted by the group keys: groups arrive as contiguous runs, the wrapper
slices them out of each Arrow batch, buffers at most the one group that
may straddle a batch boundary (bounded: a group is one buffered unit —
callers must bound group size, exactly as applyInPandas required a group
to fit one task), and yields one concatenated result frame per input
batch instead of one per group. Same shuffle count as applyInPandas
(its grouping exchange becomes the repartition), same memory contract,
~10x less per-group overhead when groups are small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_map_stream(df: DataFrame, keys: list[str], fn,
                       schema: str) -> DataFrame:
    """applyInPandas(fn) over df.groupBy(keys), run as one streaming
    mapInPandas pass. `fn(pdf) -> pdf` receives one whole group, exactly
    like applyInPandas (including the group key columns)."""
    import pandas as pd

    def _stream(batches):
        buf = None  # the possibly-incomplete trailing group of last batch
        for pdf in batches:
            if buf is not None:
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            n = len(pdf)
            if not n:
                continue
            kv = pdf[keys]
            # sorted input → the final group is a contiguous suffix; it
            # may continue into the next batch, so hold it back
            tail_mask = (kv == kv.iloc[-1]).all(axis=1).to_numpy()
            start = n - 1
            while start > 0 and tail_mask[start - 1]:
                start -= 1
            buf = pdf.iloc[start:].copy()
            head = pdf.iloc[:start]
            if not len(head):
                continue
            out = [fn(g) for _, g in head.groupby(keys, sort=False)]
            out = [o for o in out if o is not None and len(o)]
            if out:
                yield pd.concat(out, ignore_index=True)
        if buf is not None and len(buf):
            out = [fn(g) for _, g in buf.groupby(keys, sort=False)]
            out = [o for o in out if o is not None and len(o)]
            if out:
                yield pd.concat(out, ignore_index=True)

    return (df.repartition(*keys)
            .sortWithinPartitions(*keys)
            .mapInPandas(_stream, schema))
