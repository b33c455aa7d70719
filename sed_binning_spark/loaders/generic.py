"""Generic loader: parquet / csv / json folders or file lists -> one event
DataFrame (reference GenericLoader, sed/loader/generic/loader.py:30-100).

Adds the two engine-minted bookkeeping columns every ordered operator keys
on: ``file_id`` (position of the source file in the naturally-sorted input
list — the Spark stand-in for the reference's dask partition number, used by
partition pruning P7 and return_partitions A8) and ``row_id`` (stable
in-file row index, used by fills/diffs W1-W3). Both are derived from file
metadata + a per-file monotonic id, so minting them is a narrow map — no
shuffle.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sed_binning_spark.loaders.base import BaseLoader

FILE_COLUMN = "file_id"
ROW_COLUMN = "row_id"


class GenericLoader(BaseLoader):
    """spark.read-backed loader for parquet/csv/json event files."""

    name = "generic"
    supported_file_types = ("parquet", "csv", "json")

    def read_dataframe(
        self,
        files: str | Sequence[str] | None = None,
        folders: str | Sequence[str] | None = None,
        runs=None,
        ftype: str = "parquet",
        metadata: dict | None = None,
        collect_metadata: bool = False,
        add_index_columns: bool = True,
        **kwds,
    ) -> tuple[DataFrame, DataFrame | None, dict]:
        """Read files/folders into one event DataFrame.

        Returns (event_df, timed_df, metadata) — the reference's loader
        contract (sed/loader/base/loader.py); the generic loader has no
        timed dataframe (None) and no run-id naming scheme, like the
        reference's.
        """
        # f_start/f_end/f_step/file_sorting configure path resolution;
        # every OTHER keyword is a spark.read option (the reference
        # forwards extra kwds to dask's read_csv/read_parquet the same way
        # — e.g. sep=';'). file_sorting must be popped here like the other
        # loaders do via resolve_paths, or it would silently become a bogus
        # spark.read option while gather_files still sorts
        slice_kwds = {
            k: kwds.pop(k)
            for k in ("f_start", "f_end", "f_step", "file_sorting")
            if k in kwds
        }
        paths = self.resolve_paths(
            files=files, folders=folders, runs=runs, ftype=ftype,
            metadata=metadata, **slice_kwds,
        )

        # format defaults first, caller options LAST so an explicit
        # header='false' (a headerless CSV) is honored instead of the
        # default silently eating the first data row as column names
        opts = {"header": "true", "inferSchema": "true"} if ftype == "csv" else {}
        opts.update({k: str(v) for k, v in kwds.items()})
        reader = self.spark.read.options(**opts)
        if ftype == "parquet":
            df = reader.parquet(*paths)
        elif ftype == "csv":
            df = reader.csv(paths)
        else:
            df = reader.json(paths)

        if add_index_columns:
            df = add_file_and_row_ids(df, paths)

        self.metadata.update(
            {"file_statistics": {"num_files": len(paths)}, "files": paths},
        )
        return df, None, self.metadata


def add_file_and_row_ids(
    df: DataFrame,
    ordered_paths: Sequence[str],
    split_column: str | None = None,
) -> DataFrame:
    """Mint (file_id, row_id): file_id = index of the source file in the
    given order; row_id = stable, physically-ordered in-file row index.

    With ``split_column``, also mint the scan-split ordinal within each
    file (0, 1, ... ordered by byte offset). Sequential operators (fills,
    time-deltas) can then window on ``(file_id, split_id)`` instead of the
    whole file, so one pathological multi-TB file no longer serializes into
    a single sort task — the boundary-handoff trick extends across splits
    exactly as it does across files.

    Scale design (no shuffle of event data): each scan SPLIT is identified by
    ``(file, _metadata.file_block_start)``; a tiny aggregation counts rows per
    split (one output row per ~128 MB of input — ~1M rows at 100 TB), the
    driver turns the counts into per-split base offsets ordered by byte
    offset (the physically stable in-file order — a window over
    ``monotonically_increasing_id`` alone is NOT stable because Spark packs
    splits by size, not offset), and a broadcast join hands each row
    ``base + (mid - split_min_mid)``. ``monotonically_increasing_id`` is
    contiguous within a scan partition, so the in-split delta is the in-split
    row index.
    """
    order = {os.path.abspath(p): i for i, p in enumerate(ordered_paths)}
    if order:
        mapping = F.create_map(
            *[x for p, i in order.items() for x in (F.lit(p), F.lit(i))],
        )
        # input_file_name() reports a percent-ENCODED URI (spaces become
        # %20 etc.) of the ACTUAL file read — for a directory-style parquet
        # dataset that is an inner part-file, not the path the caller gave.
        # Decode, normalize the file: scheme to a bare path, then look up
        # the path itself and its first few ancestors (part-files sit one
        # level down; hive-partitioned layouts a couple more). url_decode
        # applies FORM decoding ('+' -> space), but the URI encoder leaves
        # literal '+' unescaped — re-escape it first so '/data/run+1.pq'
        # survives the round trip.
        decoded = F.url_decode(
            F.regexp_replace(
                F.regexp_replace(F.input_file_name(), "^file:/*", "/"),
                r"\+", "%2B",
            ),
        )
        cands = [decoded]
        for _ in range(3):
            cands.append(F.regexp_replace(cands[-1], "/[^/]*$", ""))
        file_expr = F.coalesce(*[mapping[c] for c in cands])
    else:
        # no path list (non-file-backed input): single pseudo-file
        file_expr = F.lit(0)
    df = df.withColumn(FILE_COLUMN, file_expr.cast("int"))

    try:
        tagged = df.withColumn("__block", F.col("_metadata.file_block_start"))
    except Exception:
        # not a file-backed dataframe (tests over createDataFrame): fall back
        # to a per-file window — small data by construction
        w = Window.partitionBy(FILE_COLUMN).orderBy(F.monotonically_increasing_id())
        out = df.withColumn(ROW_COLUMN, F.row_number().over(w).cast("bigint") - 1)
        if split_column is not None:
            out = out.withColumn(split_column, F.lit(0).cast("int"))
        return out

    # the split key must carry the PHYSICAL file path, not just
    # (file_id, block): a directory-style dataset maps several part-files
    # to one file_id, and every part-file starts at block 0 — keyed
    # without the path, two part-files would merge into one offset group
    # and row_id would silently corrupt (min(__mid) taken across files)
    tagged = tagged.withColumn("__path", F.col("_metadata.file_path"))
    tagged = tagged.withColumn("__mid", F.monotonically_increasing_id())
    splits = tagged.groupBy(FILE_COLUMN, "__path", "__block").agg(
        F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__m0"),
    ).collect()
    unmatched = [r for r in splits if r[FILE_COLUMN] is None]
    if unmatched:
        raise ValueError(
            "some scanned files could not be matched to the provided path "
            "list (unexpected dataset nesting?) — file_id would be NULL",
        )
    # in-file order across a directory dataset's part-files: lexicographic
    # part-file name (part-00000 < part-00001), then byte offset within it
    splits.sort(key=lambda r: (r[FILE_COLUMN], r["__path"], r["__block"]))
    rows = []
    next_base: dict[int, int] = {}
    next_ord: dict[int, int] = {}
    for r in splits:
        fid = r[FILE_COLUMN]
        base = next_base.get(fid, 0)
        ordinal = next_ord.get(fid, 0)
        rows.append((fid, r["__path"], r["__block"], base, r["__m0"], ordinal))
        next_base[fid] = base + r["__n"]
        next_ord[fid] = ordinal + 1

    bdf = df.sparkSession.createDataFrame(
        rows,
        schema=(f"{FILE_COLUMN} int, __path string, __block long, __base long, "
                f"__m0 long, __split int"),
    )
    out = tagged.join(
        F.broadcast(bdf), on=[FILE_COLUMN, "__path", "__block"], how="left",
    )
    # a split present in the output scan but absent from the offset collect
    # (the input changed between the two jobs, or split planning diverged)
    # would otherwise mint silently-NULL row_ids that downstream windows
    # order arbitrarily — fail loudly, naming the file
    base = F.when(
        F.col("__base").isNull(),
        F.raise_error(F.concat(
            F.lit("scan split missing from the row-offset map (input "
                  "changed between planning and execution?): "),
            F.input_file_name(),
        )),
    ).otherwise(F.col("__base"))
    out = out.withColumn(
        ROW_COLUMN, (base + F.col("__mid") - F.col("__m0")).cast("bigint"),
    )
    if split_column is not None:
        out = out.withColumn(split_column, F.col("__split"))
    return out.drop("__path", "__block", "__mid", "__base", "__m0", "__split")
